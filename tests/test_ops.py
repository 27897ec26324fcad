import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.geometry import se3
from staticfusion_tpu.ops import bilateral, derivatives, pyramid, warp, zbuffer

from tests import reference_impl as ref

CONFIG = SFConfig()


def make_depth(rng, rows=24, cols=32, holes=0.15):
    d = 1.0 + 2.0 * rng.random((rows, cols))
    d[rng.random((rows, cols)) < holes] = 0.0
    return d.astype(np.float32)


def test_downsample_matches_reference(rng):
    d = make_depth(rng)
    c = rng.random(d.shape).astype(np.float32)
    d_ref, c_ref = ref.downsample_level_np(d, c)
    d_jax, c_jax = pyramid.downsample_level(jnp.asarray(d), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(d_jax), d_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_jax), c_ref, atol=1e-5)


def test_pyramid_shapes(rng):
    cfg = CONFIG
    d = make_depth(rng, cfg.rows, cfg.cols)
    c = rng.random(d.shape).astype(np.float32)
    pyr = pyramid.build_pyramid(jnp.asarray(d), jnp.asarray(c), cfg)
    assert len(pyr) == cfg.ctf_levels == 5
    for lvl, p in enumerate(pyr):
        assert p.depth.shape == cfg.level_shape(lvl)
        # xx/yy zero wherever depth is zero
        assert np.all(np.asarray(p.xx)[np.asarray(p.depth) == 0] == 0)


def test_coords_projection_consistency(rng):
    """Back-projected xx/yy correspond to the solver camera model."""
    d = np.full((24, 32), 2.0, np.float32)
    xx, yy = pyramid.coords_for_level(jnp.asarray(d), CONFIG.camera.fovh)
    f = 32 / (2 * np.tan(0.5 * CONFIG.camera.fovh))
    # Center pixel has x = 0 by symmetry of (n-1)/2 principal point.
    assert abs(np.asarray(xx)[12, 15] + np.asarray(xx)[12, 16]) < 1e-5
    # Reprojection: u = f*x/z + (cols-1)/2.
    u = f * np.asarray(xx)[5, 7] / 2.0 + 0.5 * 31
    assert abs(u - 7) < 1e-4


def test_warp_identity_preserves(rng):
    """warp with identity odometry ~ the source image (up to splat blur)."""
    rows, cols = 24, 32
    d = np.full((rows, cols), 2.0, np.float32)
    c = rng.random((rows, cols)).astype(np.float32)
    xx, yy = pyramid.coords_for_level(jnp.asarray(d), CONFIG.camera.fovh)
    lvl = pyramid.PyramidLevel(jnp.asarray(d), jnp.asarray(c), xx, yy)
    out = warp.warp_images_inverse(lvl, jnp.eye(4), CONFIG.camera.fovh)
    inner = np.s_[1:-1, 1:-1]
    np.testing.assert_allclose(np.asarray(out.depth)[inner], d[inner], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.intensity)[inner], c[inner], atol=1e-3)


def test_warp_matches_reference_splat(rng):
    rows, cols = 24, 32
    d = make_depth(rng, rows, cols, holes=0.1)
    c = rng.random((rows, cols)).astype(np.float32)
    xx, yy = pyramid.coords_for_level(jnp.asarray(d), CONFIG.camera.fovh)
    xi = np.array([0.01, -0.02, 0.015, 0.01, -0.005, 0.02], np.float32)
    T_odo = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    T = np.asarray(se3.se3_inverse(jnp.asarray(T_odo)))

    d_ref, c_ref, w_ref = ref.warp_splat_np(
        d, c, np.asarray(xx), np.asarray(yy), T, CONFIG.camera.fovh)
    d_jax, c_jax, w_jax = warp.warp_forward_splat(
        jnp.asarray(d), jnp.asarray(c), xx, yy, jnp.asarray(T),
        CONFIG.camera.fovh)
    np.testing.assert_allclose(np.asarray(w_jax), w_ref, atol=1.0)
    np.testing.assert_allclose(np.asarray(d_jax), d_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c_jax), c_ref, atol=2e-3)


def test_derivatives_match_reference(rng):
    rows, cols = 16, 20
    d = make_depth(rng, rows, cols)
    c = rng.random((rows, cols)).astype(np.float32)
    warped_d = make_depth(rng, rows, cols)
    warped_c = rng.random((rows, cols)).astype(np.float32)
    xx, yy = pyramid.coords_for_level(jnp.asarray(d), CONFIG.camera.fovh)
    cur = pyramid.PyramidLevel(jnp.asarray(d), jnp.asarray(c), xx, yy)
    wimg = warp.WarpedImages(jnp.asarray(warped_d), jnp.asarray(warped_c), xx, yy)

    inter = derivatives.calculate_coords(cur, wimg)
    deriv = derivatives.calculate_derivatives(inter, cur, wimg)

    null = np.asarray(inter.null)
    di = np.asarray(inter.depth)
    ci = np.asarray(inter.intensity)
    dcu, dcv, ddu, ddv = ref.derivatives_np(di, ci, null)
    np.testing.assert_allclose(np.asarray(deriv.dcu), dcu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(deriv.dcv), dcv, atol=1e-5)
    np.testing.assert_allclose(np.asarray(deriv.ddu), ddu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(deriv.ddv), ddv, atol=1e-5)
    np.testing.assert_allclose(np.asarray(deriv.dct), np.asarray(c) - warped_c,
                               atol=1e-6)


def test_weights_properties(rng):
    rows, cols = 16, 20
    d = make_depth(rng, rows, cols)
    c = rng.random((rows, cols)).astype(np.float32)
    xx, yy = pyramid.coords_for_level(jnp.asarray(d), CONFIG.camera.fovh)
    cur = pyramid.PyramidLevel(jnp.asarray(d), jnp.asarray(c), xx, yy)
    wimg = warp.WarpedImages(jnp.asarray(d), jnp.asarray(c), xx, yy)
    inter = derivatives.calculate_coords(cur, wimg)
    deriv = derivatives.calculate_derivatives(inter, cur, wimg)
    w = derivatives.compute_weights(deriv, inter.valid)
    wc, wd = np.asarray(w.weights_c), np.asarray(w.weights_d)
    assert wc.max() <= 1.0 + 1e-6 and wd.max() <= 1.0 + 1e-6
    assert np.all(wc[~np.asarray(inter.valid)] == 0)
    assert wc.max() > 0.99  # max-normalized


def test_bilateral_matches_reference(rng):
    d = (rng.random((14, 18)) * 4000 + 200).astype(np.float32)
    d[rng.random(d.shape) < 0.1] = 0
    out_ref = ref.bilateral_np(d, 4.5)
    out_jax = np.asarray(bilateral.bilateral_filter_mm(jnp.asarray(d), 4.5))
    np.testing.assert_allclose(out_jax, out_ref, atol=1.0)
    # agreement up to rounding of the borderline .5 cases
    assert (out_jax != out_ref).mean() < 0.05


def test_metricise():
    d = jnp.asarray([[0.0, 250.0, 300.0, 1500.0, 4600.0]])
    out = np.asarray(bilateral.metricise_depth_mm(d, 4.5))
    np.testing.assert_allclose(out, [[0, 0, 0.3, 1.5, 0]], atol=1e-6)


def test_zbuffer_scatter_picks_min_depth():
    idx = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
    depth = jnp.asarray([3.0, 1.0, 5.0, 2.0, 2.0, 1.5])
    valid = jnp.asarray([True, True, True, True, True, False])
    winner, zmin = zbuffer.zbuffer_scatter(idx, depth, valid, 4)
    np.testing.assert_array_equal(np.asarray(winner)[:3], [1, 2, 3])
    assert np.asarray(winner)[3] == zbuffer.INVALID
    np.testing.assert_allclose(np.asarray(zmin)[:3], [1.0, 5.0, 2.0])


def test_zbuffer_tie_break_deterministic():
    idx = jnp.asarray([5, 5, 5], jnp.int32)
    depth = jnp.asarray([2.0, 2.0, 2.0])
    valid = jnp.ones(3, bool)
    winner, _ = zbuffer.zbuffer_scatter(idx, depth, valid, 8)
    assert np.asarray(winner)[5] == 0  # smallest source index wins ties
