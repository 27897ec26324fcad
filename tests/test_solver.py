import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig, NUM_CLUSTERS
from staticfusion_tpu.ops import pyramid
from staticfusion_tpu.solver import clustering, segmentation
from staticfusion_tpu.solver.irls import motion_filter

CONFIG = SFConfig()


def _two_plane_scene(rows=32, cols=48):
    """Left half at 1m, right half at 3m."""
    d = np.full((rows, cols), 1.0, np.float32)
    d[:, cols // 2:] = 3.0
    return d


def test_kmeans_separates_depth_planes(rng):
    d = _two_plane_scene()
    c = rng.random(d.shape).astype(np.float32)
    cfg = CONFIG.replace(camera=CONFIG.camera.__class__(width=48, height=32))
    pyr = pyramid.build_pyramid(jnp.asarray(d), jnp.asarray(c), cfg)
    cl = clustering.cluster_frame(pyr, cfg)
    labels = np.asarray(cl.labels[0])
    # No pixel invalid; left and right halves use disjoint label sets.
    assert labels.max() < NUM_CLUSTERS
    left = set(np.unique(labels[:, :20]))
    right = set(np.unique(labels[:, 28:]))
    assert left.isdisjoint(right)
    # Cluster centers' depth coordinate near 1 or 3.
    centers = np.asarray(cl.centers)
    used = sorted(left | right)
    for l in used:
        assert min(abs(centers[0, l] - 1.0), abs(centers[0, l] - 3.0)) < 0.3


def test_kmeans_invalid_pixels_get_sentinel(rng):
    d = _two_plane_scene()
    d[5:9, 5:9] = 0.0
    cfg = CONFIG.replace(camera=CONFIG.camera.__class__(width=48, height=32))
    pyr = pyramid.build_pyramid(jnp.asarray(d), jnp.asarray(
        rng.random(d.shape).astype(np.float32)), cfg)
    cl = clustering.cluster_frame(pyr, cfg)
    labels = np.asarray(cl.labels[0])
    assert np.all(labels[6:8, 6:8] == NUM_CLUSTERS)


def test_connectivity_gates_on_distance():
    # Two flat regions at very different depth, adjacent in the image:
    # labels differ across the boundary but 3D distance is large -> no edge.
    rows, cols = 16, 24
    d = np.full((rows, cols), 1.0, np.float32)
    d[:, cols // 2:] = 3.0
    xx = np.zeros_like(d)
    yy = np.zeros_like(d)
    labels = np.zeros((rows, cols), np.int32)
    labels[:, cols // 2:] = 1
    conn = np.asarray(clustering.compute_connectivity(
        jnp.asarray(d), jnp.asarray(xx), jnp.asarray(yy), jnp.asarray(labels)))
    assert not conn[0, 1]
    # Same depth -> connected.
    d2 = np.full((rows, cols), 1.0, np.float32)
    conn2 = np.asarray(clustering.compute_connectivity(
        jnp.asarray(d2), jnp.asarray(xx), jnp.asarray(yy), jnp.asarray(labels)))
    assert conn2[0, 1] and conn2[1, 0]
    assert conn2.diagonal().all()


def test_seg_prior_formula(rng):
    rows, cols = 12, 16
    labels = rng.integers(0, 3, (rows, cols)).astype(np.int32)
    null = rng.random((rows, cols)) < 0.3
    ddt = (rng.random((rows, cols)) - 0.5).astype(np.float32) * 0.2
    from staticfusion_tpu.solver.irls import cluster_onehot
    prior = segmentation.compute_seg_prior(
        cluster_onehot(jnp.asarray(labels)), jnp.asarray(null),
        jnp.asarray(ddt), CONFIG)
    kz = CONFIG.solver.kz
    for l in range(3):
        size = (labels == l).sum()
        nn = ((labels == l) & ~null).sum()
        ratio = nn / size
        if ratio < 0.1:
            assert abs(float(prior.lambda_t_w[l]) - 0.1) < 1e-6
            assert abs(float(prior.b_prior[l]) + 1.0) < 1e-6
        else:
            expect = np.clip(
                np.mean(1.0 - kz * np.abs(ddt[(labels == l) & ~null])), -1, 2)
            np.testing.assert_allclose(float(prior.b_prior[l]), expect,
                                       atol=1e-5)
            np.testing.assert_allclose(float(prior.lambda_t_w[l]), ratio,
                                       atol=1e-6)


def test_reg_normal_matrix_is_tall_system_ata():
    conn = np.eye(NUM_CLUSTERS, dtype=bool)
    conn[0, 1] = conn[1, 0] = True
    conn[2, 5] = conn[5, 2] = True
    lam = 0.35
    ata = np.asarray(segmentation.reg_normal_matrix(jnp.asarray(conn), lam))
    # Build the reference's tall rows explicitly.
    rows = []
    for l in range(NUM_CLUSTERS):
        for lc in range(l + 1, NUM_CLUSTERS):
            if conn[l, lc]:
                r = np.zeros(NUM_CLUSTERS)
                r[l] = 2 * lam
                r[lc] = -2 * lam
                rows.append(r)
    A = np.stack(rows)
    np.testing.assert_allclose(ata, A.T @ A, atol=1e-5)


def test_solve_segm_matches_tall_lstsq():
    rng = np.random.default_rng(0)
    conn = np.eye(NUM_CLUSTERS, dtype=bool)
    conn[0, 1] = conn[1, 0] = True
    prior = segmentation.SegPrior(
        b_prior=jnp.asarray(rng.uniform(-1, 2, NUM_CLUSTERS), jnp.float32),
        lambda_t_w=jnp.asarray(rng.uniform(0.2, 1.0, NUM_CLUSTERS), jnp.float32))
    reg = segmentation.reg_normal_matrix(jnp.asarray(conn),
                                         CONFIG.solver.lambda_reg)
    aver_label = jnp.asarray(rng.uniform(0.001, 0.1, NUM_CLUSTERS), jnp.float32)
    aver_all = jnp.asarray(0.05, jnp.float32)
    b = segmentation.solve_segm_iteration(
        jnp.zeros(NUM_CLUSTERS), aver_label, aver_all, prior, reg, CONFIG)

    # NumPy tall system with the same terms.
    s = CONFIG.solver
    mult = 1.0 / (s.kc_cauchy * 0.05)
    fixed = np.log1p((s.kb * 0.05 * mult) ** 2)
    lam_t = np.asarray(prior.lambda_t_w)
    a_diag = 2 * lam_t * s.lambda_prior
    rhs = (fixed - np.log1p((np.asarray(aver_label) * mult) ** 2)
           + 2 * s.lambda_prior * lam_t * np.asarray(prior.b_prior))
    rows = [np.zeros(NUM_CLUSTERS) for _ in range(NUM_CLUSTERS)]
    B = np.zeros(NUM_CLUSTERS + 1)
    for l in range(NUM_CLUSTERS):
        rows[l][l] = a_diag[l]
        B[l] = rhs[l]
    r = np.zeros(NUM_CLUSTERS)
    r[0] = 2 * s.lambda_reg
    r[1] = -2 * s.lambda_reg
    rows.append(r)
    A = np.stack(rows)
    sol, *_ = np.linalg.lstsq(A, B, rcond=None)
    np.testing.assert_allclose(np.asarray(b), np.clip(sol, -1, 2), atol=1e-3)


def test_build_segm_image_rescue():
    labels = jnp.asarray([[0, 1, NUM_CLUSTERS]])
    b_segm = jnp.zeros((NUM_CLUSTERS,)).at[0].set(0.2).at[1].set(0.3)
    res = jnp.full((NUM_CLUSTERS,), jnp.nan)
    res = res.at[0].set(0.001)  # below rescue threshold -> push to static
    img = np.asarray(segmentation.build_segm_image(labels, b_segm, res, CONFIG))
    assert abs(img[0, 0] - 0.8) < 1e-6   # max(b, 1-b)
    assert abs(img[0, 1] - 0.3) < 1e-6   # NaN residual -> no rescue
    assert img[0, 2] == 1.0              # invalid cluster -> static


def test_motion_filter_identity_when_weights_zero():
    cfg = CONFIG.replace(solver=CONFIG.solver.__class__(
        previous_speed_const_weight=0.0, previous_speed_eig_weight=0.0))
    twist = jnp.asarray([0.1, 0.0, -0.2, 0.01, 0.02, -0.01])
    out = motion_filter(twist, jnp.eye(6), jnp.ones(6), jnp.zeros(6), 0, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(twist), atol=1e-6)


def test_kmeans_level_auto_matches_reference_grid():
    """Auto K-means level keeps the reference's fixed ~120-row Lloyd grid
    (KMeans.cpp:65-74) at every camera resolution."""
    Cam = CONFIG.camera.__class__
    qvga = SFConfig(camera=Cam(width=320, height=240))
    vga = SFConfig(camera=Cam(width=640, height=480))
    tiny = SFConfig(camera=Cam(width=48, height=32))
    assert clustering.kmeans_level_for(qvga) == 1   # 120 rows
    assert clustering.kmeans_level_for(vga) == 2    # 120 rows
    assert clustering.kmeans_level_for(tiny) == 1   # shallowest, tiny image
    # Explicit override wins (clamped to the pyramid depth).
    forced = vga.replace(solver=vga.solver.__class__(kmeans_level=1))
    assert clustering.kmeans_level_for(forced) == 1


def test_kmeans_vga_level2_separates_depth_planes(rng):
    """Clustering at the capped level still separates structure at VGA-like
    aspect: two depth planes land in disjoint label sets at full res."""
    rows, cols = 64, 96
    d = np.full((rows, cols), 1.0, np.float32)
    d[:, cols // 2:] = 3.0
    cfg = SFConfig(camera=CONFIG.camera.__class__(width=cols, height=rows),
                   solver=CONFIG.solver.__class__(kmeans_level=2))
    pyr = pyramid.build_pyramid(
        jnp.asarray(d), jnp.asarray(rng.random(d.shape).astype(np.float32)),
        cfg)
    cl = clustering.cluster_frame(pyr, cfg)
    labels = np.asarray(cl.labels[0])
    assert labels.max() < NUM_CLUSTERS
    left = set(np.unique(labels[:, :40]))
    right = set(np.unique(labels[:, 56:]))
    assert left.isdisjoint(right)
