import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig, CameraConfig, FusionConfig
from staticfusion_tpu.fusion import (association, backend, clean, indexmap,
                                     predict, surfels, update)
from staticfusion_tpu.ops.zbuffer import INVALID

CONFIG = SFConfig(camera=CameraConfig(width=80, height=60),
                  fusion=FusionConfig(capacity=1 << 13))


def _flat_scene(depth=2.0):
    rows, cols = CONFIG.rows, CONFIG.cols
    d = np.full((rows, cols), depth, np.float32)
    # Smooth texture: same-depth surfel disks overlap, so a pixel may be
    # painted by a neighboring surfel (GL z-fighting does the same) — colors
    # must vary smoothly for color checks to be meaningful.
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    rgb = np.stack([0.5 + 0.4 * np.sin(xx / 17.0),
                    0.5 + 0.4 * np.cos(yy / 13.0),
                    0.5 + 0.4 * np.sin((xx + yy) / 23.0)], axis=-1)
    return d, rgb.astype(np.float32)


def _init_map(depth=2.0, prob=1.0):
    d, rgb = _flat_scene(depth)
    sp = np.full(d.shape, prob, np.float32)
    return surfels.initialise_map(CONFIG.fusion.capacity, jnp.asarray(d),
                                  jnp.asarray(d), jnp.asarray(rgb),
                                  jnp.asarray(sp), jnp.eye(4), CONFIG), d, rgb


def test_initialise_map_counts_and_positions():
    smap, d, rgb = _init_map()
    assert int(smap.count()) == d.size
    pos = np.asarray(smap.pos[:d.size]).reshape(CONFIG.rows, CONFIG.cols, 3)
    np.testing.assert_allclose(pos[..., 2], d, atol=1e-6)
    # Center pixel is near the optical axis.
    cy, cx = CONFIG.rows // 2, CONFIG.cols // 2
    assert abs(pos[cy, cx, 0]) < 0.05 and abs(pos[cy, cx, 1]) < 0.05
    # Confidence is the (8-bit quantized) static probability.
    np.testing.assert_allclose(np.asarray(smap.conf[:d.size]), 1.0, atol=1e-6)


def test_initialise_map_low_prob_gives_low_conf():
    smap, d, _ = _init_map(prob=0.25)
    conf = np.asarray(smap.conf[:d.size])
    np.testing.assert_allclose(conf, np.round(0.25 * 255) / 255, atol=1e-6)


def test_predict_indices_hits_projected_texels():
    smap, d, _ = _init_map()
    tex, local = indexmap.predict_indices(smap, jnp.eye(4),
                                          jnp.asarray(2, jnp.int32), CONFIG)
    winner = np.asarray(tex.idx)
    F = CONFIG.fusion.index_factor
    # Surfel centers cover 1/F^2 of the texel grid (every camera pixel
    # produced a surfel).
    hit_frac = (winner != INVALID).mean()
    assert hit_frac > 0.8 / (F * F)
    # A known surfel: pixel (30, 40) -> index 30*80+40.
    idx = 30 * CONFIG.cols + 40
    lp = np.asarray(local.pos[idx])
    cam = CONFIG.camera
    u4 = int(np.floor(F * (cam.fx * lp[0] / lp[2] + cam.cx)))
    v4 = int(np.floor(F * (cam.fy * lp[1] / lp[2] + cam.cy)))
    assert winner[v4, u4] == idx
    # Texel attribute images carry the winner's attributes.
    np.testing.assert_allclose(np.asarray(tex.z)[v4, u4], lp[2], atol=1e-6)


def test_combined_predict_reproduces_depth():
    smap, d, rgb = _init_map()
    view = predict.combined_predict(smap, jnp.eye(4), jnp.asarray(2, jnp.int32),
                                    0.2, CONFIG)
    depth = np.asarray(view.depth)
    inner = np.s_[4:-4, 4:-4]
    cover = (depth[inner] > 0).mean()
    assert cover > 0.95
    np.testing.assert_allclose(depth[inner][depth[inner] > 0], 2.0, atol=0.02)
    # Colors come back from the right surfels.
    img = np.asarray(view.image)
    mask = depth > 0
    err = np.abs(img[mask] - rgb[mask]).mean()
    assert err < 0.05


def test_combined_predict_confidence_cull():
    smap, d, _ = _init_map(prob=0.25)  # conf ~0.25
    view = predict.combined_predict(smap, jnp.eye(4), jnp.asarray(2, jnp.int32),
                                    0.5, CONFIG)
    assert float(jnp.sum(view.depth)) == 0.0


def test_update_log_odds_scalar():
    smap, d, _ = _init_map(prob=0.5)
    n = d.size
    upd = association.UpdateRecords(
        has_update=jnp.zeros((CONFIG.fusion.capacity,), bool).at[0].set(True),
        pos=jnp.asarray(smap.pos) + 0.1,
        conf=jnp.full((CONFIG.fusion.capacity,), 0.9),
        color=jnp.asarray(smap.color),
        normal=jnp.asarray(smap.normal),
        radius=jnp.asarray(smap.radius),
    )
    new = update.apply_updates(smap, upd, jnp.asarray(5, jnp.int32), CONFIG)
    # NumPy oracle of update.vert math.
    c_k = np.clip(np.round(0.5 * 255) / 255, 0.01, 0.99)
    a = np.clip(2 * 0.9 * 0.9, 0.01, 0.53)
    ltm = np.log(1 / (1 - c_k) - 1) + np.log(a / (1 - a))
    c_k1 = 1 - 1 / (1 + np.exp(ltm))
    np.testing.assert_allclose(float(new.conf[0]), c_k1, atol=1e-5)
    assert float(new.hist[0]) == 2.0
    assert float(new.last_time[0]) == 5.0
    # Merge branch: radius equal -> merged position moved toward new.
    w_old = 1.0 * c_k
    expect_shift = a / (w_old + a) * 0.1
    np.testing.assert_allclose(np.asarray(new.pos[0] - smap.pos[0]),
                               expect_shift, atol=1e-5)
    # Untouched surfel unchanged.
    assert float(new.conf[1]) == float(smap.conf[1])


def _empty_new():
    n_pix = CONFIG.rows * CONFIG.cols
    return association.NewSurfels(
        is_new=jnp.zeros((n_pix,), bool),
        pos=jnp.zeros((n_pix, 3)), conf=jnp.zeros((n_pix,)),
        color=jnp.zeros((n_pix, 3)), normal=jnp.zeros((n_pix, 3)),
        radius=jnp.zeros((n_pix,)))


def test_clean_removes_zero_conf_within_window():
    smap, d, _ = _init_map()
    smap = smap._replace(conf=smap.conf.at[0].set(0.0))
    tick = jnp.asarray(50, jnp.int32)  # within time_delta of last_time=1
    tex, local = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    new = clean.clean_and_insert(smap, tex, local, _empty_new(), tick, CONFIG)
    assert not bool(new.valid[0])
    assert bool(new.valid[1])  # confident neighbor survives


def test_clean_keeps_stale_stable():
    # Reference quirk (copy_unstable.vert:~124): any surfel whose last update
    # is older than timeDelta is retained regardless — even zero-confidence.
    smap, d, _ = _init_map()
    smap = smap._replace(conf=smap.conf.at[0].set(0.0))
    tick = jnp.asarray(300, jnp.int32)  # > time_delta after last_time=1
    tex, local = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    new = clean.clean_and_insert(smap, tex, local, _empty_new(), tick, CONFIG)
    assert bool(new.valid[0])
    assert bool(new.valid[1])


def test_clean_inserts_new_surfels_into_free_slots():
    smap, d, _ = _init_map()
    n_pix = CONFIG.rows * CONFIG.cols
    tick = jnp.asarray(3, jnp.int32)
    tex, local = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    is_new = jnp.zeros((n_pix,), bool).at[:5].set(True)
    new_rec = association.NewSurfels(
        is_new=is_new,
        pos=jnp.ones((n_pix, 3)), conf=jnp.full((n_pix,), 0.08),
        color=jnp.ones((n_pix, 3)) * 0.5, normal=jnp.ones((n_pix, 3)),
        radius=jnp.full((n_pix,), 0.01))
    before = int(smap.count())
    out = clean.clean_and_insert(smap, tex, local, new_rec, tick, CONFIG)
    assert int(out.count()) == before + 5
    ins = np.flatnonzero(np.asarray(out.valid) & ~np.asarray(smap.valid))
    assert len(ins) == 5
    np.testing.assert_allclose(np.asarray(out.conf)[ins], 0.08)
    np.testing.assert_allclose(np.asarray(out.last_time)[ins], 3.0)


def test_association_matches_in_place():
    smap, d, rgb = _init_map()
    tick = jnp.asarray(2, jnp.int32)
    tex, _ = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    res = association.associate(
        smap.capacity, tex, jnp.asarray(d), jnp.asarray(d),
        jnp.asarray(rgb), jnp.ones(d.shape), jnp.eye(4), tick,
        jnp.asarray(1.0), CONFIG)
    n_updates = int(jnp.sum(res.updates.has_update))
    n_new = int(jnp.sum(res.new.is_new))
    # Checkerboard-in-time: about 1/4 of pixels are active; same-depth map
    # means essentially all of them match (minus window edges).
    n_active = d.size / 4
    assert n_updates > 0.8 * n_active
    assert n_new < 0.05 * n_active


def test_fuse_frame_full_cycle_stable():
    # prob 0.6: conf must be below the 0.99 log-odds clamp so it can rise.
    smap, d, rgb = _init_map(prob=0.6)
    res = backend.fuse_frame(
        smap, jnp.eye(4), jnp.eye(4), jnp.asarray(d), jnp.asarray(d),
        jnp.asarray(rgb), jnp.ones(d.shape), jnp.asarray(2, jnp.int32), CONFIG)
    # Static identity refusion: map size roughly constant, confidences rise.
    assert abs(int(res.smap.count()) - int(smap.count())) < 0.02 * d.size
    matched = np.asarray(res.smap.last_time) == 2.0
    assert matched.sum() > 0.15 * d.size
    assert float(jnp.mean(res.smap.conf[matched])) > float(
        jnp.mean(smap.conf[matched]))


def test_fuse_frame_texel_matches_slot_path():
    """The production texel-routed fuse and the reference-exact slot path
    agree on a static refusion: same survivors, same confidences, positions
    within float tolerance (the texel path averages pixel collisions where
    the slot path picks the smallest pixel — identical here because the
    scene gives each surfel at most one matching active pixel)."""
    smap, d, rgb = _init_map(prob=0.6)
    args = (jnp.eye(4), jnp.eye(4), jnp.asarray(d), jnp.asarray(d),
            jnp.asarray(rgb), jnp.ones(d.shape), jnp.asarray(2, jnp.int32),
            CONFIG)
    a = backend.fuse_frame(smap, *args)
    b = backend.fuse_frame_slots(smap, *args)
    va, vb = np.asarray(a.smap.valid), np.asarray(b.smap.valid)
    # Free-slot timing differs by design (texel path frees render-culled
    # slots one frame later) but the live sets must match.
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_allclose(np.asarray(a.smap.conf)[va],
                               np.asarray(b.smap.conf)[vb], atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.smap.pos)[va],
                               np.asarray(b.smap.pos)[vb], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.smap.last_time)[va],
                                  np.asarray(b.smap.last_time)[vb])
    # The carried prediction reproduces the scene depth.
    depth = np.asarray(a.pred.depth)
    inner = depth[4:-4, 4:-4]
    assert (inner > 0).mean() > 0.9
    np.testing.assert_allclose(inner[inner > 0], 2.0, atol=0.02)


def test_merge_texels_matches_apply_updates():
    """Texel-space merge == slot-space merge for the winner surfels."""
    from staticfusion_tpu.fusion import texelmap

    smap, d, rgb = _init_map(prob=0.5)
    tick = jnp.asarray(2, jnp.int32)
    tex, local = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    upd, new = association.associate_texels(
        tex, jnp.asarray(d), jnp.asarray(d), jnp.asarray(rgb),
        jnp.ones(d.shape), jnp.eye(4), tick, jnp.asarray(1.0), CONFIG)
    res = association.associate(
        smap.capacity, tex, jnp.asarray(d), jnp.asarray(d), jnp.asarray(rgb),
        jnp.ones(d.shape), jnp.eye(4), tick, jnp.asarray(1.0), CONFIG)

    merged = update.merge_texels(tex, upd, tick, CONFIG)
    # Slot path: note apply_updates blends world positions; identity pose
    # makes world == local so the two are directly comparable.
    slot = update.apply_updates(smap, res.updates, tick, CONFIG)

    m = np.asarray(upd.has & tex.has)
    ids = np.asarray(tex.idx)[m]
    np.testing.assert_allclose(np.asarray(merged.conf)[m],
                               np.asarray(slot.conf)[ids], atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.z)[m],
                               np.asarray(slot.pos)[ids, 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.hist)[m],
                               np.asarray(slot.hist)[ids], atol=1e-6)


def test_writeback_appends_at_watermark():
    """New surfels append at `used`; used advances; overflow drops."""
    smap, d, rgb = _init_map()
    n_pix = CONFIG.rows * CONFIG.cols
    tick = jnp.asarray(3, jnp.int32)
    tex, local = indexmap.predict_indices(smap, jnp.eye(4), tick, CONFIG)
    upd, _ = association.associate_texels(
        tex, jnp.asarray(d), jnp.asarray(d), jnp.asarray(rgb),
        jnp.ones(d.shape), jnp.eye(4), tick, jnp.asarray(1.0), CONFIG)
    merged = update.merge_texels(tex, upd, tick, CONFIG)
    kill = clean.window_kill_tex(merged, tick, CONFIG)
    is_new = jnp.zeros((n_pix,), bool).at[10:17].set(True)
    new_rec = association.NewSurfels(
        is_new=is_new, pos=jnp.ones((n_pix, 3)),
        conf=jnp.full((n_pix,), 0.08), color=jnp.full((n_pix, 3), 0.5),
        normal=jnp.ones((n_pix, 3)), radius=jnp.full((n_pix,), 0.01))
    used0 = int(smap.used)
    out = clean.writeback_and_insert(smap, merged, upd.has, kill, local,
                                     new_rec, jnp.eye(4), tick, CONFIG)
    assert int(out.used) == used0 + 7
    ins = np.flatnonzero(np.asarray(out.valid) & ~np.asarray(smap.valid))
    np.testing.assert_array_equal(ins, np.arange(used0, used0 + 7))
    np.testing.assert_allclose(np.asarray(out.conf)[ins], 0.08)
    # Map nearly full: only the remaining slots accept inserts.
    smap_full = smap._replace(used=jnp.asarray(smap.capacity - 3, jnp.int32))
    out2 = clean.writeback_and_insert(smap_full, merged, upd.has, kill, local,
                                      new_rec, jnp.eye(4), tick, CONFIG)
    assert int(out2.used) == smap.capacity
    ins2 = np.flatnonzero(np.asarray(out2.valid) & ~np.asarray(smap.valid))
    assert len(ins2) == 3


def test_velocity_weighting():
    import jax

    w = backend.velocity_weighting(jnp.eye(4), jnp.eye(4), 1.0, CONFIG)
    assert abs(float(w) - 1.0) < 1e-6
    T = jnp.eye(4).at[0, 3].set(0.5)  # big translation -> floor 0.5
    w2 = backend.velocity_weighting(T, jnp.eye(4), 1.0, CONFIG)
    assert abs(float(w2) - 0.5) < 1e-6


def test_factor4_reference_exact_mode():
    """The full fuse + predict cycle at the reference's FACTOR=4 texel grid
    (IndexMap.cpp:21): same invariants as the F=1 production default."""
    cfg = SFConfig(camera=CameraConfig(width=80, height=60),
                   fusion=FusionConfig(capacity=1 << 13, index_factor=4))
    d, rgb = _flat_scene()
    sp = np.full(d.shape, 0.6, np.float32)
    smap = surfels.initialise_map(cfg.fusion.capacity, jnp.asarray(d),
                                  jnp.asarray(d), jnp.asarray(rgb),
                                  jnp.asarray(sp), jnp.eye(4), cfg)
    res = backend.fuse_frame(
        smap, jnp.eye(4), jnp.eye(4), jnp.asarray(d), jnp.asarray(d),
        jnp.asarray(rgb), jnp.ones(d.shape), jnp.asarray(2, jnp.int32), cfg)
    assert abs(int(res.smap.count()) - int(smap.count())) < 0.02 * d.size
    matched = np.asarray(res.smap.last_time) == 2.0
    assert matched.sum() > 0.15 * d.size
    assert float(jnp.mean(res.smap.conf[matched])) > float(
        jnp.mean(smap.conf[matched]))
    # The fuse-carried prediction reproduces the scene at F=4 too.
    depth = np.asarray(res.pred.depth)
    inner = depth[4:-4, 4:-4]
    assert (inner > 0).mean() > 0.9
    np.testing.assert_allclose(inner[inner > 0], 2.0, atol=0.02)


def test_compact_map_preserves_surfels_and_render():
    smap, d, rgb = _init_map()
    # Kill a scattered subset so valid slots have holes.
    kill = np.zeros((smap.capacity,), bool)
    kill[::7] = True
    smap = smap._replace(valid=smap.valid & ~jnp.asarray(kill))
    count = int(smap.count())

    tier = 1 << int(np.ceil(np.log2(count + 8)))
    packed = surfels.compact_map(smap, tier)
    assert packed.capacity == tier
    assert int(packed.count()) == count
    # Valid surfels occupy a dense prefix, attributes intact (order-stable).
    assert bool(jnp.all(packed.valid[:count]))
    assert not bool(jnp.any(packed.valid[count:]))
    src = np.asarray(smap.pos)[np.asarray(smap.valid)]
    dst = np.asarray(packed.pos)[:count]
    np.testing.assert_allclose(src, dst)

    # The packed map renders the same prediction.
    tick = jnp.asarray(2, jnp.int32)
    a = predict.combined_predict(smap, jnp.eye(4), tick, 0.0, CONFIG)
    b = predict.combined_predict(packed, jnp.eye(4), tick, 0.0, CONFIG)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_allclose(np.asarray(a.conf), np.asarray(b.conf))


def test_compact_map_grow_tier():
    """Growing the tier preserves all surfels and leaves the tail invalid."""
    smap, d, _ = _init_map()
    count = int(smap.count())
    big = surfels.compact_map(smap, smap.capacity * 2)
    assert big.capacity == smap.capacity * 2
    assert int(big.count()) == count
    assert not bool(jnp.any(big.valid[count:]))
    src = np.asarray(smap.pos)[np.asarray(smap.valid)]
    np.testing.assert_allclose(np.asarray(big.pos)[:count], src)


def test_large_capacity_render_exact_depth():
    """At reference-scale capacity (2^23 surfels, GlobalModel.cpp:21-22) the
    packed int32 z-buffer key would leave only 8 depth bits (~1.8 cm buckets
    over 4.5 m); render_texel_images must switch to the exact two-pass path
    and still pick the truly nearest surfel for sub-bucket depth gaps."""
    from staticfusion_tpu.fusion import texelmap

    cap = 1 << 23
    assert texelmap.id_bits_for(cap) > texelmap.PACKED_MAX_ID_BITS
    cam = CONFIG.camera
    smap = surfels.empty_map(cap)

    # Three surfels projecting onto the SAME pixel: ids chosen so the nearest
    # surfel has the LARGEST id (a coarse-quantized or id-tie-broken buffer
    # would pick a wrong one), and depth gaps of 1 mm << the 1.8 cm bucket.
    u, v = 40, 30
    depths = np.array([2.002, 2.001, 2.000], np.float32)
    ids = np.array([100, 2_000_000, 6_000_000])
    x = (u + 0.5 - cam.cx) * depths / cam.fx
    y = (v + 0.5 - cam.cy) * depths / cam.fy
    pos = np.stack([x, y, depths], axis=1)
    smap = smap._replace(
        pos=smap.pos.at[ids].set(pos),
        normal=smap.normal.at[ids].set(np.array([0.0, 0.0, 1.0])),
        radius=smap.radius.at[ids].set(0.01),
        conf=smap.conf.at[ids].set(0.5),
        hist=smap.hist.at[ids].set(1.0),
        init_time=smap.init_time.at[ids].set(1.0),
        last_time=smap.last_time.at[ids].set(1.0),
        valid=smap.valid.at[ids].set(True),
        used=jnp.asarray(6_000_001, jnp.int32))

    local = texelmap.project_surfels(smap, jnp.eye(4), CONFIG)
    tex = texelmap.render_texel_images(smap, local,
                                       jnp.asarray(2, jnp.int32), CONFIG)
    # Read the winner texel via the projection's own coords (a pixel-center
    # point sits exactly on a texel boundary at F>1, where fp rounding
    # decides the floor; the renderer's own u4/v4 is the ground truth).
    F = CONFIG.fusion.index_factor
    tv, tu = int(local.v4[ids[2]]), int(local.u4[ids[2]])
    assert int(tex.idx[tv, tu]) == 6_000_000
    np.testing.assert_allclose(float(tex.z[tv, tu]), 2.000, atol=1e-6)
    # Exact depth tie at another pixel -> deterministic smaller-id winner.
    u2, v2 = 10, 10
    tie_ids = np.array([4_000_000, 3_000_000])
    x2 = (u2 + 0.5 - cam.cx) * 1.5 / cam.fx
    y2 = (v2 + 0.5 - cam.cy) * 1.5 / cam.fy
    smap = smap._replace(
        pos=smap.pos.at[tie_ids].set(np.array([x2, y2, 1.5], np.float32)),
        last_time=smap.last_time.at[tie_ids].set(1.0),
        valid=smap.valid.at[tie_ids].set(True))
    local = texelmap.project_surfels(smap, jnp.eye(4), CONFIG)
    tex = texelmap.render_texel_images(smap, local,
                                       jnp.asarray(2, jnp.int32), CONFIG)
    # Read the texel via the projection's own coords: at F>1 the point sits
    # exactly on a texel boundary, where the fp-rounded floor is what the
    # renderer actually uses.
    tv2, tu2 = int(local.v4[tie_ids[0]]), int(local.u4[tie_ids[0]])
    assert int(tex.idx[tv2, tu2]) == 3_000_000


def test_render_materialize_paths_agree():
    """The capacity-bound attribute scatter (used when the F>1 texel grid
    dwarfs the map tier) is bitwise the texel-count-bound gather."""
    from staticfusion_tpu.fusion import texelmap

    for F in (1, 4):
        cfg = SFConfig(camera=CameraConfig(width=80, height=60),
                       fusion=FusionConfig(capacity=1 << 13, index_factor=F))
        d, rgb = _flat_scene()
        sp = np.full(d.shape, 0.8, np.float32)
        smap = surfels.initialise_map(cfg.fusion.capacity, jnp.asarray(d),
                                      jnp.asarray(d), jnp.asarray(rgb),
                                      jnp.asarray(sp), jnp.eye(4), cfg)
        T = jnp.asarray(np.array([[1, 0, 0, 0.01], [0, 1, 0, -0.005],
                                  [0, 0, 1, 0.004], [0, 0, 0, 1]],
                                 np.float32))
        local = texelmap.project_surfels(smap, T, cfg)
        tick = jnp.asarray(2, jnp.int32)
        a = texelmap.render_texel_images(smap, local, tick, cfg,
                                         materialize="gather")
        b = texelmap.render_texel_images(smap, local, tick, cfg,
                                         materialize="scatter")
        for name in a._fields:
            np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                          np.asarray(getattr(b, name)),
                                          err_msg=f"F={F} field {name}")
