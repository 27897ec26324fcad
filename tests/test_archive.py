"""Active/archive map split (pipeline/system.py): stale surfels — which
the index-map freshness cull makes permanently invisible to every indexed
pass (render_cull / index_map.vert:48-56; once unrendered, never
re-matched) — migrate out of the working map so per-frame cost is bounded
by the fresh working set, not total map size.

The split must be EXACT: trajectories with and without archiving agree,
and no surfel is ever lost.
"""

import numpy as np

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.pipeline.system import SlamSystem

# A small freshness window makes surfels go stale within the test run
# (production default 200 frames would need a long sequence).
CONFIG = SFConfig(camera=CameraConfig(width=160, height=120),
                  fusion=FusionConfig(capacity=1 << 16, time_delta=6))
TWIST = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
N = 20


def _run(archive_min_batch):
    frames, gt = synthetic.make_sequence(CONFIG, N, TWIST)
    slam = SlamSystem(CONFIG, resize_check_interval=4)
    slam.archive_min_batch = archive_min_batch
    for i, (rgb, depth_mm, _) in enumerate(frames):
        slam.process(rgb, depth_mm, i / 30.0)
    slam._materialize_poses()
    return slam


def test_archive_is_exact_and_lossless():
    base = _run(archive_min_batch=10**9)   # archiving disabled
    arch = _run(archive_min_batch=32)      # archive aggressively

    assert arch.archive is not None and int(arch.archive.count()) > 100, \
        "test premise: the small time_delta must actually stale surfels"
    # The active map shrank; the total world did not (tier-shape
    # recompiles reassociate floats, so a borderline kill verdict may flip
    # for a surfel or two — same class as the 1e-3 pose tolerance below).
    assert int(arch.state.smap.count()) < int(base.state.smap.count())
    assert abs(arch.total_surfels() - base.total_surfels()) <= \
        max(2, base.total_surfels() // 1000)
    # Exactness: same trajectory (tier-shape recompiles reassociate floats;
    # agreement is at the 1e-3 m level like scan-vs-step).
    for pa, pb in zip(base.poses, arch.poses):
        np.testing.assert_allclose(pa, pb, atol=1e-3)
    # full_map carries every surfel once.
    fm = arch.full_map()
    assert int(fm.count()) == arch.total_surfels()
    # Archived surfels are genuinely stale.
    tick = float(arch.state.tick)
    lt = np.asarray(arch.archive.last_time)
    valid = np.asarray(arch.archive.valid)
    assert ((tick - lt[valid]) > CONFIG.fusion.time_delta).all()


def test_fixed_tiers_is_exact():
    """Fixed-tier execution (SlamSystem.fixed_tiers — the bounded-compile
    mode long tunnel runs use) must match adaptive tiering: same
    trajectory (to reassociation tolerance) and no surfel lost."""
    frames, gt = synthetic.make_sequence(CONFIG, N, TWIST)
    base = SlamSystem(CONFIG, resize_check_interval=4)
    base.archive_min_batch = 32
    fixed = SlamSystem(CONFIG, resize_check_interval=4)
    fixed.archive_min_batch = 32
    fixed.fixed_tiers = True
    fixed.archive_capacity = 1 << 15
    for i, (rgb, depth_mm, _) in enumerate(frames):
        base.process(rgb, depth_mm, i / 30.0)
        fixed.process(rgb, depth_mm, i / 30.0)
    base._materialize_poses()
    fixed._materialize_poses()
    for pa, pb in zip(base.poses, fixed.poses):
        np.testing.assert_allclose(pa, pb, atol=1e-3)
    assert abs(fixed.total_surfels() - base.total_surfels()) <= \
        max(2, base.total_surfels() // 1000)
    # The live map really is pinned to the configured capacity.
    assert fixed.state.smap.capacity == CONFIG.fusion.capacity


def test_capacity_wall_is_defined_and_logged(capsys):
    """Fill a deliberately tiny map: the system must keep tracking (no
    crash, finite poses), never exceed capacity, and surface the wall as
    a recorded+printed event instead of silently dropping inserts
    (VERDICT round 4 #9; the reference silently stops appending past
    MAX_VERTICES, GlobalModel.cpp:21-24)."""
    cfg = SFConfig(camera=CameraConfig(width=160, height=120),
                   fusion=FusionConfig(capacity=4096, time_delta=200))
    frames, gt = synthetic.make_sequence(cfg, 12, TWIST)
    slam = SlamSystem(cfg, resize_check_interval=2)
    for i, (rgb, depth_mm, _) in enumerate(frames):
        slam.process(rgb, depth_mm, i / 30.0)
    slam._materialize_poses()

    assert slam.capacity_events, "capacity wall never reported"
    assert slam.capacity_events[0]["capacity"] == 4096
    assert "capacity" in capsys.readouterr().out
    smap = slam.state.smap
    assert int(smap.used) <= smap.capacity
    assert int(smap.count()) <= smap.capacity
    # Tracking survives a full map: poses stay finite and sane.
    for p in slam.poses:
        assert np.isfinite(p).all()
    ate = slam.ate(np.arange(12) / 30.0, gt)
    assert ate < 0.05, f"tracking degraded catastrophically at the wall: {ate}"


def test_archive_checkpoint_roundtrip(tmp_path):
    from staticfusion_tpu.utils.checkpoint import (load_archive, load_state,
                                                   save_state)

    slam = _run(archive_min_batch=64)
    path = str(tmp_path / "ck.npz")
    save_state(path, slam.state, CONFIG, archive=slam.archive)
    st = load_state(path, CONFIG)
    ar = load_archive(path)
    assert int(st.smap.count()) == int(slam.state.smap.count())
    assert ar is not None
    np.testing.assert_array_equal(np.asarray(ar.valid),
                                  np.asarray(slam.archive.valid))
    np.testing.assert_allclose(np.asarray(ar.pos),
                               np.asarray(slam.archive.pos))
    # Checkpoints without an archive load as None.
    path2 = str(tmp_path / "ck2.npz")
    save_state(path2, slam.state, CONFIG)
    assert load_archive(path2) is None
