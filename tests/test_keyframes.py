"""Keyframe DB, loop-closure detection, and pose-graph correction.

Shapes match test_e2e.py so the persistent compile cache is shared.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from staticfusion_tpu.config import (SFConfig, CameraConfig, FusionConfig,
                                     LoopClosureConfig)
from staticfusion_tpu.geometry import se3
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.pipeline import keyframes as kf
from staticfusion_tpu.pipeline.step import _intensity

CONFIG = SFConfig(camera=CameraConfig(width=160, height=120),
                  fusion=FusionConfig(capacity=1 << 16))
TWIST = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)


@pytest.fixture(scope="module")
def frames():
    frames, gt = synthetic.make_sequence(CONFIG, 6, TWIST)
    out = []
    for rgb, depth_mm, _ in frames:
        out.append((jnp.asarray(_intensity(jnp.asarray(rgb))),
                    jnp.asarray(depth_mm, jnp.float32) / 1000.0))
    return out, gt


def test_fingerprint_discriminates(frames):
    fr, _ = frames
    f0 = kf.fingerprint(*fr[0])
    f0b = kf.fingerprint(*fr[0])
    f5 = kf.fingerprint(*fr[5])
    assert float(jnp.mean((f0 - f0b) ** 2)) == 0.0
    assert float(jnp.mean((f0 - f5) ** 2)) > 0.0
    # Contrast-normalized intensity: a brightness-scaled copy of the same
    # view stays much closer than a genuinely different view.
    fb = kf.fingerprint(fr[0][0] * 1.3, fr[0][1])
    assert (float(jnp.mean((f0 - fb) ** 2))
            < 0.25 * float(jnp.mean((f0 - f5) ** 2)))


def test_db_add_and_query(frames):
    fr, _ = frames
    db = kf.empty_db(8, CONFIG.rows, CONFIG.cols)
    for i, (inten, depth) in enumerate(fr):
        db = kf.add_keyframe(db, inten, depth, jnp.eye(4), i * 10)
    assert int(db.count) == 6

    emb = kf.fingerprint(fr[0][0] * 1.1, fr[0][1])  # revisit of frame 0
    best, dist = kf.query(db, emb, cur_frame_idx=100, min_gap=30)
    assert int(best) == 0
    assert np.isfinite(float(dist))

    # min_gap excludes recent keyframes from matching.
    best2, _ = kf.query(db, kf.fingerprint(*fr[5]), cur_frame_idx=51,
                        min_gap=30)
    assert int(db.frame_idx[int(best2)]) <= 21

    # Nothing old enough -> +inf distance, host rejects.
    _, d3 = kf.query(db, emb, cur_frame_idx=5, min_gap=30)
    assert not np.isfinite(float(d3))


def test_relative_pose_recovers_twist(frames):
    fr, _ = frames
    T, resid = kf.relative_pose(fr[0][0], fr[0][1], fr[2][0], fr[2][1],
                                CONFIG)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(2 * TWIST)))
    err = np.abs(np.asarray(T) - T_gt)
    assert err[:3, 3].max() < 5e-3, f"translation off: {err[:3, 3]}"
    assert err[:3, :3].max() < 5e-3
    assert float(resid) < 0.05


def test_loop_closure_fires_in_pipeline():
    """Out-and-back trajectory: the return leg revisits earlier views, the
    pipeline detects it, geometric verification passes, and the corrected
    trajectory stays accurate."""
    from staticfusion_tpu.io.synthetic import default_world, render_frame
    from staticfusion_tpu.pipeline.system import SlamSystem

    cfg = CONFIG.replace(loop=LoopClosureConfig(
        enabled=True, kf_interval=2, capacity=16, min_gap=5,
        max_fp_dist=0.005, max_residual=0.05))
    planes, _ = default_world()
    dT = np.asarray(se3.se3_exp(jnp.asarray(TWIST)))
    dT_inv = np.linalg.inv(dT).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    gt = []
    frames = []
    for i in range(16):
        frames.append(render_frame(pose, cfg, planes))
        gt.append(pose.copy())
        pose = (pose @ (dT if i < 8 else dT_inv)).astype(np.float32)
    gt = np.stack(gt)

    slam = SlamSystem(cfg)
    for i, (rgb, depth_mm, _) in enumerate(frames):
        slam.process(rgb, depth_mm, i / 30.0)

    assert len(slam.loop_closures) >= 1, "no loop closure detected"
    for c in slam.loop_closures:
        assert c["frame"] - c["keyframe"] >= cfg.loop.min_gap
        assert c["residual"] < cfg.loop.max_residual
    ate = slam.ate(np.arange(16) / 30.0, gt)
    assert ate < 0.03, f"ATE {ate} after loop closure"


def test_close_loop_removes_drift():
    # Ground truth: 8 keyframes along a known chain.  The odometry chain
    # carries a constant translation bias, so the composed trajectory
    # drifts; the loop constraint 0 -> 7 is measured exactly.
    rng = np.random.default_rng(3)
    xi_true = rng.normal(0, 0.05, (7, 6)).astype(np.float32)
    gt = [np.eye(4, dtype=np.float32)]
    for k in range(7):
        gt.append(gt[-1] @ np.asarray(se3.se3_exp(jnp.asarray(xi_true[k]))))
    gt = np.stack(gt)

    bias = np.array([0.01, 0.004, -0.006, 0, 0, 0], np.float32)
    drifted = [np.eye(4, dtype=np.float32)]
    for k in range(7):
        drifted.append(drifted[-1] @ np.asarray(
            se3.se3_exp(jnp.asarray(xi_true[k] + bias))))
    drifted = np.stack(drifted)
    err_before = np.linalg.norm(drifted[7, :3, 3] - gt[7, :3, 3])
    assert err_before > 0.05  # the test is vacuous unless there is drift

    T_07 = np.linalg.inv(gt[0]) @ gt[7]
    opt = np.asarray(kf.close_loop(jnp.asarray(drifted), 8, 0, 7,
                                   jnp.asarray(T_07), loop_weight=4.0))
    err_after = np.linalg.norm(opt[7, :3, 3] - gt[7, :3, 3])
    assert err_after < 0.4 * err_before, (err_before, err_after)
    # Gauge fix: the map origin (pose 0) must not move.
    assert np.abs(opt[0] - np.eye(4)).max() < 1e-6
