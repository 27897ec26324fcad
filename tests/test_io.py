import os

import numpy as np
import pytest

from staticfusion_tpu.config import SFConfig, CameraConfig, FusionConfig
from staticfusion_tpu.io import synthetic, trajectory


def test_assoc_parse(tmp_path):
    from staticfusion_tpu.io import tum

    (tmp_path / "rgbd_assoc.txt").write_text(
        "# comment\n"
        "1.00 rgb/a.png 1.01 depth/a.png\n"
        "2.00 rgb/b.png 2.01 depth/b.png\n")
    entries = tum.load_assoc(str(tmp_path))
    assert len(entries) == 2
    assert entries[0].timestamp == 1.01
    assert entries[1].rgb_path.endswith("rgb/b.png")


def test_trajectory_roundtrip(tmp_path, rng):
    from staticfusion_tpu.geometry import se3
    import jax.numpy as jnp

    poses = []
    for i in range(5):
        xi = rng.normal(size=6) * 0.2
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)),
                                dtype=np.float64))
    times = np.arange(5) * 0.1
    path = str(tmp_path / "traj.txt")
    trajectory.write_tum_trajectory(path, times, poses)
    t2, p2 = trajectory.read_tum_trajectory(path)
    np.testing.assert_allclose(t2, times, atol=1e-4)
    for a, b in zip(poses, p2):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_ate_zero_for_identical_and_aligned(rng):
    from staticfusion_tpu.geometry import se3
    import jax.numpy as jnp

    poses = [np.eye(4)]
    for i in range(9):
        xi = rng.normal(size=6) * 0.05
        poses.append(poses[-1] @ np.asarray(
            se3.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64))
    times = np.arange(10) * 0.1
    poses = np.stack(poses)
    assert trajectory.ate_rmse(times, poses, times, poses) < 1e-6
    # A rigidly transformed copy still has ~zero ATE.
    T = np.asarray(se3.se3_exp(jnp.asarray([1.0, -2.0, 0.5, 0.3, 0.2, -0.4])),
                   np.float64)
    moved = np.einsum("ij,njk->nik", T, poses)
    assert trajectory.ate_rmse(times, moved, times, poses) < 1e-5


def test_rpe_identity():
    poses = np.stack([np.eye(4)] * 5)
    times = np.arange(5) * 0.1
    assert trajectory.rpe_rmse(times, poses, times, poses) < 1e-9


def test_synthetic_render_geometry():
    config = SFConfig(camera=CameraConfig(width=80, height=60))
    rgb, depth_mm, dyn = synthetic.render_frame(np.eye(4), config)
    assert rgb.shape == (60, 80, 3) and depth_mm.shape == (60, 80)
    # Center pixel looks at the back wall at z = 3.
    assert abs(depth_mm[30, 40] - 3000.0) < 10
    assert not dyn.any()


def test_synthetic_sphere_mask():
    config = SFConfig(camera=CameraConfig(width=80, height=60))
    sp = synthetic.Sphere(center=np.array([0.0, 0.0, 1.5]), radius=0.3,
                          velocity=np.zeros(3))
    rgb, depth_mm, dyn = synthetic.render_frame(np.eye(4), config,
                                                sphere=sp)
    assert dyn.any()
    assert abs(depth_mm[30, 40] - 1200.0) < 10  # sphere front at 1.2m


def test_ply_roundtrip(tmp_path):
    from staticfusion_tpu.fusion import surfels
    from staticfusion_tpu.io.ply import load_ply_count, save_ply
    import jax.numpy as jnp

    config = SFConfig(camera=CameraConfig(width=80, height=60),
                      fusion=FusionConfig(capacity=1 << 13))
    d = np.full((60, 80), 2.0, np.float32)
    smap = surfels.initialise_map(1 << 13, jnp.asarray(d), jnp.asarray(d),
                                  jnp.ones((60, 80, 3)) * 0.5,
                                  jnp.ones((60, 80)), jnp.eye(4), config)
    path = str(tmp_path / "map.ply")
    save_ply(path, smap, 0.25)
    assert load_ply_count(path) == 60 * 80


def test_checkpoint_roundtrip(tmp_path):
    from staticfusion_tpu.pipeline.state import init_state
    from staticfusion_tpu.utils.checkpoint import load_state, save_state
    import jax

    config = SFConfig(camera=CameraConfig(width=80, height=60),
                      fusion=FusionConfig(capacity=1 << 12))
    state = init_state(config)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    state2 = load_state(path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_png_decode(tmp_path):
    from staticfusion_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    from PIL import Image

    rng = np.random.default_rng(0)
    rgb = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    dep = (rng.random((32, 40)) * 30000).astype(np.uint16)
    Image.fromarray(rgb).save(tmp_path / "c.png")
    Image.fromarray(dep).save(tmp_path / "d.png")
    assert np.array_equal(native.decode_png(str(tmp_path / "c.png")), rgb)
    assert np.array_equal(native.decode_png(str(tmp_path / "d.png")), dep)


def test_metrics_logger(tmp_path):
    from staticfusion_tpu.utils.metrics import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(frame=0, fps=10.0)
    log.log(frame=1, fps=20.0)
    log.close()
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[1]["fps"] == 20.0
    assert log.summary()["fps"]["mean"] == 15.0


def test_write_trajectory_ddt_gate(tmp_path):
    """Frames whose depth-residual sum is exactly zero are skipped on export,
    matching the reference's writeTrajectoryFile gate
    (Utils/Datasets.cpp:252-266)."""
    import jax.numpy as jnp

    from staticfusion_tpu.io.trajectory import read_tum_trajectory
    from staticfusion_tpu.pipeline.system import SlamSystem

    slam = SlamSystem(SFConfig(camera=CameraConfig(width=80, height=60)))
    poses = [np.eye(4, dtype=np.float32) for _ in range(4)]
    for i, p in enumerate(poses):
        p[0, 3] = i  # distinguishable
    slam.times = [0.0, 1.0, 2.0, 3.0]
    slam.poses = [jnp.asarray(p) for p in poses]
    slam.ddt_sums = [jnp.asarray(v) for v in (0.5, 0.0, -0.3, 0.0)]

    path = str(tmp_path / "traj.txt")
    slam.write_trajectory(path)
    t, p = read_tum_trajectory(path)
    np.testing.assert_allclose(t, [0.0, 2.0])
    np.testing.assert_allclose(p[:, 0, 3], [0.0, 2.0])


def _rawlog_fixture(tmp_path, n=4, rows=48, cols=64):
    """Tiny rawlog + groundtruth.txt from analytic frames."""
    from staticfusion_tpu.io import rawlog

    rng = np.random.default_rng(3)
    frames, ts = [], []
    for i in range(n):
        rgb = rng.random((rows, cols, 3)).astype(np.float32)
        depth = (1.0 + 0.002 * i + 0.3 * rng.random((rows, cols))).astype(
            np.float32)
        depth[0, 0] = 4.9           # beyond max_distance -> dropped
        depth[1, 1] = 1.2345678     # mm truncation check
        frames.append((rgb, depth))
        ts.append(1341840000.0 + i / 30.0)
    path = str(tmp_path / "seq.rawlog")
    rawlog.write_rawlog(path, frames, ts)
    with open(tmp_path / "groundtruth.txt", "w") as f:
        f.write("# ground truth\n# trajectory\n# t x y z qx qy qz qw\n")
        for i, t in enumerate(ts):
            f.write(f"{t:.4f} {0.1 * i:.4f} 0.0 0.0 0 0 0 1\n")
    return path, frames, ts


def test_rawlog_roundtrip(tmp_path):
    """write_rawlog -> RawlogSequence reproduces Datasets.cpp load semantics:
    180-degree rotated read, BGR-as-RGB swap, truncation to whole mm,
    4.5 m distance gate (Datasets.cpp:176-193)."""
    from staticfusion_tpu.io import rawlog

    path, frames, ts = _rawlog_fixture(tmp_path)
    seq = rawlog.RawlogSequence(path, res_factor=1)
    assert len(seq) == len(frames)
    for (rgb_l, dmm_l, t_l), (rgb_w, d_w), t_w in zip(seq, frames, ts):
        assert abs(t_l - t_w) < 1e-4
        # Loader output is the stored frame rotated 180 degrees; channel
        # swap on load undoes the writer's swap.
        exp_rgb = rgb_w[::-1, ::-1]
        np.testing.assert_allclose(rgb_l, np.round(exp_rgb * 255) / 255,
                                   atol=1e-6)
        exp_mm = np.where(d_w < 4.5, np.trunc(d_w * 1000.0), 0.0)[::-1, ::-1]
        np.testing.assert_array_equal(dmm_l, exp_mm)
    # Spot-check the two sentinel pixels land rotated.
    _, d0 = frames[0]
    _, dmm0, _ = next(iter(seq))
    assert dmm0[-1, -1] == 0.0                     # was (0,0): beyond 4.5 m
    assert dmm0[-2, -2] == np.trunc(1.2345678e3)   # was (1,1): 1234 mm


def test_rawlog_downsample_and_gt(tmp_path):
    from staticfusion_tpu.io import rawlog

    path, frames, ts = _rawlog_fixture(tmp_path)
    seq = rawlog.RawlogSequence(path, res_factor=2)
    rgb, dmm, _ = next(iter(seq))
    assert dmm.shape == (24, 32) and rgb.shape == (24, 32, 3)
    # Downsampled 180-degree read: out[i,j] = stored[H-2i-1, W-2j-1]
    # (Datasets.cpp:176-178).
    exp = np.where(frames[0][1] < 4.5,
                   np.trunc(frames[0][1] * 1000.0), 0.0)[::-1, ::-1][::2, ::2]
    np.testing.assert_array_equal(dmm, exp)

    # GT: monotone nearest-timestamp walk composed with rotateByZ
    # (Datasets.cpp:206-225).
    T0 = seq.initial_gt_pose()
    np.testing.assert_allclose(T0, rawlog.ROTATE_BY_Z, atol=1e-7)
    T2 = seq.gt_pose_for(ts[2])
    exp2 = np.eye(4)
    exp2[0, 3] = 0.2
    np.testing.assert_allclose(T2, exp2 @ rawlog.ROTATE_BY_Z, atol=1e-6)


def test_rawlog_skips_unknown_objects(tmp_path):
    """Foreign object classes in the stream are skipped by end-flag
    resynchronization (the reference's loop skips non-3DRangeScan
    observations too, Datasets.cpp:123-132)."""
    import gzip

    from staticfusion_tpu.io import rawlog

    path, frames, ts = _rawlog_fixture(tmp_path, n=2)
    raw = gzip.open(path, "rb").read()
    # Prepend an unknown object: header + opaque payload + end flag.
    w = rawlog._Writer(open(tmp_path / "mixed.rawlog", "wb"))
    w.header("CObservationIMU", 3)
    w.f.write(b"\x01\x02\x03\x04payload")
    w.end_flag()
    w.f.write(raw if raw[:2] != b"\x1f\x8b" else gzip.decompress(raw))
    w.f.close()

    seq = rawlog.RawlogSequence(str(tmp_path / "mixed.rawlog"), res_factor=1)
    # images dir differs from the fixture's -> point it back
    seq.images_dir = rawlog.images_directory(path)
    assert len(seq) == 2
    _, dmm, t0 = next(iter(seq))
    assert abs(t0 - ts[0]) < 1e-4
