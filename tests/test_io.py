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
