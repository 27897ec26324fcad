"""Multi-device consistency: the sharded step must equal the single-device
step (something the reference could never test — SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from staticfusion_tpu.config import SFConfig, CameraConfig, FusionConfig
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.parallel import mesh as mesh_lib
from staticfusion_tpu.parallel.sharded import make_sharded_step
from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step

CONFIG = SFConfig(camera=CameraConfig(width=80, height=64),
                  fusion=FusionConfig(capacity=1 << 14))
TWIST = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)


@pytest.fixture(scope="module")
def boot():
    frames, _ = synthetic.make_sequence(CONFIG, 3, TWIST)

    def F(i):
        return Frame(rgb=jnp.asarray(frames[i][0]),
                     depth_mm=jnp.asarray(frames[i][1]))

    state, _ = bootstrap_step(F(0), F(1), jnp.eye(4), CONFIG)
    return state, F(2)


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_pix,n_map", [(1, 8), (2, 4), (8, 1)])
def test_sharded_step_matches_single(boot, n_pix, n_map):
    state, frame = boot
    ref_state, ref_out = slam_step(state, frame, CONFIG)

    mesh = mesh_lib.make_mesh(n_pix, n_map)
    sh_state = mesh_lib.place_state(state, mesh)
    sh_frame = jax.device_put(frame, mesh_lib.frame_shardings(mesh))
    step = make_sharded_step(CONFIG, mesh)
    out_state, out = step(sh_state, sh_frame)

    np.testing.assert_allclose(np.asarray(out.curr_pose),
                               np.asarray(ref_out.curr_pose), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.T_odometry),
                               np.asarray(ref_out.T_odometry), atol=1e-4)
    assert int(out.surfel_count) == int(ref_out.surfel_count)
    np.testing.assert_allclose(np.asarray(out_state.smap.conf),
                               np.asarray(ref_state.smap.conf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.static_prob),
                               np.asarray(ref_out.static_prob), atol=1e-3)
