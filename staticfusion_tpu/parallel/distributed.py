"""Multi-host (multi-process) runtime.

No reference counterpart — the reference is a single-process GL system
(SURVEY.md section 2.5).  This layer turns the GSPMD-sharded step
(parallel/sharded.py) into a true multi-process SPMD program:

* `initialize()` wires the process into the JAX distributed service
  (gRPC coordinator).  On TPU pods the no-argument form auto-detects the
  topology; on CPU fleets (and the 2-process integration test,
  tests/test_multihost.py) coordinator/process_id/num_processes are
  explicit and collectives ride Gloo.
* `global_mesh()` lays the (pix, map) axes over ALL processes' devices.
* `lift_to_mesh()` turns a host-local pytree (e.g. the bootstrap state,
  computed identically on every process) into global arrays; each process
  materializes only its addressable shards.
* `put_frame()` is the per-host data path: every process holds the frame
  as a host array, but only its local row-block is uploaded (the `pix`
  axis shards rows).

SPMD contract: every process executes the same sequence of steps on the
same frame stream; per-process work divides along the mesh axes, and XLA
collectives (psum for the solver reductions, scatter-min combiners for the
z-buffer renders) cross process boundaries over ICI/DCN (TPU) or Gloo
(CPU test rig).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_devices_per_process: Optional[int] = None) -> None:
    """Join the distributed runtime.  Call BEFORE any other JAX operation.

    On a TPU pod slice call with no arguments (auto-detection).  For the
    CPU rig pass everything explicitly; `cpu_devices_per_process` forces
    that many virtual host devices and selects Gloo collectives."""
    import os

    if cpu_devices_per_process is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{cpu_devices_per_process}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(n_pix: int, n_map: int):
    """(pix, map) mesh over every device of every process.  Lay `pix`
    across processes last so the row-sharded image work stays process-local
    where possible and the map axis (big all-reduce payloads) prefers
    intra-process links."""
    return mesh_lib.make_mesh(n_pix, n_map, devices=jax.devices())


def lift_to_mesh(tree, shardings):
    """Host-local pytree -> global sharded arrays.  Every process must hold
    identical host values (SPMD: same bootstrap, same frames); each
    materializes only its addressable shards."""
    def lift(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(lift, tree, shardings)


def put_state(state, mesh):
    return lift_to_mesh(state, mesh_lib.state_shardings(mesh))


def put_frame(frame, mesh):
    return lift_to_mesh(frame, mesh_lib.frame_shardings(mesh))


def fetch_replicated(x) -> np.ndarray:
    """Read a fully-replicated global array on any process."""
    assert x.sharding.is_fully_replicated, "output is not replicated"
    return np.asarray(jax.device_get(x))


class DistributedSlam:
    """Multi-process SLAM driver: bootstrap runs host-locally (identical on
    every process — the step is deterministic), steady-state frames run the
    GSPMD-sharded step over the global mesh."""

    def __init__(self, config: SFConfig, n_pix: int, n_map: int):
        from staticfusion_tpu.parallel.sharded import make_sharded_step

        self.config = config
        self.mesh = global_mesh(n_pix, n_map)
        self.step = make_sharded_step(config, self.mesh)
        self.state = None
        self._pending = None
        self.poses = []

    def process(self, rgb: np.ndarray, depth_mm: np.ndarray):
        import jax.numpy as jnp

        from staticfusion_tpu.pipeline.step import Frame, bootstrap_step

        frame_host = Frame(rgb=np.asarray(rgb, np.float32),
                           depth_mm=np.asarray(depth_mm, np.float32))
        if self.state is None and self._pending is None:
            self._pending = frame_host
            return None
        if self.state is None:
            f0 = jax.tree_util.tree_map(jnp.asarray, self._pending)
            f1 = jax.tree_util.tree_map(jnp.asarray, frame_host)
            state, out = bootstrap_step(f0, f1, jnp.eye(4), self.config)
            self.state = put_state(jax.device_get(state), self.mesh)
            pose = np.asarray(out.curr_pose)
        else:
            frame = put_frame(frame_host, self.mesh)
            self.state, out = self.step(self.state, frame)
            pose = fetch_replicated(out.curr_pose)
        self.poses.append(pose)
        return pose
