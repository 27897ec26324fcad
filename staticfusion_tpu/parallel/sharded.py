"""Sharded (multi-chip) SLAM step.

The per-frame step is compiled with GSPMD shardings over a (pix, map) mesh:
image work splits by rows, surfel work by slot blocks; XLA inserts the
psum/all-gather collectives at the reduction boundaries (normal equations,
z-buffer scatters, cluster statistics).  Numerically this is the same
program as the single-chip step — `tests/test_sharding.py` asserts
equivalence on a virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.parallel import mesh as mesh_lib
from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step


def make_sharded_step(config: SFConfig, mesh: Mesh):
    """jit-compile slam_step with explicit input/output shardings."""
    state_sh = mesh_lib.state_shardings(mesh)
    frame_sh = mesh_lib.frame_shardings(mesh)
    rep = NamedSharding(mesh, P())

    step = partial(slam_step.__wrapped__, config=config)  # unjitted core

    return jax.jit(
        step,
        in_shardings=(state_sh, frame_sh),
        out_shardings=(state_sh, rep),
    )


def make_sharded_bootstrap(config: SFConfig, mesh: Mesh):
    """jit-compile bootstrap_step over the mesh: frames arrive row-sharded,
    the state comes out in the steady-state layout, so a whole trajectory
    (bootstrap included) runs under one sharding plan."""
    state_sh = mesh_lib.state_shardings(mesh)
    frame_sh = mesh_lib.frame_shardings(mesh)
    rep = NamedSharding(mesh, P())

    boot = partial(bootstrap_step.__wrapped__, config=config)

    return jax.jit(
        boot,
        in_shardings=(frame_sh, frame_sh, rep),
        out_shardings=(state_sh, rep),
    )
