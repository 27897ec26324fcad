"""Device mesh and sharding layout.

No reference counterpart (the reference is single-process GL; SURVEY.md section 2.5):
this is the TPU-native scaling layer.  Two mesh axes:

* `pix`  — shards image rows: the solver's per-pixel Jacobian/residual work
  and the dense image ops are row-parallel; the 6x6/24x24 normal-equation
  reductions become `psum`s that XLA inserts under GSPMD.
* `map`  — shards surfel blocks: per-surfel passes (index render, update,
  clean) partition over slots; the z-buffer scatters reduce across the axis
  with min-combiners riding ICI.

Shardings are expressed as NamedSharding trees over the SlamState pytree and
handed to `jax.jit` — XLA GSPMD places the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.predict import PredictedView
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.pipeline.state import RingBuffers, SlamState


def make_mesh(n_pix: int, n_map: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_pix * n_map
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(n_pix, n_map)
    return Mesh(dev, axis_names=("pix", "map"))


def surfel_map_shardings(mesh: Mesh) -> SurfelMap:
    """Shard every per-surfel array along its slot axis over `map`."""
    s1 = NamedSharding(mesh, P("map"))
    s2 = NamedSharding(mesh, P("map", None))
    return SurfelMap(pos=s2, conf=s1, color=s2, hist=s1, init_time=s1,
                     last_time=s1, normal=s2, radius=s1, valid=s1,
                     used=NamedSharding(mesh, P()))


def state_shardings(mesh: Mesh) -> SlamState:
    """SlamState-shaped tree of NamedShardings: surfels over `map`, image
    rows over `pix`, small state replicated."""
    rep = NamedSharding(mesh, P())
    rows2 = NamedSharding(mesh, P("pix", None))
    rows3 = NamedSharding(mesh, P("pix", None, None))
    ring = NamedSharding(mesh, P(None, "pix", None))
    return SlamState(
        smap=surfel_map_shardings(mesh),
        curr_pose=rep, tick=rep, im_count=rep, twist_old=rep,
        rings=RingBuffers(depth=ring, intensity=ring, odom=rep),
        prev_rgb=rows3, prev_filt_depth=rows2, prev_static_prob=rows2,
        per_cluster_residual=rep,
        pred=PredictedView(image=rows3, vertex=rows3, conf=rows2,
                           normal=rows3, radius=rows2, time=rows2,
                           depth=rows2),
    )


def frame_shardings(mesh: Mesh):
    from staticfusion_tpu.pipeline.step import Frame

    return Frame(rgb=NamedSharding(mesh, P("pix", None, None)),
                 depth_mm=NamedSharding(mesh, P("pix", None)))


def place_state(state: SlamState, mesh: Mesh) -> SlamState:
    return jax.device_put(state, state_shardings(mesh))
