"""Checkpoint/resume of the full SLAM state.

The reference has output-only persistence (PLY + trajectory,
Reconstruction.cpp:358-485) and no reload path (SURVEY.md section 5).  Here the whole
SlamState pytree round-trips through one npz, so a run can resume mid-
sequence — and the surfel map survives across sessions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.fusion.predict import PredictedView
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.pipeline.state import RingBuffers, SlamState


def save_state(path: str, state: SlamState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(path, n=len(leaves),
                        **{f"leaf_{i}": np.asarray(x)
                           for i, x in enumerate(leaves)})


def load_state(path: str) -> SlamState:
    data = np.load(path)
    n = int(data["n"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    # Rebuild the treedef from a template with matching structure.
    template = SlamState(
        smap=SurfelMap(*[0] * 10), curr_pose=0, tick=0, im_count=0,
        twist_old=0, rings=RingBuffers(0, 0, 0), prev_rgb=0,
        prev_filt_depth=0, prev_static_prob=0, per_cluster_residual=0,
        pred=PredictedView(*[0] * 7))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
