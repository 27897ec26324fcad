"""Checkpoint/resume of the full SLAM state.

The reference has output-only persistence (PLY + trajectory,
Reconstruction.cpp:358-485) and no reload path (SURVEY.md section 5).  Here the whole
SlamState pytree round-trips through one npz, so a run can resume mid-
sequence — and the surfel map survives across sessions.

The config used at save time is stored alongside the pytree and validated on
load: restoring under a different config would silently rebuild the treedef
around wrong shapes, so a mismatch raises with the differing fields named
instead of failing opaquely downstream.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.predict import PredictedView
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.pipeline.state import RingBuffers, SlamState


def _config_diff(a: dict, b: dict, prefix: str = "") -> list:
    keys = sorted(set(a) | set(b))
    out = []
    for k in keys:
        va, vb = a.get(k), b.get(k)
        if isinstance(va, dict) and isinstance(vb, dict):
            out += _config_diff(va, vb, prefix + k + ".")
        elif va != vb:
            out.append(f"{prefix}{k}: saved={va!r} vs given={vb!r}")
    return out


def save_state(path: str, state: SlamState,
               config: Optional[SFConfig] = None,
               archive: Optional[SurfelMap] = None) -> None:
    """`archive` is the SlamSystem's stale-surfel store (pipeline/system.py)
    — saved alongside so a resumed run keeps the full world."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    extra = {}
    if config is not None:
        extra["config_json"] = np.frombuffer(
            config.to_json().encode(), dtype=np.uint8)
    if archive is not None:
        a_leaves = jax.tree_util.tree_leaves(archive)
        extra["n_archive"] = np.asarray(len(a_leaves))
        extra.update({f"arch_{i}": np.asarray(x)
                      for i, x in enumerate(a_leaves)})
    np.savez_compressed(path, n=len(leaves),
                        **{f"leaf_{i}": np.asarray(x)
                           for i, x in enumerate(leaves)},
                        **extra)


def load_config(path: str) -> Optional[SFConfig]:
    """Config stored in the checkpoint, or None for pre-config checkpoints."""
    data = np.load(path)
    if "config_json" not in data:
        return None
    return SFConfig.from_json(bytes(data["config_json"].tobytes()).decode())


def load_state(path: str, config: Optional[SFConfig] = None) -> SlamState:
    """Restore a SlamState.  If `config` is given and the checkpoint stored
    one, they must match (shape-affecting fields live in the config; a
    mismatch would reconstruct the pytree around wrong shapes)."""
    data = np.load(path)
    if config is not None and "config_json" in data:
        saved = json.loads(bytes(data["config_json"].tobytes()).decode())
        given = json.loads(config.to_json())
        # The map capacity is host-tiered at runtime (SlamSystem
        # _maybe_resize_map), so the saved capacity legitimately differs
        # from the config tier ceiling; everything else must match.
        saved.get("fusion", {}).pop("capacity", None)
        given.get("fusion", {}).pop("capacity", None)
        diff = _config_diff(saved, given)
        if diff:
            raise ValueError(
                "checkpoint config does not match the given config:\n  "
                + "\n  ".join(diff))
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


def load_archive(path: str) -> Optional[SurfelMap]:
    """The archived-surfel map stored by save_state, or None."""
    data = np.load(path)
    if "n_archive" not in data:
        return None
    n = int(data["n_archive"])
    leaves = [jnp.asarray(data[f"arch_{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(SurfelMap(*[0] * 10))
    return jax.tree_util.tree_unflatten(treedef, leaves)
