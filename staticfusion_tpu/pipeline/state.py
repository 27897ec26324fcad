"""The full SLAM state as one pytree.

Everything the reference scatters across `StaticFusion` members, GL textures
and VBOs (StaticFusion.h:83-112, Reconstruction.h) lives here as device
arrays, so a frame step is state -> state with no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.predict import PredictedView
from staticfusion_tpu.fusion.surfels import SurfelMap, empty_map


class RingBuffers(NamedTuple):
    """5-frame temporal residual buffers (StaticFusion.h:91-96)."""
    depth: jnp.ndarray      # (L, H, W)
    intensity: jnp.ndarray  # (L, H, W)
    odom: jnp.ndarray       # (L, 4, 4)


class SlamState(NamedTuple):
    smap: SurfelMap
    curr_pose: jnp.ndarray          # (4,4) reconstruction pose
    tick: jnp.ndarray               # int32 reconstruction frame counter
    im_count: jnp.ndarray           # int32 solver frame counter
    twist_old: jnp.ndarray          # (6,) previous-frame velocity
    rings: RingBuffers
    # Previous frame's uploads, used by the FillIn raw fallback (the GL
    # textures still hold frame t-1 when getPredictedImages runs at t).
    prev_rgb: jnp.ndarray           # (H, W, 3)
    prev_filt_depth: jnp.ndarray    # (H, W) metric filtered
    prev_static_prob: jnp.ndarray   # (H, W)
    per_cluster_residual: jnp.ndarray  # (K,) 5-frame residuals, NaN = unset
    # LOW-confidence predicted view for the *next* frame, splatted from the
    # merged texel images at the end of the last fuse (the reference
    # re-renders the map at the same pose at the start of each frame).
    pred: PredictedView


def init_state(config: SFConfig) -> SlamState:
    rows, cols = config.rows, config.cols
    L = config.buffer_length
    return SlamState(
        smap=empty_map(config.fusion.capacity),
        curr_pose=jnp.eye(4),
        tick=jnp.asarray(1, jnp.int32),
        im_count=jnp.asarray(0, jnp.int32),
        twist_old=jnp.zeros((6,)),
        rings=RingBuffers(
            depth=jnp.zeros((L, rows, cols)),
            intensity=jnp.zeros((L, rows, cols)),
            odom=jnp.broadcast_to(jnp.eye(4), (L, 4, 4)),
        ),
        prev_rgb=jnp.zeros((rows, cols, 3)),
        prev_filt_depth=jnp.zeros((rows, cols)),
        prev_static_prob=jnp.zeros((rows, cols)),
        per_cluster_residual=jnp.full((config.num_clusters,), jnp.nan,
                                      dtype=jnp.float32),
        pred=empty_view(rows, cols),
    )


def empty_view(rows: int, cols: int) -> PredictedView:
    z2 = jnp.zeros((rows, cols))
    z3 = jnp.zeros((rows, cols, 3))
    return PredictedView(image=z3, vertex=z3, conf=z2, normal=z3,
                         radius=z2, time=z2, depth=z2)
