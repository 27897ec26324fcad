"""Scatter-with-depth-test: the TPU replacement for the GL z-buffer.

Three reference render passes rely on depth-tested rasterization for
conflict resolution: the index-map render (index_map.vert, z-buffered point
write of gl_VertexID), the splat prediction (combo_splat.frag gl_FragDepth),
and implicitly the warp splat.  XLA has no z-buffer, but a deterministic
equivalent is two scatter-mins:

1. scatter-min the depth keys into the target grid;
2. scatter-min the source index among sources whose depth equals the winner
   (deterministic tie-break toward the smallest source index).

Both lower to XLA `scatter` with min combiners — associative, so the result
is reproducible regardless of hardware scheduling (unlike GL, whose ties are
submission-order dependent).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Plain Python int, NOT a jnp scalar: a module-level jnp value would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (parallel/distributed.py).
INVALID = 2147483647


def zbuffer_scatter(flat_idx: jnp.ndarray, depth: jnp.ndarray,
                    valid: jnp.ndarray, n_slots: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-tested scatter of sources onto a flat target grid.

    Args:
      flat_idx: (N,) int32 target slot per source.
      depth:    (N,) float32 depth key (smaller wins).
      valid:    (N,) bool source validity.
      n_slots:  number of target slots.

    Returns:
      winner_src: (n_slots,) int32 — index of the winning source per slot,
                  INVALID where no source landed.
      zmin:       (n_slots,) float32 — winning depth, +inf where empty.
    """
    n = flat_idx.shape[0]
    inf = jnp.asarray(jnp.inf, depth.dtype)
    # Invalid sources get an out-of-bounds index and are dropped by the
    # scatter (a shared sacrificial slot would serialize the dup group).
    idx = jnp.where(valid, flat_idx, n_slots)
    d = jnp.where(valid, depth, inf)

    zmin = jnp.full((n_slots,), inf, depth.dtype).at[idx].min(d, mode="drop")
    src_ids = jnp.arange(n, dtype=jnp.int32)
    # Clipped gather for invalid sources is harmless: is_winner is False
    # there via `valid`.
    is_winner = valid & (d <= zmin[jnp.minimum(idx, n_slots - 1)])
    cand = jnp.where(is_winner, src_ids, INVALID)
    winner = jnp.full((n_slots,), INVALID, jnp.int32).at[
        jnp.where(is_winner, idx, n_slots)].min(cand, mode="drop")
    return winner, zmin


def gather_payload(winner_src: jnp.ndarray, payload: jnp.ndarray,
                   fill_value=0.0) -> jnp.ndarray:
    """Gather per-source payload rows into target slots; empty slots filled."""
    has = winner_src != INVALID
    safe = jnp.where(has, winner_src, 0)
    out = payload[safe]
    if payload.ndim == 1:
        return jnp.where(has, out, fill_value)
    return jnp.where(has[:, None], out, fill_value)
