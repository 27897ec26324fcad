"""Sort-based segment reductions: TPU-fast replacements for scatter.

XLA lowers scatters with duplicate indices to a *serialized* update loop on
TPU — the single biggest perf trap for this workload (SURVEY.md section 7 "hard
parts").  Every hot scatter here is re-expressed as:

    lexicographic lax.sort (bitonic, parallel)
  + cumsum / segment-start picks
  + one vectorized searchsorted over the (dense) target range

which are all parallel TPU primitives.  Semantics match the scatter versions
bit-for-bit for min-combines (deterministic lexicographic tie-break) and up
to fp addition order for sums.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.ops.zbuffer import INVALID


def _segment_bounds(sorted_targets: jnp.ndarray, n_targets: int):
    """hi[t] = #entries with target <= t; lo[t] = hi[t-1]."""
    t_range = jnp.arange(n_targets, dtype=sorted_targets.dtype)
    hi = jnp.searchsorted(sorted_targets, t_range, side="right")
    lo = jnp.concatenate([jnp.zeros((1,), hi.dtype), hi[:-1]])
    return lo, hi


def segment_sums(targets: jnp.ndarray, values: Sequence[jnp.ndarray],
                 valid: jnp.ndarray, n_targets: int) -> Tuple[jnp.ndarray, ...]:
    """Per-target sums of each value array (all shape (N,)).

    Equivalent to `zeros(n).at[targets].add(where(valid, v, 0))` without the
    serialized TPU scatter."""
    tgt = jnp.where(valid, targets, n_targets).astype(jnp.int32)
    vals = [jnp.where(valid, v, 0.0) for v in values]
    sorted_ops = jax.lax.sort((tgt, *vals), num_keys=1)
    s_tgt = sorted_ops[0]
    lo, hi = _segment_bounds(s_tgt, n_targets)
    outs = []
    for sv in sorted_ops[1:]:
        p = jnp.concatenate([jnp.zeros((1,), sv.dtype), jnp.cumsum(sv)])
        outs.append(p[hi] - p[lo])
    return tuple(outs)


def segment_min_argmin(targets: jnp.ndarray, keys: jnp.ndarray,
                       payload: jnp.ndarray, valid: jnp.ndarray,
                       n_targets: int):
    """Per-target (min key, payload of the min) with deterministic ties
    (smallest payload wins).  The sort-based z-buffer.

    Returns (winner_payload (n,), key_min (n,)); empty targets get
    (INVALID, +inf)."""
    tgt = jnp.where(valid, targets, n_targets).astype(jnp.int32)
    k = jnp.where(valid, keys, jnp.inf)
    p = jnp.where(valid, payload, INVALID)
    s_tgt, s_key, s_payload = jax.lax.sort((tgt, k, p), num_keys=3)
    lo, hi = _segment_bounds(s_tgt, n_targets)
    has = hi > lo
    first = jnp.where(has, lo, 0)
    winner = jnp.where(has, s_payload[first], INVALID)
    kmin = jnp.where(has, s_key[first], jnp.inf)
    return winner, kmin


def bincount_matmul(labels: jnp.ndarray, values: jnp.ndarray,
                    valid: jnp.ndarray, n_bins: int):
    """(sums, counts) per bin via a one-hot matmul (MXU) — replaces the
    small-bin scatter-adds in the solver statistics.

    labels (N,) int in [0, n_bins]; invalid/overflow labels drop out."""
    lbl = jnp.where(valid, labels, n_bins)
    one_hot = (lbl[:, None] == jnp.arange(n_bins)[None, :]).astype(values.dtype)
    sums = jnp.einsum("nk,n->k", one_hot, values,
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    return sums, counts
