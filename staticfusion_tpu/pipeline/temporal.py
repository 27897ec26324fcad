"""Temporal residual check against the frame 5 steps back.

Reference: `computeResidualsAgainstPreviousImage` (FrontEnd.cpp:896-1069) —
compose the ring-buffered odometries, forward-splat the old frame into the
current one, and average |depth residual| + 0.15*|intensity residual| per
cluster.  `buildSegmImage` uses the result to rescue low-residual clusters
toward static (SegmentationBackground.cpp:190-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig, NUM_CLUSTERS
from staticfusion_tpu.geometry.se3 import se3_inverse
from staticfusion_tpu.ops.pyramid import coords_for_level
from staticfusion_tpu.ops.warp import warp_forward_splat
from staticfusion_tpu.pipeline.state import RingBuffers


def compute_temporal_residuals(rings: RingBuffers,
                               T_odometry: jnp.ndarray,
                               im_count: jnp.ndarray,
                               depth_current: jnp.ndarray,
                               intensity_current: jnp.ndarray,
                               labels_full: jnp.ndarray,
                               config: SFConfig) -> jnp.ndarray:
    """(K,) per-cluster 5-frame average residuals; NaN for empty clusters.

    Mirrors the reference's transform composition (FrontEnd.cpp:898-909):
    T = prod_{i=index-L+1}^{index-1} odom[i % L] * T_odometry, then inverted;
    the ring slot (index - L) % L == index % L holds the oldest frame."""
    L = config.buffer_length
    k = NUM_CLUSTERS

    idx_to_warp = im_count % L

    # Compose the L-1 intermediate odometries in ring order.
    def body(i, T):
        slot = (im_count - (L - 1) + i) % L
        return T @ rings.odom[slot]

    T = jax.lax.fori_loop(0, L - 1, body, jnp.eye(4))
    T = se3_inverse(T @ T_odometry)

    depth_old = rings.depth[idx_to_warp]
    intensity_old = rings.intensity[idx_to_warp]
    xx, yy = coords_for_level(depth_old, config.camera.fovh)

    extra_valid = depth_current != 0.0
    depth_w, intensity_w, _ = warp_forward_splat(
        depth_old, intensity_old, xx, yy, T, config.camera.fovh,
        extra_valid=extra_valid)

    # Pixels whose source was invalid contribute zero intensity
    # (FrontEnd.cpp:1022-1024 zeroes intensity_diff there).
    src_ok = (depth_old != 0.0) & extra_valid
    intensity_cur_masked = jnp.where(src_ok, intensity_current, 0.0)

    depth_res = depth_current - depth_w
    intensity_res = intensity_cur_masked - intensity_w
    cumulative = (jnp.abs(depth_res)
                  + config.solver.k_photometric_res * jnp.abs(intensity_res))

    counted = (depth_w != 0.0) & (depth_current != 0.0)
    lbl = jnp.where(counted & (labels_full < k), labels_full, k).ravel()
    sums = jnp.zeros((k + 1,)).at[lbl].add(
        jnp.where(counted.ravel(), cumulative.ravel(), 0.0))[:k]
    cnts = jnp.zeros((k + 1,)).at[lbl].add(
        counted.ravel().astype(jnp.float32))[:k]
    avg = sums / (2.0 * (cnts + 1.0))  # the reference's +1/x2 accounting
    return jnp.where(cnts > 0, avg, jnp.nan)
