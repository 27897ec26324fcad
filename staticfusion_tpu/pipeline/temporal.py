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
from staticfusion_tpu.ops.pyramid import PyramidLevel, coords_for_level
from staticfusion_tpu.ops.segments import bincount_matmul
from staticfusion_tpu.ops.warp import warp_images_gather
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

    T_fwd = jax.lax.fori_loop(0, L - 1, body, jnp.eye(4)) @ T_odometry

    # (Round-4 finding: subsampling this field with strided [::2] slices
    # LOST ~1 ms/frame at QVGA and ~3 ms at VGA — the non-contiguous
    # layouts cost more than the smaller warp gather saves.  Full
    # resolution, reference-exact, is also the fast path on TPU.)
    depth_old = rings.depth[idx_to_warp]
    intensity_old = rings.intensity[idx_to_warp]
    xx, yy = coords_for_level(depth_old, config.camera.fovh)

    # Gather formulation of the reference's forward splat
    # (FrontEnd.cpp:929-1037): each current pixel back-projects with its own
    # depth, maps into the old frame through T_fwd, and bilinearly samples
    # the old (depth, intensity); the sampled old point re-expressed in the
    # current frame gives the warped depth.  Statistically equivalent for
    # the per-cluster residual average, ~5x cheaper than the scatter splat.
    old_level = PyramidLevel(depth=depth_old, intensity=intensity_old,
                             xx=xx, yy=yy)
    warped = warp_images_gather(old_level, depth_current, T_fwd,
                                config.camera.fovh)
    depth_w, intensity_w = warped.depth, warped.intensity

    # Pixels whose warp found no valid old-frame support carry zero depth_w
    # and drop out of `counted` below (the reference instead zeroes the
    # intensity residual where the splat source was invalid,
    # FrontEnd.cpp:1022-1024).
    hit = depth_w != 0.0
    depth_res = jnp.where(hit, depth_current - depth_w, 0.0)
    intensity_res = jnp.where(hit, intensity_current - intensity_w, 0.0)
    cumulative = (jnp.abs(depth_res)
                  + config.solver.k_photometric_res * jnp.abs(intensity_res))

    counted = (depth_w != 0.0) & (depth_current != 0.0)
    # Duplicate-heavy 25-bin scatter-adds serialize on TPU; the one-hot
    # matmul reduction (MXU) is the fast path (ops/segments.py).
    sums, cnts = bincount_matmul(labels_full.ravel(), cumulative.ravel(),
                                 (counted & (labels_full < k)).ravel(), k)
    avg = sums / (2.0 * (cnts + 1.0))  # the reference's +1/x2 accounting
    return jnp.where(cnts > 0, avg, jnp.nan)
