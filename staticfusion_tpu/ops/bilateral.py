"""Depth preprocessing: bilateral filter and metric conversion.

Reference: `depth_bilateral.frag` (13x13 window, R=6,
sigma_space2_inv_half=0.024691358, sigma_color2_inv_half=0.000555556, gates
<300 mm and >maxD) and `depth_metric.frag` (mm -> m with the same gates).

TPU design: the per-fragment window loop becomes 169 shifted VPU
multiply-adds over the whole image — one fused elementwise program. A Pallas
VMEM-tiled variant lives in kernels/pallas_bilateral.py for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SIGMA_SPACE2_INV_HALF = 0.024691358
SIGMA_COLOR2_INV_HALF = 0.000555556
RADIUS = 6
MIN_DEPTH_MM = 300.0


def bilateral_filter_mm(depth_mm: jnp.ndarray, max_depth_m: float) -> jnp.ndarray:
    """Bilateral-filter a depth image in millimeters (float32 carrying u16
    values).  Out-of-range centers output 0; in-bounds neighbors (including
    invalid zeros) participate exactly as in the reference shader.

    Dispatches to the Pallas VMEM-resident kernel on TPU."""
    if jax.default_backend() == "tpu":
        from staticfusion_tpu.kernels import bilateral_pallas
        return bilateral_pallas.bilateral_filter_mm(depth_mm,
                                                    float(max_depth_m))
    rows, cols = depth_mm.shape
    d = depth_mm.astype(jnp.float32)
    r = RADIUS
    padded = jnp.pad(d, r)
    pad_mask = jnp.pad(jnp.ones_like(d), r)  # 0 outside the image

    sum1 = jnp.zeros_like(d)
    sum2 = jnp.zeros_like(d)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = padded[r + dy:r + dy + rows, r + dx:r + dx + cols]
            inb = pad_mask[r + dy:r + dy + rows, r + dx:r + dx + cols]
            space2 = float(dx * dx + dy * dy)
            color2 = (d - nb) ** 2
            w = inb * jnp.exp(-(space2 * SIGMA_SPACE2_INV_HALF
                                + color2 * SIGMA_COLOR2_INV_HALF))
            sum1 = sum1 + nb * w
            sum2 = sum2 + w
    out = jnp.round(sum1 / jnp.maximum(sum2, 1e-20))
    in_range = (d >= MIN_DEPTH_MM) & (d <= max_depth_m * 1000.0)
    return jnp.where(in_range, out, 0.0)


def metricise_depth_mm(depth_mm: jnp.ndarray, max_depth_m: float) -> jnp.ndarray:
    """mm -> meters with [0.3, maxD] gate (depth_metric.frag:26-40)."""
    d = depth_mm.astype(jnp.float32)
    in_range = (d >= MIN_DEPTH_MM) & (d <= max_depth_m * 1000.0)
    return jnp.where(in_range, d / 1000.0, 0.0)
