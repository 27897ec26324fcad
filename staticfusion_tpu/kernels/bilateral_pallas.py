"""Pallas TPU kernel for the 13x13 depth bilateral filter.

Reference math: `depth_bilateral.frag:34-76`.  The XLA formulation
(ops/bilateral.py) emits 169 shifted multiply-adds that the fusion pass
splits into several HBM-bound loops (~2.9 ms at QVGA).

Kernel structure (shaped by two Mosaic constraints):
* dynamic ref reads need sublane starts that are provably multiples of 8 —
  so the grid walks aligned row blocks and each step loads ONE dynamic
  window (start = program_id * BLOCK, provably aligned), then all 169 taps
  are *static* value-level slices (sublane shifts + lane rotates);
* fully unrolled taps with value accumulators made Mosaic stack-allocate
  every slice (110 MB VMEM for the whole image) — accumulating into VMEM
  scratch refs instead sequences the taps and lets each tap's temporaries
  die immediately.

Algebraic identity used (same results as the shader):
exp(-(space2*ss + color2*sc)) == exp(-dy^2*ss) * exp(-dx^2*ss)
                                 * exp(-color2*sc)
with both spatial factors compile-time constants.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from staticfusion_tpu.ops.bilateral import (MIN_DEPTH_MM, RADIUS,
                                            SIGMA_COLOR2_INV_HALF,
                                            SIGMA_SPACE2_INV_HALF)


def _row_block(rows: int, cols: int) -> int:
    # Mosaic stack-allocates the unrolled taps' (block, cols) temporaries in
    # scoped VMEM (16 MB limit).  Measured at cols=640: block 48 -> 45.4 MB,
    # block 24 -> 23.0 MB (~0.93 MB/row + 0.6 MB), while 48x320 fits — the
    # cost is superlinear in cols, so the QVGA-good product cap is unsafe
    # wider.  Keep the measured-good blocks at cols<=320; drop to 8 rows
    # (extrapolates to ~8 MB at cols=640) for anything wider.  Widths that
    # are lane-tileable (cols % 128 == 0) never reach this fallback — they
    # take the 2-D grid below, whose temporaries are (block, 128).
    cap = 64 if cols <= 320 else 8
    for br in (64, 48, 40, 32, 24, 16, 8):
        if rows % br == 0 and br <= cap:
            return br
    raise ValueError(f"rows={rows} must be a multiple of 8")


_CTILE = 128   # lane tile: one vreg lane width, keeps window loads aligned
_CPAD = 128    # lane halo pad per side (>= RADIUS, multiple of 128)


def _kernel(pad_ref, mask_ref, out_ref, s1_ref, s2_ref, *, block: int):
    r = RADIUS
    cols = out_ref.shape[1]
    base = pl.program_id(0) * block          # provably a multiple of 8
    win = pad_ref[pl.dslice(base, block + 2 * r), :]
    mwin = mask_ref[pl.dslice(base, block + 2 * r), :]
    d = win[r:r + block, r:r + cols]

    s1_ref[:, :] = jnp.zeros((block, cols), jnp.float32)
    s2_ref[:, :] = jnp.zeros((block, cols), jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = win[r + dy:r + dy + block, r + dx:r + dx + cols]
            inb = mwin[r + dy:r + dy + block, r + dx:r + dx + cols]
            sw = math.exp(-((dx * dx + dy * dy) * SIGMA_SPACE2_INV_HALF))
            diff = d - nb
            w = (sw * inb) * jnp.exp(-(diff * diff) * SIGMA_COLOR2_INV_HALF)
            s1_ref[:, :] = s1_ref[:, :] + nb * w
            s2_ref[:, :] = s2_ref[:, :] + w

    out_ref[:, :] = jnp.round(s1_ref[:, :]
                              / jnp.maximum(s2_ref[:, :], 1e-20))


def _kernel_tiled(pad_ref, mask_ref, out_ref, s1_ref, s2_ref, *,
                  block: int):
    """2-D grid variant for wide images: each step covers a
    (block, _CTILE) output tile.  The window load starts at
    (pid0*block, pid1*_CTILE) — both provably aligned (sublane multiple
    of 8, lane multiple of 128) because the input carries a _CPAD lane
    pad on each side; the +-RADIUS halo is then a *static* slice of the
    loaded value.  Temporaries are (block, _CTILE), so VMEM stays flat in
    the image width."""
    r = RADIUS
    base = pl.program_id(0) * block
    cbase = pl.program_id(1) * _CTILE
    win = pad_ref[pl.dslice(base, block + 2 * r),
                  pl.dslice(cbase, _CTILE + 2 * _CPAD)]
    mwin = mask_ref[pl.dslice(base, block + 2 * r),
                    pl.dslice(cbase, _CTILE + 2 * _CPAD)]
    d = win[r:r + block, _CPAD:_CPAD + _CTILE]

    s1_ref[:, :] = jnp.zeros((block, _CTILE), jnp.float32)
    s2_ref[:, :] = jnp.zeros((block, _CTILE), jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = win[r + dy:r + dy + block, _CPAD + dx:_CPAD + dx + _CTILE]
            inb = mwin[r + dy:r + dy + block, _CPAD + dx:_CPAD + dx + _CTILE]
            sw = math.exp(-((dx * dx + dy * dy) * SIGMA_SPACE2_INV_HALF))
            diff = d - nb
            w = (sw * inb) * jnp.exp(-(diff * diff) * SIGMA_COLOR2_INV_HALF)
            s1_ref[:, :] = s1_ref[:, :] + nb * w
            s2_ref[:, :] = s2_ref[:, :] + w

    out_ref[:, :] = jnp.round(s1_ref[:, :]
                              / jnp.maximum(s2_ref[:, :], 1e-20))


@functools.partial(jax.jit, static_argnames=("max_depth_m", "interpret"))
def bilateral_filter_mm(depth_mm: jnp.ndarray,
                        max_depth_m: float,
                        interpret: bool = False) -> jnp.ndarray:
    rows, cols = depth_mm.shape
    r = RADIUS
    d = depth_mm.astype(jnp.float32)
    if cols > 320 and cols % _CTILE == 0:
        # Wide images (VGA+): 2-D grid with (block, 128) lane tiles.
        cap = 64
        block = next(br for br in (64, 48, 40, 32, 24, 16, 8)
                     if rows % br == 0 and br <= cap)
        padded = jnp.pad(d, ((r, r), (_CPAD, _CPAD)))
        mask = jnp.pad(jnp.ones_like(d), ((r, r), (_CPAD, _CPAD)))
        full = pl.BlockSpec((rows + 2 * r, cols + 2 * _CPAD),
                            lambda i, j: (0, 0))
        out = pl.pallas_call(
            functools.partial(_kernel_tiled, block=block),
            grid=(rows // block, cols // _CTILE),
            in_specs=[full, full],
            out_specs=pl.BlockSpec((block, _CTILE), lambda i, j: (i, j)),
            scratch_shapes=[pltpu.VMEM((block, _CTILE), jnp.float32),
                            pltpu.VMEM((block, _CTILE), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            interpret=interpret,
        )(padded, mask)
    else:
        block = _row_block(rows, cols)
        padded = jnp.pad(d, r)
        mask = jnp.pad(jnp.ones_like(d), r)
        full = pl.BlockSpec((rows + 2 * r, cols + 2 * r), lambda i: (0, 0))
        out = pl.pallas_call(
            functools.partial(_kernel, block=block),
            grid=(rows // block,),
            in_specs=[full, full],
            out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
            scratch_shapes=[pltpu.VMEM((block, cols), jnp.float32),
                            pltpu.VMEM((block, cols), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            interpret=interpret,  # lets the CPU test suite pin this kernel
        )(padded, mask)
    # Center gate (depth_bilateral.frag:41-44) — fuses into the caller.
    in_range = (d >= MIN_DEPTH_MM) & (d <= max_depth_m * 1000.0)
    return jnp.where(in_range, out, 0.0)
