"""Depth-aware image pyramid.

TPU-native re-design of the reference's `createImagePyramid`
(FrontEnd.cpp:256-391): per 2x downsample level, inner pixels blend a 4x4
neighborhood with a separable (1,2,2,1)^2/36 mask, gated by similarity to the
"second maximum" depth of the central 2x2 block (max_depth_dif = 0.1,
FrontEnd.cpp:259); border pixels use a plain 2x2 mean (mean of the non-zero
depths for depth).  Zero depth is the invalid sentinel throughout.

Instead of the reference's per-pixel scalar loops, each level is 16 strided
slices of a zero-padded parent combined with vectorized VPU arithmetic — one
fused XLA computation per level, no gathers.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig

MAX_DEPTH_DIF = 0.1


class PyramidLevel(NamedTuple):
    depth: jnp.ndarray      # (rows_i, cols_i) meters, 0 = invalid
    intensity: jnp.ndarray  # (rows_i, cols_i) grayscale [0,1]
    xx: jnp.ndarray         # lateral x coordinate image (solver camera)
    yy: jnp.ndarray         # lateral y coordinate image


Pyramid = Tuple[PyramidLevel, ...]


def _conv_mask(dtype=jnp.float32) -> jnp.ndarray:
    """(1,2,2,1) outer product / 36 (FrontEnd.cpp:146-149)."""
    v = jnp.array([1.0, 2.0, 2.0, 1.0], dtype)
    return v[:, None] * v[None, :] / 36.0


def _blocks_4x4(img: jnp.ndarray, rows_o: int, cols_o: int) -> jnp.ndarray:
    """(..., rows_o, cols_o, 4, 4) neighborhoods img[2v-1+a, 2u-1+b],
    zero-padded.  `img` may carry leading batch dims.

    Phase-decomposed: one reshape/transpose splits the parent into its four
    2x2 phases; the 4x4 window offsets then become +-1 shifts of phase
    images — avoiding 16 stride-2 lane-relayout slices on TPU."""
    batch = img.shape[:-2]
    nb = len(batch)
    # phases[p, q][..., v, u] = img[..., 2v + p, 2u + q]
    phases = img.reshape(*batch, rows_o, 2, cols_o, 2)
    phases = jnp.moveaxis(phases, (nb + 1, nb + 3), (0, 1))

    pad_width = ((0, 0),) * nb + ((1, 1), (1, 1))

    def shifted(a, b):
        # img[2v - 1 + a, 2u - 1 + b] = phases[(a-1)%2, (b-1)%2] shifted by
        # ((a-1)//2, (b-1)//2) pixels.
        p, dv = (a - 1) % 2, (a - 1) // 2
        q, du = (b - 1) % 2, (b - 1) // 2
        ph = phases[p, q]
        if dv == 0 and du == 0:
            return ph
        pad = jnp.pad(ph, pad_width)
        return pad[..., 1 + dv:1 + dv + rows_o, 1 + du:1 + du + cols_o]

    rows = []
    for a in range(4):
        cols = [shifted(a, b) for b in range(4)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def downsample_level(depth_prev: jnp.ndarray, intensity_prev: jnp.ndarray):
    """One 2x depth-aware downsample step -> (depth, intensity).  Inputs may
    carry leading batch dims (used to build the current + predicted pyramids
    in one pass, doubling VPU lane utilization at QVGA sizes)."""
    rows_o, cols_o = depth_prev.shape[-2] // 2, depth_prev.shape[-1] // 2
    dtype = depth_prev.dtype

    d_blk = _blocks_4x4(depth_prev, rows_o, cols_o)       # (..., R, C, 4, 4)
    i_blk = _blocks_4x4(intensity_prev, rows_o, cols_o)

    # Central 2x2 of the 4x4 block = parent pixels (2v..2v+1, 2u..2u+1).
    central = jnp.stack(
        [d_blk[..., 1, 1], d_blk[..., 2, 1], d_blk[..., 1, 2], d_blk[..., 2, 2]],
        axis=-1)
    # "Second maximum" of the central four (FrontEnd.cpp:311-317).
    dcenter = jnp.sort(central, axis=-1)[..., 2]

    mask = _conv_mask(dtype)
    abs_dif = jnp.abs(d_blk - dcenter[..., None, None])
    gate = abs_dif < MAX_DEPTH_DIF
    w = jnp.where(gate, mask * (MAX_DEPTH_DIF - abs_dif), 0.0)
    w_sum = jnp.sum(w, axis=(-1, -2))
    safe_w = jnp.where(w_sum > 0, w_sum, 1.0)
    d_inner = jnp.where(dcenter != 0.0,
                        jnp.sum(w * d_blk, axis=(-1, -2)) / safe_w, 0.0)
    i_gated = jnp.sum(w * i_blk, axis=(-1, -2)) / safe_w
    i_plain = jnp.sum(mask * i_blk, axis=(-1, -2))
    i_inner = jnp.where(dcenter != 0.0, i_gated, i_plain)

    # Border pixels: plain 2x2 (FrontEnd.cpp:347-373).
    c_d = central
    c_i = jnp.stack(
        [i_blk[..., 1, 1], i_blk[..., 2, 1], i_blk[..., 1, 2], i_blk[..., 2, 2]],
        axis=-1)
    i_border = 0.25 * jnp.sum(c_i, axis=-1)
    nz = (c_d != 0.0).astype(dtype)
    cnt = jnp.sum(nz, axis=-1)
    d_border = jnp.where(cnt > 0, jnp.sum(c_d, axis=-1) / jnp.where(cnt > 0, cnt, 1.0), 0.0)

    vv = jnp.arange(rows_o)[:, None]
    uu = jnp.arange(cols_o)[None, :]
    border = (vv == 0) | (vv == rows_o - 1) | (uu == 0) | (uu == cols_o - 1)
    depth = jnp.where(border, d_border, d_inner)
    intensity = jnp.where(border, i_border, i_inner)
    return depth, intensity


def coords_for_level(depth: jnp.ndarray, fovh: float):
    """Back-projected lateral coordinates with the solver camera
    (single focal from fovh, principal point (n-1)/2; FrontEnd.cpp:377-388)."""
    rows_i, cols_i = depth.shape[-2:]
    inv_f = 2.0 * math.tan(0.5 * fovh) / float(cols_i)
    disp_u = 0.5 * (cols_i - 1)
    disp_v = 0.5 * (rows_i - 1)
    uu = jnp.arange(cols_i, dtype=depth.dtype)[None, :] - disp_u
    vv = jnp.arange(rows_i, dtype=depth.dtype)[:, None] - disp_v
    xx = inv_f * uu * depth
    yy = inv_f * vv * depth
    return xx, yy


def build_pyramid(depth0: jnp.ndarray, intensity0: jnp.ndarray,
                  config: SFConfig) -> Pyramid:
    """Full pyramid, level 0 = input resolution, `config.ctf_levels` levels."""
    fovh = config.camera.fovh
    levels = []
    d, i = depth0, intensity0
    for lvl in range(config.ctf_levels):
        if lvl > 0:
            d, i = downsample_level(d, i)
        xx, yy = coords_for_level(d, fovh)
        levels.append(PyramidLevel(depth=d, intensity=i, xx=xx, yy=yy))
    return tuple(levels)


def build_pyramid_pair(depth_a: jnp.ndarray, intensity_a: jnp.ndarray,
                       depth_b: jnp.ndarray, intensity_b: jnp.ndarray,
                       config: SFConfig) -> Tuple[Pyramid, Pyramid]:
    """Two pyramids in one batched pass.

    The per-frame step always builds the current-frame and predicted-frame
    pyramids back to back (runSolver's two createImagePyramid calls,
    FrontEnd.cpp:1079 + the prediction pyramid); at QVGA each level is far
    below full VPU occupancy, so stacking the two images roughly halves the
    combined wall time."""
    d = jnp.stack([depth_a, depth_b])
    i = jnp.stack([intensity_a, intensity_b])
    fovh = config.camera.fovh
    la, lb = [], []
    for lvl in range(config.ctf_levels):
        if lvl > 0:
            d, i = downsample_level(d, i)
        xx, yy = coords_for_level(d, fovh)
        la.append(PyramidLevel(depth=d[0], intensity=i[0], xx=xx[0], yy=yy[0]))
        lb.append(PyramidLevel(depth=d[1], intensity=i[1], xx=xx[1], yy=yy[1]))
    return tuple(la), tuple(lb)
