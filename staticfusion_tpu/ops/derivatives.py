"""Intermediate coordinates, depth-adaptive derivatives, and solver pre-weights.

Reference: `calculateCoord` (FrontEnd.cpp:393-430), `calculateDerivatives`
(FrontEnd.cpp:432-479), `computeWeights` (FrontEnd.cpp:481-510).

All three are pure elementwise/stencil passes — a single fused VPU program on
TPU.  The reference's `validPixels` index list becomes a boolean mask (static
shapes; reductions are masked sums).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.ops.pyramid import PyramidLevel
from staticfusion_tpu.ops.warp import WarpedImages

EPS_INTENSITY = 1e-6
EPS_DEPTH = 0.005


class InterCoords(NamedTuple):
    depth: jnp.ndarray
    intensity: jnp.ndarray
    xx: jnp.ndarray
    yy: jnp.ndarray
    null: jnp.ndarray    # bool: either depth is missing
    valid: jnp.ndarray   # bool: non-null AND strictly inside the border


class Derivatives(NamedTuple):
    dcu: jnp.ndarray
    dcv: jnp.ndarray
    dct: jnp.ndarray
    ddu: jnp.ndarray
    ddv: jnp.ndarray
    ddt: jnp.ndarray


class PreWeights(NamedTuple):
    weights_c: jnp.ndarray
    weights_d: jnp.ndarray


def calculate_coords(cur: PyramidLevel, warped: WarpedImages) -> InterCoords:
    """'Inter' images = midpoint of current and warped, for a symmetric
    linearization of the optical/range flow constraints (FrontEnd.cpp:393-430)."""
    both = (cur.depth != 0.0) & (warped.depth != 0.0)
    null = ~both
    depth_i = jnp.where(both, 0.5 * (cur.depth + warped.depth), 0.0)
    xx_i = jnp.where(both, 0.5 * (cur.xx + warped.xx), 0.0)
    yy_i = jnp.where(both, 0.5 * (cur.yy + warped.yy), 0.0)
    intensity_i = 0.5 * (cur.intensity + warped.intensity)

    rows_i, cols_i = cur.depth.shape
    vv = jnp.arange(rows_i)[:, None]
    uu = jnp.arange(cols_i)[None, :]
    inner = (vv > 0) & (vv < rows_i - 1) & (uu > 0) & (uu < cols_i - 1)
    return InterCoords(depth=depth_i, intensity=intensity_i, xx=xx_i, yy=yy_i,
                       null=null, valid=both & inner)


def _shift(img, dv, du):
    """img[v+dv, u+du] with zero padding."""
    return jnp.roll(jnp.roll(img, -dv, axis=0), -du, axis=1)


def calculate_derivatives(inter: InterCoords, cur: PyramidLevel,
                          warped: WarpedImages) -> Derivatives:
    """Depth-adaptive weighted central differences (FrontEnd.cpp:432-479).

    Edge weights r = |forward difference| + eps are 1 at Null pixels and at
    the last column/row; spatial derivatives are only defined strictly inside
    the image (zero elsewhere), temporal derivatives are dense."""
    d = inter.depth
    c = inter.intensity
    rows_i, cols_i = d.shape
    vv = jnp.arange(rows_i)[:, None]
    uu = jnp.arange(cols_i)[None, :]

    has_right = uu < cols_i - 1
    has_down = vv < rows_i - 1
    not_null = ~inter.null

    def fwd_u(img):
        return _shift(img, 0, 1) - img

    def fwd_v(img):
        return _shift(img, 1, 0) - img

    rx = jnp.where(not_null & has_right, jnp.abs(fwd_u(d)) + EPS_DEPTH, 1.0)
    rx_c = jnp.where(not_null & has_right, jnp.abs(fwd_u(c)) + EPS_INTENSITY, 1.0)
    ry = jnp.where(not_null & has_down, jnp.abs(fwd_v(d)) + EPS_DEPTH, 1.0)
    ry_c = jnp.where(not_null & has_down, jnp.abs(fwd_v(c)) + EPS_INTENSITY, 1.0)

    inner = (vv > 0) & (vv < rows_i - 1) & (uu > 0) & (uu < cols_i - 1)
    write = inner & not_null

    def weighted_central(img, r_pos, axis):
        if axis == 0:
            r_neg = _shift(r_pos, -1, 0)
            fwd = _shift(img, 1, 0) - img
            bwd = img - _shift(img, -1, 0)
        else:
            r_neg = _shift(r_pos, 0, -1)
            fwd = _shift(img, 0, 1) - img
            bwd = img - _shift(img, 0, -1)
        return (r_neg * fwd + r_pos * bwd) / (r_pos + r_neg)

    dcu = jnp.where(write, weighted_central(c, rx_c, 1), 0.0)
    ddu = jnp.where(write, weighted_central(d, rx, 1), 0.0)
    dcv = jnp.where(write, weighted_central(c, ry_c, 0), 0.0)
    ddv = jnp.where(write, weighted_central(d, ry, 0), 0.0)

    dct = cur.intensity - warped.intensity
    ddt = cur.depth - warped.depth
    return Derivatives(dcu=dcu, dcv=dcv, dct=dct, ddu=ddu, ddv=ddv, ddt=ddt)


def compute_weights(deriv: Derivatives, valid: jnp.ndarray) -> PreWeights:
    """Pre-weighting from an estimate of the linearization error
    (FrontEnd.cpp:481-510), max-normalized over the valid set."""
    k_c, k_d = 10.0, 200.0
    err_m_c, err_m_d = 1.0, 0.01

    err_l_c = k_c * (jnp.abs(deriv.dct) + jnp.abs(deriv.dcu) + jnp.abs(deriv.dcv))
    err_l_d = k_d * (jnp.abs(deriv.ddt) + jnp.abs(deriv.ddu) + jnp.abs(deriv.ddv))
    w_c = jnp.where(valid, jnp.sqrt(1.0 / (err_m_c + err_l_c)), 0.0)
    w_d = jnp.where(valid, jnp.sqrt(1.0 / (err_m_d + err_l_d)), 0.0)

    max_c = jnp.maximum(jnp.max(w_c), 1e-20)
    max_d = jnp.maximum(jnp.max(w_d), 1e-20)
    return PreWeights(weights_c=w_c / max_c, weights_d=w_d / max_d)
