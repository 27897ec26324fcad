"""Forward-splat inverse warping.

Reference: `warpImagesAccurateInverse` (FrontEnd.cpp:775-892) and the
identical splat in `computeResidualsAgainstPreviousImage`
(FrontEnd.cpp:929-1037).  The *predicted* frame is transformed by
T = T_odometry^{-1} and forward-splatted into the current frame's grid with
the reference's fixed-point x100 weighting scheme:

* sub-pixel position is quantized to 1/100 px (truncation toward zero);
* if the position is within 0.05 px (L1, in the quirky min(dr,dl)+min(du,dd)
  metric) of a grid point, a single scatter of weight 200 to the nearest
  pixel; otherwise four scatters with *additive* (not bilinear-product)
  weights delta_l+delta_d etc. — a reference quirk we reproduce exactly.

TPU design: the per-pixel scalar scatter loop becomes four batched
scatter-adds (`.at[].add`), which XLA lowers to deterministic combiner
scatters on TPU.  Weight accumulation and normalization are fused VPU code.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.ops.pyramid import PyramidLevel


class WarpedImages(NamedTuple):
    depth: jnp.ndarray
    intensity: jnp.ndarray
    xx: jnp.ndarray
    yy: jnp.ndarray


def solver_camera_params(rows_i: int, cols_i: int, fovh: float):
    f = float(cols_i) / (2.0 * math.tan(0.5 * fovh))
    return f, 0.5 * (cols_i - 1), 0.5 * (rows_i - 1)


def warp_forward_splat(src_depth: jnp.ndarray,
                       src_intensity: jnp.ndarray,
                       src_xx: jnp.ndarray,
                       src_yy: jnp.ndarray,
                       T: jnp.ndarray,
                       fovh: float,
                       extra_valid: jnp.ndarray | None = None):
    """Splat (depth, intensity) of the source view through rigid transform T.

    Returns (depth_w, intensity_w, weight_accum); zeros where nothing landed.
    `extra_valid` optionally masks source pixels (used by the temporal
    residual path which also requires current-frame depth != 0,
    FrontEnd.cpp:954).
    """
    rows_i, cols_i = src_depth.shape
    f, disp_u, disp_v = solver_camera_params(rows_i, cols_i, fovh)
    dtype = src_depth.dtype

    z = src_depth
    valid = z != 0.0
    if extra_valid is not None:
        valid = valid & extra_valid

    x_w = T[0, 0] * src_xx + T[0, 1] * src_yy + T[0, 2] * z + T[0, 3]
    y_w = T[1, 0] * src_xx + T[1, 1] * src_yy + T[1, 2] * z + T[1, 3]
    z_w = T[2, 0] * src_xx + T[2, 1] * src_yy + T[2, 2] * z + T[2, 3]

    safe_z = jnp.where(z_w == 0.0, 1.0, z_w)
    # Fixed-point x100 with C-style truncation toward zero (FrontEnd.cpp:819).
    uwarp = (100.0 * (f * x_w / safe_z + disp_u)).astype(jnp.int32)
    vwarp = (100.0 * (f * y_w / safe_z + disp_v)).astype(jnp.int32)

    in_bounds = ((uwarp >= 0) & (uwarp < 100 * (cols_i - 1))
                 & (vwarp >= 0) & (vwarp < 100 * (rows_i - 1)))
    valid = valid & in_bounds

    u_l = uwarp // 100          # uwarp >= 0 here, so // == truncation
    v_d = vwarp // 100
    delta_r = (u_l + 1) * 100 - uwarp          # in (0, 100]
    delta_l = 100 - delta_r                    # in [0, 100)
    delta_u = (v_d + 1) * 100 - vwarp
    delta_d = 100 - delta_u

    near = (jnp.minimum(delta_r, delta_l) + jnp.minimum(delta_u, delta_d)) < 5
    ind_u = jnp.where(delta_r > delta_l, u_l, u_l + 1)
    ind_v = jnp.where(delta_u > delta_d, v_d, v_d + 1)

    # Four (target, weight) pairs; the near-integer case collapses to a single
    # weight-200 scatter at the nearest pixel (FrontEnd.cpp:835-843).
    w_ur = jnp.where(near, 0, delta_l + delta_d)
    w_ul = jnp.where(near, 0, delta_r + delta_d)
    w_dr = jnp.where(near, 0, delta_l + delta_u)
    w_dl = jnp.where(near, 0, delta_r + delta_u)
    w_near = jnp.where(near, 200, 0)

    # One batched scatter per accumulated field: the five candidate targets
    # (4 bilinear corners + the near-integer snap) are stacked into a single
    # (5N,) update — TPU scatters have per-op setup cost, so fewer, larger
    # scatters win.
    n = rows_i * cols_i

    def flat(tv, tu):
        return (tv * cols_i + tu).ravel()

    idx5 = jnp.concatenate([
        flat(v_d + 1, u_l + 1), flat(v_d + 1, u_l),
        flat(v_d, u_l + 1), flat(v_d, u_l), flat(ind_v, ind_u)])
    w5 = jnp.concatenate([
        w.ravel() for w in (w_ur, w_ul, w_dr, w_dl, w_near)]).astype(dtype)
    w5 = w5 * jnp.tile(valid.ravel().astype(dtype), 5)
    # Zero-weight sources route out of bounds and are dropped (an in-bounds
    # dummy slot would serialize the duplicate group).
    idx5 = jnp.where(w5 > 0, idx5, n)

    z5 = jnp.tile(z_w.ravel(), 5)
    i5 = jnp.tile(src_intensity.ravel(), 5)
    # One 3-wide scatter-add for (w*z, w*I, w) — row width is ~free.
    acc = jnp.zeros((n, 3), dtype).at[idx5].add(
        jnp.stack([w5 * z5, w5 * i5, w5], axis=1), mode="drop")

    wacu = acc[:, 2].reshape(rows_i, cols_i)
    nonzero = wacu != 0.0
    safe_w = jnp.where(nonzero, wacu, 1.0)
    depth_w = jnp.where(nonzero,
                        acc[:, 0].reshape(rows_i, cols_i) / safe_w, 0.0)
    intensity_w = jnp.where(nonzero,
                            acc[:, 1].reshape(rows_i, cols_i) / safe_w, 0.0)
    return depth_w, intensity_w, wacu


def _bilinear_sample(fields: jnp.ndarray, valid: jnp.ndarray,
                     u: jnp.ndarray, v: jnp.ndarray, rows_i: int, cols_i: int):
    """Validity-weighted bilinear sampling.

    fields: (C, rows*cols) flattened channels; valid: (rows, cols) bool.
    u, v: (N,) continuous pixel coordinates.  Returns ((C, N) samples,
    (N,) total weight) — samples are normalized by the accumulated validity
    weight; weight 0 means no valid support.
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = jnp.clip(u0.astype(jnp.int32), 0, cols_i - 1)
    v0 = jnp.clip(v0.astype(jnp.int32), 0, rows_i - 1)

    # TPU gathers cost ~the index count regardless of how many rows each
    # index pulls, so the 4 corner gathers x C fields collapse into ONE
    # gather from a (4*(C+1), N) stack of corner-shifted images (validity
    # rides along as an extra channel; out-of-image corners read the
    # zero padding and drop out through the validity weight).
    c = fields.shape[0]
    imgs = jnp.concatenate(
        [fields, valid.ravel().astype(fields.dtype)[None, :]],
        axis=0).reshape(c + 1, rows_i, cols_i)
    shifted = [jnp.pad(imgs, ((0, 0), (0, dv), (0, du)))[:, dv:dv + rows_i,
                                                         du:du + cols_i]
               for dv in (0, 1) for du in (0, 1)]
    stack = jnp.concatenate(shifted, axis=0).reshape(4 * (c + 1), -1)

    g = stack[:, v0 * cols_i + u0]
    corner_w = ((1 - fu) * (1 - fv), fu * (1 - fv), (1 - fu) * fv, fu * fv)
    acc = jnp.zeros((c, u.shape[0]), fields.dtype)
    wacc = jnp.zeros(u.shape, fields.dtype)
    for k, w in enumerate(corner_w):
        blk = g[k * (c + 1):(k + 1) * (c + 1)]
        wgt = w * blk[c]
        acc = acc + blk[:c] * wgt[None, :]
        wacc = wacc + wgt
    safe = jnp.where(wacc > 0.0, wacc, 1.0)
    return acc / safe[None, :], wacc


def warp_images_gather(pred: PyramidLevel, cur_depth: jnp.ndarray,
                       T_odometry: jnp.ndarray, fovh: float) -> WarpedImages:
    """TPU-native inverse warp: resample the prediction onto the current grid.

    Replaces the reference's forward-splat (`warpImagesAccurateInverse`,
    FrontEnd.cpp:775-892) with a gather formulation: each current pixel's
    back-projected point (using the *current* depth as the correspondence
    proxy) is pushed through T_odometry into the predicted view, where depth/
    intensity/coordinates are sampled bilinearly (validity-weighted); the
    sampled predicted point is then re-expressed in the current frame.  At
    the solver's fixed point the two formulations agree; off-convergence both
    are first-order approximations.  Gathers ride the TPU's vectorized
    loads — no scatter conflicts, no z-buffer needed.
    """
    rows_i, cols_i = pred.depth.shape
    f, disp_u, disp_v = solver_camera_params(rows_i, cols_i, fovh)
    dtype = pred.depth.dtype

    # Current-pixel 3D points (x right, y down, z forward as in the splat).
    uu = jnp.arange(cols_i, dtype=dtype)[None, :] - disp_u
    vv = jnp.arange(rows_i, dtype=dtype)[:, None] - disp_v
    inv_f = 1.0 / f
    z_c = cur_depth
    x_c = uu * z_c * inv_f
    y_c = vv * z_c * inv_f

    # Into the predicted frame: X_pred = T_odometry @ X_cur
    # (the splat path applies T_odometry^-1 to predicted points).
    T = T_odometry
    x_p = T[0, 0] * x_c + T[0, 1] * y_c + T[0, 2] * z_c + T[0, 3]
    y_p = T[1, 0] * x_c + T[1, 1] * y_c + T[1, 2] * z_c + T[1, 3]
    z_p = T[2, 0] * x_c + T[2, 1] * y_c + T[2, 2] * z_c + T[2, 3]

    ok = (z_c != 0.0) & (z_p > 0.0)
    safe_z = jnp.where(ok, z_p, 1.0)
    u_s = f * x_p / safe_z + disp_u
    v_s = f * y_p / safe_z + disp_v
    in_b = (u_s >= 0.0) & (u_s <= cols_i - 1) & (v_s >= 0.0) & (v_s <= rows_i - 1)
    ok = ok & in_b
    u_s = jnp.clip(u_s, 0.0, cols_i - 1).ravel()
    v_s = jnp.clip(v_s, 0.0, rows_i - 1).ravel()

    fields = jnp.stack([pred.depth.ravel(), pred.intensity.ravel()])
    samples, w = _bilinear_sample(fields, pred.depth != 0.0, u_s, v_s,
                                  rows_i, cols_i)
    hit = ok.ravel() & (w > 0.0)

    d_s, i_s = samples
    # Sampled predicted point: lateral coords from the *sample position*
    # (u_s, v_s) and the interpolated depth — equivalent interpolation to
    # gathering the xx/yy fields (the fields are exactly u*d/f on the source
    # grid) at 40% less gather traffic.  Re-expressed in the current frame.
    xx_s = (u_s - disp_u) * d_s * (1.0 / f)
    yy_s = (v_s - disp_v) * d_s * (1.0 / f)
    from staticfusion_tpu.geometry.se3 import se3_inverse
    Ti = se3_inverse(T_odometry)
    z_w = Ti[2, 0] * xx_s + Ti[2, 1] * yy_s + Ti[2, 2] * d_s + Ti[2, 3]
    hit = hit & (z_w > 0.0)

    depth_w = jnp.where(hit, z_w, 0.0).reshape(rows_i, cols_i)
    intensity_w = jnp.where(hit, i_s, 0.0).reshape(rows_i, cols_i)
    nonzero = depth_w != 0.0
    xx_w = jnp.where(nonzero, uu * depth_w * inv_f, 0.0)
    yy_w = jnp.where(nonzero, vv * depth_w * inv_f, 0.0)
    return WarpedImages(depth=depth_w, intensity=intensity_w, xx=xx_w, yy=yy_w)


def warp_images_inverse(pred: PyramidLevel, T_odometry: jnp.ndarray,
                        fovh: float) -> WarpedImages:
    """Warp the prediction pyramid level into the current frame
    (FrontEnd.cpp:775-892): splat through T_odometry^{-1}, normalize, and
    recompute lateral coordinates on the target grid."""
    from staticfusion_tpu.geometry.se3 import se3_inverse

    rows_i, cols_i = pred.depth.shape
    f, disp_u, disp_v = solver_camera_params(rows_i, cols_i, fovh)

    T = se3_inverse(T_odometry)
    depth_w, intensity_w, wacu = warp_forward_splat(
        pred.depth, pred.intensity, pred.xx, pred.yy, T, fovh)

    nonzero = wacu != 0.0
    inv_f = 1.0 / f
    uu = jnp.arange(cols_i, dtype=depth_w.dtype)[None, :] - disp_u
    vv = jnp.arange(rows_i, dtype=depth_w.dtype)[:, None] - disp_v
    xx_w = jnp.where(nonzero, uu * depth_w * inv_f, 0.0)
    yy_w = jnp.where(nonzero, vv * depth_w * inv_f, 0.0)
    return WarpedImages(depth=depth_w, intensity=intensity_w, xx=xx_w, yy=yy_w)
