"""Splat prediction (combinedPredict) + FillIn compositing + density check.

Reference: `IndexMap::combinedPredict` (IndexMap.cpp:221-303) with
`splat.vert`/`combo_splat.frag` (surfel-disk ray intersection, z-buffered);
`FillIn` passes (fill_rgb/fill_vertex fragments); `denseEnough`
(Reconstruction.cpp:218-233, 1/40-scale sample grid).

TPU design — gather-based splatting: GL scatters each surfel over a
variable-size point sprite, which is shape-dynamic.  We instead rasterize
surfel *centers* into the 4x index map (one deterministic z-buffer scatter)
and have every camera pixel gather the 8x8 super-resolution texels around it
(+-1 pixel), intersecting its view ray with each candidate disk and keeping
the nearest hit — fixed shapes, pure VPU work, and the index map is shared
with association/cleaning.  Surfels can therefore only paint pixels within
~1 px of their center; in practice (radius ~ z*sqrt2/f) this covers the
reference's splat extent except for extreme grazing disks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import SurfelMap, backproject_fusion
from staticfusion_tpu.geometry.se3 import se3_inverse
from staticfusion_tpu.ops.zbuffer import INVALID, zbuffer_scatter


class PredictedView(NamedTuple):
    image: jnp.ndarray    # (H, W, 3) rgb, 0 where empty
    vertex: jnp.ndarray   # (H, W, 3) camera-frame position, 0 where empty
    conf: jnp.ndarray     # (H, W) surfel confidence
    normal: jnp.ndarray   # (H, W, 3) camera-frame normal
    radius: jnp.ndarray   # (H, W)
    time: jnp.ndarray     # (H, W) surfel init time
    depth: jnp.ndarray    # (H, W) corrected z, 0 where empty


def combined_predict(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                     conf_threshold, config: SFConfig) -> PredictedView:
    """Predict the view from the map at `pose` for surfels with
    conf >= conf_threshold (splat.vert culls, combo_splat.frag math)."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows, cols = cam.height, cam.width
    rows4, cols4 = rows * F, cols * F

    T_inv = se3_inverse(pose)
    R, t = T_inv[:3, :3], T_inv[:3, 3]
    local = smap.pos @ R.T + t
    local_nrm = smap.normal @ R.T
    z = local[:, 2]

    fresh = (jnp.asarray(tick, jnp.float32) - smap.last_time) <= fus.time_delta
    ok = (smap.valid & fresh & (smap.conf >= conf_threshold)
          & (z >= fus.predict_z_min) & (z <= fus.depth_max))

    safe_z = jnp.where(z == 0.0, 1.0, z)
    u4 = jnp.floor(F * (cam.fx * local[:, 0] / safe_z + cam.cx)).astype(jnp.int32)
    v4 = jnp.floor(F * (cam.fy * local[:, 1] / safe_z + cam.cy)).astype(jnp.int32)
    ok = ok & (u4 >= 0) & (u4 < cols4) & (v4 >= 0) & (v4 < rows4)
    winner, _ = zbuffer_scatter(v4 * cols4 + u4, z, ok, rows4 * cols4)

    # Per-pixel rays at pixel centers (combo_splat.frag:35).
    uu = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    vv = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    lx = jnp.broadcast_to((uu - cam.cx) / cam.fx, (rows, cols))
    ly = jnp.broadcast_to((vv - cam.cy) / cam.fy, (rows, cols))

    # All (2F)^2 window texels as one batched gather: (rows, cols, W).
    W = (2 * F) ** 2
    offs = jnp.arange(2 * F, dtype=jnp.int32)
    bu = F * jnp.arange(cols, dtype=jnp.int32)[None, :] - 2
    bv = F * jnp.arange(rows, dtype=jnp.int32)[:, None] - 2
    win_u = bu[..., None, None] + offs[None, None, None, :]
    win_v = bv[..., None, None] + offs[None, None, :, None]
    win_u = jnp.broadcast_to(win_u, (rows, cols, 2 * F, 2 * F)).reshape(
        rows, cols, W)
    win_v = jnp.broadcast_to(win_v, (rows, cols, 2 * F, 2 * F)).reshape(
        rows, cols, W)
    in_win = ((win_u >= 0) & (win_u < cols4) & (win_v >= 0) & (win_v < rows4))
    cand = winner.reshape(rows4, cols4)[jnp.clip(win_v, 0, rows4 - 1),
                                        jnp.clip(win_u, 0, cols4 - 1)]
    has = in_win & (cand != INVALID)
    safe = jnp.where(has, cand, 0)
    cpos = local[safe]                                # (rows, cols, W, 3)
    cnrm = local_nrm[safe]
    crad = smap.radius[safe]
    # Ray-plane: t = dot(p, n)/dot(l, n); hit = t*l (combo_splat.frag:37).
    lxe, lye = lx[..., None], ly[..., None]
    denom = lxe * cnrm[..., 0] + lye * cnrm[..., 1] + cnrm[..., 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    tproj = (cpos[..., 0] * cnrm[..., 0] + cpos[..., 1] * cnrm[..., 1]
             + cpos[..., 2] * cnrm[..., 2]) / denom
    hx = tproj * lxe - cpos[..., 0]
    hy = tproj * lye - cpos[..., 1]
    hz = tproj - cpos[..., 2]
    inside = (hx * hx + hy * hy + hz * hz) <= crad * crad
    ok_cand = has & inside & (tproj > 0)
    tkey = jnp.where(ok_cand, tproj, jnp.inf)
    best_k = jnp.argmin(tkey, axis=-1)
    best_z = jnp.take_along_axis(tkey, best_k[..., None], axis=-1)[..., 0]
    best_id = jnp.where(
        jnp.isfinite(best_z),
        jnp.take_along_axis(cand, best_k[..., None], axis=-1)[..., 0],
        INVALID)

    hit = best_id != INVALID
    safe = jnp.where(hit, best_id, 0)
    zc = jnp.where(hit, best_z, 0.0)
    vertex = jnp.stack([lx * zc, ly * zc, zc], axis=-1)
    sel3 = lambda a: jnp.where(hit[..., None], a[safe], 0.0)
    return PredictedView(
        image=sel3(smap.color),
        vertex=jnp.where(hit[..., None], vertex, 0.0),
        conf=jnp.where(hit, smap.conf[safe], 0.0),
        normal=sel3(local_nrm),
        radius=jnp.where(hit, smap.radius[safe], 0.0),
        time=jnp.where(hit, smap.init_time[safe], 0.0),
        depth=zc,
    )


def dense_enough(image: jnp.ndarray, config: SFConfig) -> jnp.ndarray:
    """>25% of a 1/40-scale nearest-sample grid has nonzero rgb
    (Reconstruction.cpp:218-233 on the u8 download)."""
    s = config.fusion.dense_scale
    rows, cols = image.shape[:2]
    sub = image[s // 2:rows - rows % s:s, s // 2:cols - cols % s:s]
    q = jnp.round(sub * 255.0)
    nz = jnp.all(q > 0, axis=-1)
    return jnp.mean(nz.astype(jnp.float32)) > config.fusion.dense_threshold


class Prediction(NamedTuple):
    depth: jnp.ndarray      # (H, W) final predicted depth for the solver
    intensity: jnp.ndarray  # (H, W) final predicted intensity
    image: jnp.ndarray      # (H, W, 3) composited rgb
    dense: jnp.ndarray      # scalar bool


def _luma(rgb_q: jnp.ndarray) -> jnp.ndarray:
    return (0.299 * rgb_q[..., 0] + 0.587 * rgb_q[..., 1]
            + 0.114 * rgb_q[..., 2])


def get_predicted_images(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                         filtered_depth_m: jnp.ndarray, rgb: jnp.ndarray,
                         static_prob: jnp.ndarray,
                         config: SFConfig) -> Prediction:
    """Reconstruction::getPredictedImages (Reconstruction.cpp:628-720):
    LOW/HIGH predictions, density check, FillIn compositing, depth
    extraction.  RGB is quantized through the u8 texture download before the
    luma, replicating the reference's CPU handoff."""
    fus = config.fusion
    low = combined_predict(smap, pose, tick, fus.low_conf, config)
    high = combined_predict(smap, pose, tick, fus.confidence_threshold, config)

    dense = dense_enough(low.image, config)

    img_empty = lambda im: jnp.sum(im, axis=-1) == 0.0
    vtx_empty = lambda vt: vt[..., 2] == 0.0

    # --- not-dense path: raw-camera fallback ---
    raw_vertex = backproject_fusion(filtered_depth_m, config)
    static_ok = static_prob > fus.fillin_static_gate
    raw_fill_vtx = jnp.where(static_ok[..., None], raw_vertex, 0.0)

    v1 = jnp.where(vtx_empty(low.vertex)[..., None], raw_fill_vtx, low.vertex)
    v2_sparse = jnp.where(vtx_empty(high.vertex)[..., None], v1, high.vertex)
    i1 = jnp.where(img_empty(low.image)[..., None], rgb, low.image)
    i2_sparse = jnp.where(img_empty(high.image)[..., None], i1, high.image)

    # --- dense path: high over low only ---
    v2_dense = jnp.where(vtx_empty(high.vertex)[..., None], low.vertex,
                         high.vertex)
    i2_dense = jnp.where(img_empty(high.image)[..., None], low.image,
                         high.image)

    vertex = jnp.where(dense, v2_dense, v2_sparse)
    image = jnp.where(dense, i2_dense, i2_sparse)

    # extract_depth.frag: z in (0, maxDepth].
    zc = vertex[..., 2]
    depth = jnp.where((zc > 0) & (zc <= fus.depth_max), zc, 0.0)

    rgb_q = jnp.round(jnp.clip(image, 0.0, 1.0) * 255.0) / 255.0
    return Prediction(depth=depth, intensity=_luma(rgb_q), image=image,
                      dense=dense)
