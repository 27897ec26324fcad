"""Splat prediction (combinedPredict) + FillIn compositing + density check.

Reference: `IndexMap::combinedPredict` (IndexMap.cpp:221-303) with
`splat.vert`/`combo_splat.frag` (surfel-disk ray intersection, z-buffered);
`FillIn` passes (fill_rgb/fill_vertex fragments); `denseEnough`
(Reconstruction.cpp:218-233, 1/40-scale sample grid).

TPU design — gather-free splatting: surfel centers rasterize once into the
4x texel images (texelmap.py); every camera pixel then scans its 8x8
super-resolution window via *strided slices* of those images, intersecting
its view ray with each candidate disk and keeping the nearest hit.  Fixed
shapes, pure VPU stencil work.  Surfels paint pixels within ~1 px of their
center — covering the reference's splat extent except extreme grazing disks
(those mostly fail the GL radius test too).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import SurfelMap, backproject_fusion
from staticfusion_tpu.fusion.texelmap import (TexelImages, phase_decompose,
                                              phase_window, project_surfels,
                                              render_texel_images,
                                              window_offsets)


class PredictedView(NamedTuple):
    image: jnp.ndarray    # (H, W, 3) rgb, 0 where empty
    vertex: jnp.ndarray   # (H, W, 3) camera-frame position, 0 where empty
    conf: jnp.ndarray     # (H, W) surfel confidence
    normal: jnp.ndarray   # (H, W, 3) camera-frame normal
    radius: jnp.ndarray   # (H, W)
    time: jnp.ndarray     # (H, W) surfel init time
    depth: jnp.ndarray    # (H, W) corrected z, 0 where empty


def splat_from_texels(tex: TexelImages, config: SFConfig) -> PredictedView:
    """Ray-disk intersection against the window of texel candidates
    (combo_splat.frag math), nearest hit wins.

    Vectorized over the window axis: all |offsets|^2 candidate images stack
    on a leading axis, the gate/intersection math runs as one fused
    elementwise pass, an argmin picks the nearest hit, and the attribute
    selection is a one-hot contraction.  The equivalent per-offset
    `jnp.where` chain built a 64-deep serial dependency at F=4 (11.9 ms
    marginal, round-3 ablation); this form is depth-2."""
    cam = config.camera
    F = config.fusion.index_factor
    rows, cols = cam.height, cam.width

    uu = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    vv = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    lx = jnp.broadcast_to((uu - cam.cx) / cam.fx, (rows, cols))[None]
    ly = jnp.broadcast_to((vv - cam.cy) / cam.fy, (rows, cols))[None]

    names = ("has", "x", "y", "z", "nx", "ny", "nz", "radius",
             "conf", "init_time", "r", "g", "b")
    ph = {name: phase_decompose(
        getattr(tex, name).astype(jnp.float32) if name == "has"
        else getattr(tex, name), F)
        for name in names}
    offs = [(dv, du) for dv in window_offsets(F) for du in window_offsets(F)]
    C = {name: jnp.stack([phase_window(ph[name], dv, du, F)
                          for dv, du in offs]) for name in names}

    has = C["has"] > 0
    cx_, cy_, cz = C["x"], C["y"], C["z"]
    cnx, cny, cnz = C["nx"], C["ny"], C["nz"]
    crad = C["radius"]
    denom = lx * cnx + ly * cny + cnz
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    tproj = (cx_ * cnx + cy_ * cny + cz * cnz) / denom
    hx = tproj * lx - cx_
    hy = tproj * ly - cy_
    hz = tproj - cz
    inside = (hx * hx + hy * hy + hz * hz) <= crad * crad
    ok = has & inside & (tproj > 0)
    tz = jnp.where(ok, tproj, jnp.inf)
    best = jnp.argmin(tz, axis=0)            # first-in-scan-order on ties
    best_z = jnp.min(tz, axis=0)
    onehot = (jnp.arange(len(offs))[:, None, None] == best[None]).astype(
        jnp.float32)

    def select(name):
        return jnp.sum(C[name] * onehot, axis=0)

    sel = dict(conf=select("conf"), radius=select("radius"),
               time=select("init_time"), r=select("r"), g=select("g"),
               b=select("b"), nx=select("nx"), ny=select("ny"),
               nz=select("nz"))

    hit = jnp.isfinite(best_z)
    zc = jnp.where(hit, best_z, 0.0)
    vertex = jnp.stack([lx[0] * zc, ly[0] * zc, zc], axis=-1)
    h3 = hit[..., None]
    return PredictedView(
        image=jnp.where(h3, jnp.stack([sel["r"], sel["g"], sel["b"]], -1), 0.0),
        vertex=jnp.where(h3, vertex, 0.0),
        conf=jnp.where(hit, sel["conf"], 0.0),
        normal=jnp.where(h3, jnp.stack([sel["nx"], sel["ny"], sel["nz"]], -1),
                         0.0),
        radius=jnp.where(hit, sel["radius"], 0.0),
        time=jnp.where(hit, sel["time"], 0.0),
        depth=zc,
    )


def combined_predict(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                     conf_threshold, config: SFConfig) -> PredictedView:
    """Predict the view from the map at `pose` for surfels with
    conf >= conf_threshold (splat.vert culls, combo_splat.frag math)."""
    local = project_surfels(smap, pose, config)
    tex = render_texel_images(smap, local, tick, config,
                              conf_threshold=conf_threshold,
                              z_min=config.fusion.predict_z_min)
    return splat_from_texels(tex, config)


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


def composite_prediction(low: PredictedView,
                         filtered_depth_m: jnp.ndarray, rgb: jnp.ndarray,
                         static_prob: jnp.ndarray,
                         config: SFConfig) -> Prediction:
    """The FillIn / density-check / depth-extraction tail of
    Reconstruction::getPredictedImages, over an already-splatted LOW view
    (elementwise only — the production pipeline carries the splat from the
    previous fuse, see backend.fuse_frame).

    Both confidence classes share the ONE splat: the HIGH view is the LOW
    view masked to pixels whose winning splat already meets the high
    threshold.  (The reference renders twice, so where a low-conf surfel
    occludes a high-conf one its HIGH view shows the one behind; here that
    pixel falls through to the LOW/raw composite instead — the same front
    surface wins either way in the fused image.)"""
    fus = config.fusion
    hi_m = low.conf >= fus.confidence_threshold
    hi3 = hi_m[..., None]
    high = PredictedView(
        image=jnp.where(hi3, low.image, 0.0),
        vertex=jnp.where(hi3, low.vertex, 0.0),
        conf=jnp.where(hi_m, low.conf, 0.0),
        normal=jnp.where(hi3, low.normal, 0.0),
        radius=jnp.where(hi_m, low.radius, 0.0),
        time=jnp.where(hi_m, low.time, 0.0),
        depth=jnp.where(hi_m, low.depth, 0.0),
    )

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


def get_predicted_images(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                         filtered_depth_m: jnp.ndarray, rgb: jnp.ndarray,
                         static_prob: jnp.ndarray,
                         config: SFConfig) -> Prediction:
    """Reconstruction::getPredictedImages (Reconstruction.cpp:628-720) from
    the map: render + splat + composite.  RGB is quantized through the u8
    texture download before the luma, replicating the reference's CPU
    handoff.  The steady-state pipeline instead composites the splat carried
    over from the previous fuse (backend.fuse_frame)."""
    low = predict_low_view(smap, pose, tick, config)
    return composite_prediction(low, filtered_depth_m, rgb, static_prob,
                                config)


def predict_low_view(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                     config: SFConfig) -> PredictedView:
    """Render + splat the LOW-confidence predicted view (used at bootstrap,
    where no fuse-carried splat exists yet)."""
    fus = config.fusion
    local = project_surfels(smap, pose, config)
    tex_low = render_texel_images(smap, local, tick, config,
                                  conf_threshold=fus.low_conf,
                                  z_min=fus.predict_z_min)
    return splat_from_texels(tex_low, config)
