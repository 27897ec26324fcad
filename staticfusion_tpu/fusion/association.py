"""Fusion pass 1: per-pixel data association against the 4x index map.

Reference: `data.vert` (+ data.geom/frag) — for active pixels (checkerboard
in time), search a window of index-map texels for the best matching surfel:
ray-depth gate |lambda*(z_model - z_meas)| < 0.05, minimal point-to-ray
distance, normal gate (|n_z| < 0.75 or angle < 0.5 rad).  Matched pixels emit
an update record at the surfel's slot; unmatched become new unstable surfels
(conf 0.08 iff probStatic > 0.5 else 0; data.vert:171-180).

Window geometry: the GLSL samples 16x16 half-texel steps around the pixel
center with nearest filtering, which touches exactly the 8x8 index texels
[4u-2, 4u+5] x [4v-2, 4v+5] (each twice — harmless for a best-distance
search).  We gather those 64 candidates with static offsets.

Collision resolution: two active pixels can match the same surfel.  GL
resolves by raster order; we dedupe deterministically — the pixel with the
smallest flat index wins (a zbuffer_scatter keyed by pixel index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.indexmap import IndexMapRender
from staticfusion_tpu.fusion.surfels import (FrameCloud, frame_cloud,
                                             radial_confidence)
from staticfusion_tpu.ops.zbuffer import INVALID, zbuffer_scatter


class UpdateRecords(NamedTuple):
    """Per-surfel-slot update from the matched pixel (dense over capacity)."""
    has_update: jnp.ndarray  # (N,) bool
    pos: jnp.ndarray         # (N, 3) new world position
    conf: jnp.ndarray        # (N,) new-measurement confidence `a`
    color: jnp.ndarray       # (N, 3)
    normal: jnp.ndarray      # (N, 3) world
    radius: jnp.ndarray      # (N,)


class NewSurfels(NamedTuple):
    """Per-pixel new unstable surfel candidates (dense over pixels)."""
    is_new: jnp.ndarray     # (P,) bool
    pos: jnp.ndarray        # (P, 3) world
    conf: jnp.ndarray       # (P,)
    color: jnp.ndarray      # (P, 3)
    normal: jnp.ndarray     # (P, 3) world
    radius: jnp.ndarray     # (P,)


class AssociationResult(NamedTuple):
    updates: UpdateRecords
    new: NewSurfels


def _neighbours_ok(depth: jnp.ndarray) -> jnp.ndarray:
    """4-neighbors nonzero (data.vert checkNeighbours), zero-padded."""
    p = jnp.pad(depth, 1)
    return ((p[1:-1, :-2] != 0) & (p[1:-1, 2:] != 0)
            & (p[:-2, 1:-1] != 0) & (p[2:, 1:-1] != 0))


def associate(smap_capacity: int,
              index_render: IndexMapRender,
              raw_depth_m: jnp.ndarray,
              filtered_depth_m: jnp.ndarray,
              rgb: jnp.ndarray,
              static_prob: jnp.ndarray,
              pose: jnp.ndarray,
              tick: jnp.ndarray,
              weighting: jnp.ndarray,
              config: SFConfig) -> AssociationResult:
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows, cols = raw_depth_m.shape
    n_pix = rows * cols

    raw = frame_cloud(raw_depth_m, config)
    filt = frame_cloud(filtered_depth_m, config)

    uu = jnp.arange(cols, dtype=jnp.int32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.int32)[:, None]
    t_par = jnp.asarray(tick, jnp.int32) % 2
    active = ((uu % 2 == t_par) & (vv % 2 == t_par)
              & _neighbours_ok(raw_depth_m)
              & (raw_depth_m > 0.0) & (raw_depth_m <= fus.depth_max))

    # Per-pixel ray and lambda (data.vert:133-139).
    xl = (uu + 0.5 - cam.cx) / cam.fx
    yl = (vv + 0.5 - cam.cy) / cam.fy
    xl = jnp.broadcast_to(xl, (rows, cols))
    yl = jnp.broadcast_to(yl, (rows, cols))
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray_len = lam  # |(xl, yl, 1)|

    z_meas = raw_depth_m

    # Gather the 8x8 window of index texels anchored at (4u-2, 4v-2).
    winner = index_render.winner
    rows4, cols4 = winner.shape
    local_pos = index_render.local_pos
    local_nrm = index_render.local_normal

    n_meas = filt.normal

    # All 64 window texels as one batched gather: (rows, cols, 64).
    offs = jnp.arange(8, dtype=jnp.int32)
    win_u = (F * uu - 2)[..., None, None] + offs[None, None, None, :]
    win_v = (F * vv - 2)[..., None, None] + offs[None, None, :, None]
    win_u = jnp.broadcast_to(win_u, (rows, cols, 8, 8)).reshape(rows, cols, 64)
    win_v = jnp.broadcast_to(win_v, (rows, cols, 8, 8)).reshape(rows, cols, 64)
    in_win = ((win_u >= 0) & (win_u < cols4) & (win_v >= 0) & (win_v < rows4))
    su = jnp.clip(win_u, 0, cols4 - 1)
    sv = jnp.clip(win_v, 0, rows4 - 1)
    cand = winner[sv, su]                              # (rows, cols, 64)
    has = in_win & (cand != INVALID)
    safe = jnp.where(has, cand, 0)
    cpos = local_pos[safe]                             # (rows, cols, 64, 3)
    cnrm = local_nrm[safe]
    cz = cpos[..., 2]
    depth_ok = (jnp.abs(cz - z_meas[..., None]) * lam[..., None]
                < fus.assoc_depth_gate)
    # dist = |cross(ray, cpos)| / |ray| (point-to-ray distance).
    rx, ry = xl[..., None], yl[..., None]
    cxp = ry * cpos[..., 2] - cpos[..., 1]
    cyp = cpos[..., 0] - rx * cpos[..., 2]
    czp = rx * cpos[..., 1] - ry * cpos[..., 0]
    dist = jnp.sqrt(cxp ** 2 + cyp ** 2 + czp ** 2) / ray_len[..., None]
    # Normal gate (data.vert:151): grazing surfel or aligned normals.
    cos_angle = jnp.clip(
        jnp.sum(cnrm * n_meas[..., None, :], axis=-1)
        / jnp.maximum(jnp.linalg.norm(cnrm, axis=-1)
                      * jnp.linalg.norm(n_meas, axis=-1)[..., None], 1e-12),
        -1.0, 1.0)
    angle = jnp.arccos(cos_angle)
    norm_ok = ((jnp.abs(cnrm[..., 2]) < fus.assoc_normal_z_gate)
               | (jnp.abs(angle) < fus.assoc_angle_gate))
    ok_cand = has & depth_ok & norm_ok
    dist_m = jnp.where(ok_cand, dist, 1000.0)
    best_k = jnp.argmin(dist_m, axis=-1)
    best_dist = jnp.take_along_axis(dist_m, best_k[..., None], axis=-1)[..., 0]
    best_id = jnp.where(
        best_dist < 1000.0,
        jnp.take_along_axis(cand, best_k[..., None], axis=-1)[..., 0],
        INVALID)

    matched = active & (best_id != INVALID)
    is_new = active & (best_id == INVALID)

    # New-measurement attributes (data.vert:83-106): position from raw depth,
    # normal/radius from filtered depth, conf = min(probStatic, weighting,
    # radialConf).
    R, t = pose[:3, :3], pose[:3, 3]
    world_pos = raw.pos.reshape(-1, 3) @ R.T + t
    world_nrm = filt.normal.reshape(-1, 3) @ R.T
    radial = radial_confidence(rows, cols, cam.cx, cam.cy)
    meas_conf = jnp.minimum(static_prob,
                            jnp.minimum(weighting, radial)).ravel()

    # Deduplicate surfel collisions: smallest pixel index wins.
    pix_ids = jnp.arange(n_pix, dtype=jnp.int32)
    slot = jnp.where(matched.ravel(), best_id.ravel(), 0)
    win_pix, _ = zbuffer_scatter(slot, pix_ids.astype(jnp.float32),
                                 matched.ravel(), smap_capacity)
    has_update = win_pix != INVALID
    src = jnp.where(has_update, win_pix, 0)

    updates = UpdateRecords(
        has_update=has_update,
        pos=world_pos[src],
        conf=meas_conf[src],
        color=rgb.reshape(-1, 3)[src],
        normal=world_nrm[src],
        radius=filt.radius.ravel()[src],
    )

    new_conf = jnp.where(static_prob.ravel() > fus.new_static_prob_gate,
                         fus.new_unstable_conf, 0.0)
    new = NewSurfels(
        is_new=is_new.ravel(),
        pos=world_pos,
        conf=new_conf,
        color=rgb.reshape(-1, 3),
        normal=world_nrm,
        radius=filt.radius.ravel(),
    )
    return AssociationResult(updates=updates, new=new)
