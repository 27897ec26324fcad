"""Surfel-major ("sparse") fuse path for super-resolution index factors.

Reference: `data.vert`/`update.vert`/`copy_unstable.vert` at FACTOR=4
(IndexMap.cpp:21).  The texel-space path (texelmap.py / association.py)
materializes attribute images over the (F*H, F*W) texel grid, so both its
indexed ops and its VPU stencils scale with F^2 * H * W — 16x the camera
grid at the reference FACTOR, which measured 18.8 fps at QVGA (round-2
VERDICT).  This path flips the association loop to run PER SURFEL, keeping
every indexed op O(capacity) or O(pixels) at any factor:

1. The F-resolution z-buffer survives, but only as an (S,) packed-key
   buffer: one O(capacity) scatter-min + one O(capacity) winner gather.
   No attribute image is ever materialized at texel scale.
2. Window-search inversion: the association window of pixel u covers
   texels [F*u - w, F*u + w + F - 1] per axis with w = F//2
   (data.vert:128-160 — the 16x16 half-texel sampling at F=4 touches
   exactly [4u-2, 4u+5]).  Texel t therefore lies in the windows of the
   pixels u in [floor((t-w)/F), floor((t+w)/F)] — at even F always two
   consecutive pixels per axis, exactly ONE of which is checkerboard-active
   this frame (u%2 == v%2 == tick%2, data.vert:115).  So every
   texel-winning surfel has a UNIQUE candidate pixel: it gathers that
   pixel's measurement (one stacked O(capacity) gather), applies the
   data.vert gates (ray-depth, point-to-ray distance, normal), and
   competes for the pixel with a packed (quantized-distance << id_bits|id)
   scatter-min — one more O(capacity) scatter.  Ties inside one distance
   quantum resolve to the smaller surfel id (the GLSL's scan order is
   raster/submission-dependent, so any deterministic rule is within spec).
3. Each winning surfel matches at most one pixel, so update records route
   pixel -> slot with no collisions and merge elementwise in slot space
   (`fusion.update.apply_updates` — the update.vert math).
4. The clean window test and the prediction splat run on a CAMERA-RES
   render of the post-merge map: the reference's combinedPredict renders at
   camera resolution too (IndexMap.cpp:221-303), and the copy_unstable
   window reach of +-1 px maps to the +-1 texel stencil of
   `clean.window_kill_tex` at factor 1 (sub-pixel neighbor multiplicity is
   approximated at pixel granularity; accuracy for the full config is
   pinned by the adversarial suite, ACCURACY.md).

Net asymptotics at F=4: O(capacity + H*W) indexed elements per fuse — the
same as F=1 — instead of O(16 * H * W).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.association import (NewSurfels, UpdateRecords,
                                                 _neighbours_ok, _new_surfels,
                                                 active_subgrid)
from staticfusion_tpu.fusion.surfels import (SurfelMap, frame_cloud,
                                             radial_confidence)
from staticfusion_tpu.fusion.texelmap import (INT_MAX, PACKED_MAX_ID_BITS,
                                              SurfelsLocal, id_bits_for,
                                              project_surfels, render_cull)
from staticfusion_tpu.ops.zbuffer import INVALID

# Point-to-ray distances of window candidates are geometrically bounded by
# the window reach: at F=4/QVGA the farthest texel is ~1.5 px off the pixel
# ray, i.e. <= depth_max * 1.5 / fx ~ 0.026 m.  0.1 m of quantization range
# leaves 4x headroom; with >= 10 distance bits (id_bits <= 21) a quantum is
# <= 0.1 mm, far below the geometry noise the search discriminates.
DIST_CAP = 0.1


def camera_res_config(config: SFConfig) -> SFConfig:
    """The same config with index_factor pinned to 1 (for the camera-res
    render the prediction splat and clean stencil run on)."""
    if config.fusion.index_factor == 1:
        return config
    return config.replace(
        fusion=dataclasses.replace(config.fusion, index_factor=1))


def post_factor_config(config: SFConfig) -> SFConfig:
    """Config for the post-merge render (clean window test + prediction
    splat): `post_factor` texels per pixel — 0 means full index_factor
    fidelity (the reference refreshes its FACTOR=4 index map before clean,
    Reconstruction.cpp:300, and its copy_unstable window discriminates
    sub-pixel neighbors), 1 means camera resolution (cheapest; measured
    accuracy trade in ACCURACY.md)."""
    P = config.fusion.post_factor or config.fusion.index_factor
    if P == config.fusion.index_factor:
        return config
    return config.replace(
        fusion=dataclasses.replace(config.fusion, index_factor=P))


def supports_sparse(config: SFConfig) -> bool:
    """Even super-resolution factors have the unique-active-candidate-pixel
    property (module docstring); F=1 keeps the texel path (its grid is
    already camera-sized), odd F>1 is not used by any preset."""
    F = config.fusion.index_factor
    return F > 1 and F % 2 == 0


def zbuffer_winners(smap: SurfelMap, local: SurfelsLocal, tick: jnp.ndarray,
                    config: SFConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ok, is_winner): render-cull mask and per-surfel z-buffer verdict on
    the F-resolution texel grid (index_map.vert semantics), without
    materializing any texel-scale attribute image.

    Packed (quantized depth << id_bits | id) keys up to id_bits <= 21, the
    exact two-pass float32 ordering above (same scheme and tie rules as
    texelmap.render_texel_images)."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows4, cols4 = cam.height * F, cam.width * F
    S = rows4 * cols4
    ib = id_bits_for(smap.capacity)

    z = local.pos[:, 2]
    ok = render_cull(smap, local, tick, config)
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    flat = jnp.where(ok, local.v4 * cols4 + local.u4, S)

    if ib <= PACKED_MAX_ID_BITS:
        dlevels = (1 << (31 - ib)) - 1
        qd = jnp.clip((z * (dlevels / fus.depth_max)).astype(jnp.int32),
                      0, dlevels)
        key = (qd << ib) | ids
        fb = jnp.full((S,), INT_MAX, jnp.int32).at[flat].min(key, mode="drop")
        win_key = fb.at[flat].get(mode="fill", fill_value=INT_MAX)
        is_winner = ok & (win_key == key)
    else:
        zq = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.int32)
        zbuf = jnp.full((S,), INT_MAX, jnp.int32).at[flat].min(
            zq, mode="drop")
        win_z = zbuf.at[flat].get(mode="fill", fill_value=INT_MAX)
        flat2 = jnp.where(ok & (zq == win_z), flat, S)
        fb = jnp.full((S,), INT_MAX, jnp.int32).at[flat2].min(
            ids, mode="drop")
        win_id = fb.at[flat].get(mode="fill", fill_value=INT_MAX)
        is_winner = ok & (win_id == ids)
    return ok, is_winner


def candidate_pixel(t: jnp.ndarray, t_par: jnp.ndarray, F: int,
                    limit: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(coord, valid): the unique checkerboard-active pixel (per axis) whose
    association window contains texel `t`.

    Derivation (module docstring): t lies in window(u) iff
    u in [ceil((t-w-F+1)/F), floor((t+w)/F)] = [floor((t-w)/F),
    floor((t+w)/F)], an interval of 2 - 1/F pixels that at even F always
    holds exactly two consecutive integers — one per parity."""
    w = F // 2
    lo = (t - w) // F
    hi = (t + w) // F
    act = lo + ((lo % 2) != t_par).astype(jnp.int32)
    return act, (act <= hi) & (act >= 0) & (act < limit)


class SparseAssoc(NamedTuple):
    updates: UpdateRecords
    new: NewSurfels
    best_id: jnp.ndarray   # (H, W) int32 winner per pixel, INVALID if none
    matched: jnp.ndarray   # (H, W) bool
    active: jnp.ndarray    # (H, W) bool
    is_winner: jnp.ndarray  # (capacity,) pre-merge z-buffer winners
    flat: jnp.ndarray      # (capacity,) pre-merge flat texel index (S=cull)


def associate_sparse(smap: SurfelMap,
                     local: SurfelsLocal,
                     raw_depth_m: jnp.ndarray,
                     filtered_depth_m: jnp.ndarray,
                     rgb: jnp.ndarray,
                     static_prob: jnp.ndarray,
                     pose: jnp.ndarray,
                     tick: jnp.ndarray,
                     weighting: jnp.ndarray,
                     config: SFConfig) -> SparseAssoc:
    """The data.vert association, surfel-major (module docstring)."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows, cols = raw_depth_m.shape
    n_pix = rows * cols
    ib = id_bits_for(smap.capacity)
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    t_par = jnp.asarray(tick, jnp.int32) % 2

    raw = frame_cloud(raw_depth_m, config)
    filt = frame_cloud(filtered_depth_m, config)

    # Pixel-side active mask (data.vert:115-124).
    uu = jnp.arange(cols, dtype=jnp.int32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.int32)[:, None]
    active = ((uu % 2 == t_par) & (vv % 2 == t_par)
              & _neighbours_ok(raw_depth_m)
              & (raw_depth_m > 0.0) & (raw_depth_m <= fus.depth_max))

    # --- per-surfel z-buffer + candidate pixel ---
    ok, is_win = zbuffer_winners(smap, local, tick, config)
    u_act, u_ok = candidate_pixel(local.u4, t_par, F, cols)
    v_act, v_ok = candidate_pixel(local.v4, t_par, F, rows)
    pix_ok = is_win & u_ok & v_ok
    pflat = jnp.clip(v_act * cols + u_act, 0, n_pix - 1)

    # ONE stacked measurement gather (cost follows the index count, not the
    # row count): measured depth, active mask, measured normal.
    meas = jnp.stack([
        raw_depth_m, active.astype(jnp.float32),
        filt.normal[..., 0], filt.normal[..., 1], filt.normal[..., 2],
    ]).reshape(5, n_pix)
    g = meas[:, pflat]
    z_meas = g[0]
    act_g = g[1] > 0.0
    nmx, nmy, nmz = g[2], g[3], g[4]

    # data.vert:133-160 gates, evaluated per surfel against its pixel.
    xl = (u_act.astype(jnp.float32) + 0.5 - cam.cx) / cam.fx
    yl = (v_act.astype(jnp.float32) + 0.5 - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    cx_, cy_, cz = local.pos[:, 0], local.pos[:, 1], local.pos[:, 2]
    cnx, cny, cnz = local.normal[:, 0], local.normal[:, 1], local.normal[:, 2]
    depth_ok = jnp.abs(cz - z_meas) * lam < fus.assoc_depth_gate
    cxp = yl * cz - cy_
    cyp = cx_ - xl * cz
    czp = xl * cy_ - yl * cx_
    dist = jnp.sqrt(cxp ** 2 + cyp ** 2 + czp ** 2) / lam
    n_meas_norm = jnp.sqrt(nmx * nmx + nmy * nmy + nmz * nmz)
    cdot = cnx * nmx + cny * nmy + cnz * nmz
    cnorm = jnp.sqrt(cnx ** 2 + cny ** 2 + cnz ** 2)
    cos_angle = jnp.clip(
        cdot / jnp.maximum(cnorm * n_meas_norm, 1e-12), -1.0, 1.0)
    norm_ok = ((jnp.abs(cnz) < fus.assoc_normal_z_gate)
               | (jnp.abs(jnp.arccos(cos_angle)) < fus.assoc_angle_gate))
    cand = pix_ok & act_g & depth_ok & norm_ok

    # --- best candidate per pixel: packed (quantized dist, id) scatter-min
    # (exact two-pass float ordering above the packed id range). ---
    tgt = jnp.where(cand, pflat, n_pix)
    if ib <= PACKED_MAX_ID_BITS:
        dlevels = (1 << (31 - ib)) - 1
        qdist = jnp.clip((dist * (dlevels / DIST_CAP)).astype(jnp.int32),
                         0, dlevels)
        key = (qdist << ib) | ids
        pbuf = jnp.full((n_pix,), INT_MAX, jnp.int32).at[tgt].min(
            key, mode="drop")
        got = pbuf != INT_MAX
        best_flat = jnp.where(got, pbuf & ((1 << ib) - 1), INVALID)
    else:
        dq = jax.lax.bitcast_convert_type(dist.astype(jnp.float32), jnp.int32)
        dbuf = jnp.full((n_pix,), INT_MAX, jnp.int32).at[tgt].min(
            dq, mode="drop")
        win_d = dbuf.at[tgt].get(mode="fill", fill_value=INT_MAX)
        tgt2 = jnp.where(cand & (dq == win_d), tgt, n_pix)
        pbuf = jnp.full((n_pix,), INT_MAX, jnp.int32).at[tgt2].min(
            ids, mode="drop")
        best_flat = jnp.where(pbuf != INT_MAX, pbuf, INVALID)

    best_id = best_flat.reshape(rows, cols)
    matched = active & (best_id != INVALID)
    is_new = active & (best_id == INVALID)

    # --- update records, pixel -> slot (no collisions: each winning surfel
    # has a unique candidate pixel, so each slot receives at most one row)
    # --- data.vert:83-106 payload, compacted to the active quarter.
    radial = radial_confidence(rows, cols, cam.cx, cam.cy)
    meas_conf = jnp.minimum(static_prob, jnp.minimum(weighting, radial))
    R, t = pose[:3, :3], pose[:3, 3]
    sub = lambda a: active_subgrid(a, t_par)
    world_pos = sub(raw.pos).reshape(-1, 3) @ R.T + t
    world_nrm = sub(filt.normal).reshape(-1, 3) @ R.T
    matched_sub = sub(matched).ravel()
    slot = jnp.where(matched_sub, sub(best_id).ravel(), smap.capacity)
    n_sub = matched_sub.shape[0]
    payload = jnp.concatenate([
        world_pos, sub(meas_conf).ravel()[:, None],
        sub(rgb).reshape(-1, 3), world_nrm,
        sub(filt.radius).ravel()[:, None], jnp.ones((n_sub, 1)),
    ], axis=1)
    rec = jnp.zeros((smap.capacity, payload.shape[1]),
                    payload.dtype).at[slot].set(payload, mode="drop")

    updates = UpdateRecords(
        has_update=rec[:, 11] > 0.0,
        pos=rec[:, 0:3],
        conf=rec[:, 3],
        color=rec[:, 4:7],
        normal=rec[:, 7:10],
        radius=rec[:, 10],
    )
    new = _new_surfels(raw, filt, is_new, rgb, static_prob, pose, t_par,
                       config)
    S_tex = (cam.height * F) * (cam.width * F)
    flat = jnp.where(ok, local.v4 * (cam.width * F) + local.u4, S_tex)
    return SparseAssoc(updates=updates, new=new, best_id=best_id,
                       matched=matched, active=active, is_winner=is_win,
                       flat=flat)


def materialize_from_winners(smap: SurfelMap, local: SurfelsLocal,
                             won: jnp.ndarray, flat: jnp.ndarray,
                             config: SFConfig):
    """Texel attribute images of `smap` (post-merge) on the F grid, reusing
    a PRE-merge winner set — skips the second z-buffer scatter+gather of a
    full re-render (the reference re-renders before clean,
    Reconstruction.cpp:300; the merge moves winners by <= mm, so z-order
    flips between the pre- and post-merge renders are rare and within the
    GL raster nondeterminism the reference tolerates).  ONE wide
    O(capacity) row-scatter; same capacity-bound scheme as
    texelmap.render_texel_images' scatter branch."""
    from staticfusion_tpu.fusion.texelmap import TexelImages

    cam = config.camera
    F = config.fusion.index_factor
    rows4, cols4 = cam.height * F, cam.width * F
    S = rows4 * cols4
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)

    tgt = jnp.where(won, flat, S)
    ids_f = jax.lax.bitcast_convert_type(ids, jnp.float32)
    payload = jnp.concatenate([
        local.pos, local.normal,
        smap.radius[:, None], smap.conf[:, None],
        smap.init_time[:, None], smap.last_time[:, None],
        smap.color, smap.hist[:, None],
        ids_f[:, None], jnp.ones((smap.capacity, 1)),
    ], axis=1)
    out = jnp.zeros((S, 16), jnp.float32).at[tgt].set(payload, mode="drop")

    def I(col):
        return out[:, col].reshape(rows4, cols4)

    has = I(15) > 0.0
    idx = jnp.where(has, jax.lax.bitcast_convert_type(out[:, 14], jnp.int32)
                    .reshape(rows4, cols4), INT_MAX)
    return TexelImages(
        idx=idx, has=has,
        x=I(0), y=I(1), z=I(2),
        nx=I(3), ny=I(4), nz=I(5),
        radius=I(6), conf=I(7),
        init_time=I(8), last_time=I(9),
        r=I(10), g=I(11), b=I(12),
        hist=I(13),
    )


def lifecycle_and_insert(smap: SurfelMap,
                         killed: jnp.ndarray,
                         new: NewSurfels,
                         tick: jnp.ndarray,
                         config: SFConfig) -> SurfelMap:
    """Elementwise surfel lifecycle (copy_unstable.vert:118-124) + the
    window-kill verdicts + the new-unstable append at the high-water mark —
    the slot-space tail of the sparse fuse (the texel path's
    writeback_and_insert minus the texel write-back rows, which the sparse
    path does not need: the merge already happened in slot space)."""
    fus = config.fusion
    tickf = jnp.asarray(tick, jnp.float32)

    keep = smap.valid & ~killed
    too_old_unstable = ((tickf - smap.last_time) > fus.clean_unstable_age) & \
                       (smap.conf < fus.clean_unstable_conf)
    keep = keep & ~(too_old_unstable | (smap.conf == 0.0))
    stale_stable = (smap.last_time > 0) & \
                   ((tickf - smap.last_time) > fus.time_delta)
    keep = (keep | (smap.valid & stale_stable)) & smap.valid

    max_new = new.is_new.shape[0]
    rank = jnp.cumsum(new.is_new.astype(jnp.int32)) - 1
    slot = smap.used + rank
    ins = new.is_new & (slot < smap.capacity)
    tgt_ins = jnp.where(ins, slot, smap.capacity)
    n_new = jnp.where(max_new > 0, rank[-1] + 1, 0)
    used = jnp.minimum(smap.capacity, smap.used + n_new).astype(jnp.int32)

    col = lambda a: a[:, None]
    tick_col = jnp.full((max_new, 1), tickf)
    payload_ins = jnp.concatenate([
        new.pos, col(new.conf), new.color, jnp.ones((max_new, 1)),
        tick_col, tick_col, new.normal, col(new.radius),
        col(ins.astype(jnp.float32))], axis=1)
    base = jnp.concatenate([
        smap.pos, col(smap.conf), smap.color, col(smap.hist),
        col(smap.init_time), col(smap.last_time), smap.normal,
        col(smap.radius), col(keep.astype(jnp.float32))], axis=1)
    out = base.at[tgt_ins].set(payload_ins, mode="drop")

    return SurfelMap(
        pos=out[:, 0:3], conf=out[:, 3], color=out[:, 4:7],
        hist=out[:, 7], init_time=out[:, 8], last_time=out[:, 9],
        normal=out[:, 10:13], radius=out[:, 13],
        valid=out[:, 14] > 0.5,
        used=used,
    )
