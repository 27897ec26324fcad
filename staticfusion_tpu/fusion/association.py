"""Fusion pass 1: per-pixel data association against the 4x texel images.

Reference: `data.vert` (+ data.geom/frag) — for active pixels (checkerboard
in time), search a window of index-map texels for the best matching surfel:
ray-depth gate |lambda*(z_model - z_meas)| < 0.05, minimal point-to-ray
distance, normal gate (|n_z| < 0.75 or angle < 0.5 rad).  Matched pixels emit
an update record at the surfel's slot; unmatched become new unstable surfels
(conf 0.08 iff probStatic > 0.5 else 0; data.vert:171-180).

Window geometry: the GLSL samples 16x16 half-texel steps around the pixel
center with nearest filtering, which at FACTOR=4 touches exactly the 8x8
index texels [4u-2, 4u+5] x [4v-2, 4v+5] (each twice — harmless for a
best-distance search).  `texelmap.window_offsets` generalizes that reach to
any index factor (3x3 pixels at the default factor 1).  Because camera
pixels form a regular grid, each window offset is a *shifted slice* of the
texel images (texelmap.py) — no gathers at all in the search loop.

Collision resolution: two active pixels can match the same surfel.  GL
resolves by raster order; we dedupe deterministically — the pixel with the
smallest flat index wins (a zbuffer_scatter keyed by pixel index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import (frame_cloud, radial_confidence)
from staticfusion_tpu.fusion.texelmap import (TexelImages, phase_decompose,
                                              phase_window, window_offsets)
from staticfusion_tpu.ops.zbuffer import INVALID


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


class TexelUpdates(NamedTuple):
    """Update records routed to the winning surfel's *texel* instead of its
    slot (all (Ht, Wt) images).  Positions/normals stay in the camera frame —
    the affine merge commutes with the rigid transform, so the blend happens
    in local space and only the final write-back converts to world.

    Collisions (two active pixels matching the same surfel) are averaged via
    an add-combine scatter; the reference resolves them by GL raster order
    (submission-dependent), so any deterministic choice is within spec."""
    has: jnp.ndarray      # bool — texel received >= 1 update record
    pos: jnp.ndarray      # (Ht, Wt, 3) local measurement position
    conf: jnp.ndarray     # measurement confidence `a`
    color: jnp.ndarray    # (Ht, Wt, 3)
    normal: jnp.ndarray   # (Ht, Wt, 3) local
    radius: jnp.ndarray


def _neighbours_ok(depth: jnp.ndarray) -> jnp.ndarray:
    """4-neighbors nonzero (data.vert checkNeighbours), zero-padded."""
    p = jnp.pad(depth, 1)
    return ((p[1:-1, :-2] != 0) & (p[1:-1, 2:] != 0)
            & (p[:-2, 1:-1] != 0) & (p[2:, 1:-1] != 0))


def active_subgrid(img: jnp.ndarray, t_par: jnp.ndarray) -> jnp.ndarray:
    """(H, W[, C]) -> (H//2, W//2[, C]): the checkerboard-active pixels
    (u%2 == v%2 == tick%2, data.vert:124).  Only these pixels can emit
    update records or new surfels, so compacting scatter sources to this
    subgrid cuts row-scatter cost 4x (TPU row scatters cost ~13 ns/row
    regardless of drop-mode; the profiled association/writeback scatters
    were the two hottest ops of the fuse)."""
    rows, cols = img.shape[:2]
    start = (t_par, t_par) + (0,) * (img.ndim - 2)
    size = (rows - 1, cols - 1) + img.shape[2:]
    sub = jax.lax.dynamic_slice(img, start, size)
    return sub[::2, ::2]


def expand_subgrid(sub: jnp.ndarray, rows: int, cols: int,
                   t_par: jnp.ndarray) -> jnp.ndarray:
    """Inverse of active_subgrid: place (H//2, W//2) values back at the
    active pixels of an (rows, cols) image, zero elsewhere.  Scatter-free:
    2x2 nearest upsample + phase mask (the upsampled value at any phase of
    a 2x2 block is the same subgrid value)."""
    up = jnp.repeat(jnp.repeat(sub, 2, axis=0), 2, axis=1)
    uu = jnp.arange(cols, dtype=jnp.int32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.int32)[:, None]
    mask = (uu % 2 == t_par) & (vv % 2 == t_par)
    return jnp.where(mask, up, jnp.zeros_like(up))


class _Search(NamedTuple):
    active: jnp.ndarray    # (H, W) bool — checkerboard-in-time active pixels
    best_id: jnp.ndarray   # (H, W) int32 winning surfel id, INVALID if none
    best_dv: jnp.ndarray   # (H, W) int32 winning window offset (texel units)
    best_du: jnp.ndarray
    raw: object            # frame_cloud of the raw depth
    filt: object           # frame_cloud of the filtered depth
    meas_conf: jnp.ndarray  # (H*W,) min(probStatic, weighting, radialConf)


def _window_search(tex: TexelImages,
                   raw_depth_m: jnp.ndarray,
                   filtered_depth_m: jnp.ndarray,
                   static_prob: jnp.ndarray,
                   tick: jnp.ndarray,
                   weighting: jnp.ndarray,
                   config: SFConfig) -> _Search:
    """The data.vert association search, shared by both routing modes."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows, cols = raw_depth_m.shape

    raw = frame_cloud(raw_depth_m, config)
    filt = frame_cloud(filtered_depth_m, config)

    uu = jnp.arange(cols, dtype=jnp.int32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.int32)[:, None]
    t_par = jnp.asarray(tick, jnp.int32) % 2
    active = ((uu % 2 == t_par) & (vv % 2 == t_par)
              & _neighbours_ok(raw_depth_m)
              & (raw_depth_m > 0.0) & (raw_depth_m <= fus.depth_max))

    # Per-pixel ray and lambda (data.vert:133-139).
    xl = jnp.broadcast_to((uu + 0.5 - cam.cx) / cam.fx, (rows, cols))
    yl = jnp.broadcast_to((vv + 0.5 - cam.cy) / cam.fy, (rows, cols))
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    z_meas = raw_depth_m
    n_meas = filt.normal
    n_meas_norm = jnp.linalg.norm(n_meas, axis=-1)

    # Window search over the 8x8 texels [4u-2, 4u+5]: phase-decomposed
    # shifts (texelmap.phase_window), all candidates stacked on a leading
    # axis so the gate math is one fused pass and the winner an argmin
    # (the per-offset where-chain built a window^2-deep serial dependency).
    names = ("has", "x", "y", "z", "nx", "ny", "nz", "idx")
    ph = {name: phase_decompose(
        getattr(tex, name).astype(jnp.float32) if name == "has"
        else getattr(tex, name), F)
        for name in names}
    offs = [(dv, du) for du in window_offsets(F)
            for dv in window_offsets(F)]  # the GLSL's x-major scan order
    C = {name: jnp.stack([phase_window(ph[name], dv, du, F)
                          for dv, du in offs]) for name in names}

    has = C["has"] > 0
    cx_, cy_, cz = C["x"], C["y"], C["z"]
    cnx, cny, cnz = C["nx"], C["ny"], C["nz"]
    depth_ok = jnp.abs(cz - z_meas[None]) * lam[None] < fus.assoc_depth_gate
    # point-to-ray distance |cross(ray, c)| / |ray|
    cxp = yl[None] * cz - cy_
    cyp = cx_ - xl[None] * cz
    czp = xl[None] * cy_ - yl[None] * cx_
    dist = jnp.sqrt(cxp ** 2 + cyp ** 2 + czp ** 2) / lam[None]
    cdot = (cnx * n_meas[None, ..., 0] + cny * n_meas[None, ..., 1]
            + cnz * n_meas[None, ..., 2])
    cnorm = jnp.sqrt(cnx ** 2 + cny ** 2 + cnz ** 2)
    cos_angle = jnp.clip(
        cdot / jnp.maximum(cnorm * n_meas_norm[None], 1e-12), -1.0, 1.0)
    norm_ok = ((jnp.abs(cnz) < fus.assoc_normal_z_gate)
               | (jnp.abs(jnp.arccos(cos_angle)) < fus.assoc_angle_gate))
    ok = has & depth_ok & norm_ok & (dist < 1000.0)
    dz = jnp.where(ok, dist, jnp.inf)
    bi = jnp.argmin(dz, axis=0)              # first-in-scan-order on ties
    found = jnp.isfinite(jnp.min(dz, axis=0))
    onehot = jnp.arange(len(offs))[:, None, None] == bi[None]

    def select(arr, empty):
        return jnp.where(found,
                         jnp.sum(jnp.where(onehot, arr, 0), axis=0), empty)

    best_id = select(C["idx"].astype(jnp.int32), INVALID)
    dvs = jnp.asarray([o[0] for o in offs], jnp.int32)[:, None, None]
    dus = jnp.asarray([o[1] for o in offs], jnp.int32)[:, None, None]
    best_dv = select(jnp.broadcast_to(dvs, onehot.shape), 0)
    best_du = select(jnp.broadcast_to(dus, onehot.shape), 0)

    radial = radial_confidence(rows, cols, cam.cx, cam.cy)
    meas_conf = jnp.minimum(static_prob,
                            jnp.minimum(weighting, radial)).ravel()
    return _Search(active=active, best_id=best_id, best_dv=best_dv,
                   best_du=best_du, raw=raw, filt=filt, meas_conf=meas_conf)


def _new_surfels(raw, filt, is_new: jnp.ndarray, rgb: jnp.ndarray,
                 static_prob: jnp.ndarray, pose: jnp.ndarray, t_par,
                 config: SFConfig) -> NewSurfels:
    """New-measurement attributes (data.vert:83-106): position from the raw
    frame cloud, normal/radius from the filtered one, new-unstable conf 0.08
    iff probStatic > 0.5 (data.vert:171-180).

    Arrays are compacted to the checkerboard-active subgrid (is_new is a
    subset of `active`), in the same row-major order as the full grid, so
    insert slot assignment is unchanged while the insert scatter carries
    4x fewer rows."""
    fus = config.fusion
    R, t = pose[:3, :3], pose[:3, 3]
    sub = lambda a: active_subgrid(a, t_par)
    world_pos = sub(raw.pos).reshape(-1, 3) @ R.T + t
    world_nrm = sub(filt.normal).reshape(-1, 3) @ R.T
    new_conf = jnp.where(
        sub(static_prob).ravel() > fus.new_static_prob_gate,
        fus.new_unstable_conf, 0.0)
    return NewSurfels(
        is_new=sub(is_new).ravel(),
        pos=world_pos,
        conf=new_conf,
        color=sub(rgb).reshape(-1, 3),
        normal=world_nrm,
        radius=sub(filt.radius).ravel(),
    )


def associate_texels(tex: TexelImages,
                     raw_depth_m: jnp.ndarray,
                     filtered_depth_m: jnp.ndarray,
                     rgb: jnp.ndarray,
                     static_prob: jnp.ndarray,
                     pose: jnp.ndarray,
                     tick: jnp.ndarray,
                     weighting: jnp.ndarray,
                     config: SFConfig):
    """Association with update records routed to the winner's *texel*.

    One add-combine scatter (12-wide: 11 payload fields + a count) replaces
    the slot-space path's dedupe min-scatter + winner gather + set-scatter —
    colliding pixels average instead of 'smallest pixel wins'.  Returns
    (TexelUpdates, NewSurfels)."""
    fus = config.fusion
    F = fus.index_factor
    rows, cols = raw_depth_m.shape
    rows4, cols4 = rows * F, cols * F
    S_tex = rows4 * cols4

    s = _window_search(tex, raw_depth_m, filtered_depth_m, static_prob,
                       tick, weighting, config)
    matched = s.active & (s.best_id != INVALID)
    is_new = s.active & (s.best_id == INVALID)

    del S_tex
    t_par = jnp.asarray(tick, jnp.int32) % 2
    meas_conf_img = s.meas_conf.reshape(rows, cols)

    # Dense offset-decomposed accumulation — NO scatter: a record from
    # pixel (v,u) matched at window offset (dv,du) lands on texel
    # (F*v+dv, F*u+du), so for each offset the contributing records form a
    # masked image whose targets are a strided lattice: a phase bucket
    # (dv%F, du%F) plus a +-1-pixel block shift.  The row scatter this
    # replaces paid a whole-(8,128)-tile read-modify-write per row
    # (~5 ms at VGA for this one op); these are pure shifted VPU adds.
    # Collisions (two pixels matching surfels in the same texel) still sum
    # exactly like the scatter-add did.
    payload = jnp.stack([
        s.raw.pos[..., 0], s.raw.pos[..., 1], s.raw.pos[..., 2],
        meas_conf_img,
        rgb[..., 0], rgb[..., 1], rgb[..., 2],
        s.filt.normal[..., 0], s.filt.normal[..., 1], s.filt.normal[..., 2],
        s.filt.radius, jnp.ones((rows, cols)),
    ])                                                     # (12, H, W)

    acc = [[None] * F for _ in range(F)]
    for dv in window_offsets(F):
        for du in window_offsets(F):
            m = matched & (s.best_dv == dv) & (s.best_du == du)
            contrib = jnp.where(m[None], payload, 0.0)
            sv, bv = dv % F, dv // F
            su, bu = du % F, du // F
            if bv or bu:
                a = max(abs(bv), abs(bu))
                p = jnp.pad(contrib, ((0, 0), (a, a), (a, a)))
                contrib = p[:, a - bv:a - bv + rows, a - bu:a - bu + cols]
            acc[sv][su] = (contrib if acc[sv][su] is None
                           else acc[sv][su] + contrib)
    # Compose phases -> the (rows4, cols4) texel grid (inverse of
    # texelmap.phase_decompose).
    ph = jnp.stack([jnp.stack(r) for r in acc])            # (F, F, 12, H, W)
    rec = ph.transpose(2, 3, 0, 4, 1).reshape(12, rows4, cols4)

    cnt = rec[11]
    has = cnt > 0.0
    inv = jnp.where(has, 1.0 / jnp.where(has, cnt, 1.0), 0.0)
    avg = rec[:11] * inv[None]

    def img(i):
        return avg[i]

    def img3(i):
        return jnp.stack([avg[i], avg[i + 1], avg[i + 2]], axis=-1)

    upd = TexelUpdates(
        has=has.reshape(rows4, cols4),
        pos=img3(0), conf=img(3), color=img3(4), normal=img3(7),
        radius=img(10),
    )
    new = _new_surfels(s.raw, s.filt, is_new, rgb, static_prob, pose, t_par,
                       config)
    return upd, new


def associate(smap_capacity: int,
              tex: TexelImages,
              raw_depth_m: jnp.ndarray,
              filtered_depth_m: jnp.ndarray,
              rgb: jnp.ndarray,
              static_prob: jnp.ndarray,
              pose: jnp.ndarray,
              tick: jnp.ndarray,
              weighting: jnp.ndarray,
              config: SFConfig) -> AssociationResult:
    """Slot-routed association (the reference-exact 'smallest pixel wins'
    dedupe).  The production pipeline uses `associate_texels`; this path is
    kept for component tests and reference-parity checks."""
    rows, cols = raw_depth_m.shape
    n_pix = rows * cols

    s = _window_search(tex, raw_depth_m, filtered_depth_m, static_prob,
                       tick, weighting, config)
    active, best_id = s.active, s.best_id
    raw, filt, meas_conf = s.raw, s.filt, s.meas_conf

    matched = active & (best_id != INVALID)
    is_new = active & (best_id == INVALID)

    R, t = pose[:3, :3], pose[:3, 3]
    world_pos = raw.pos.reshape(-1, 3) @ R.T + t
    world_nrm = filt.normal.reshape(-1, 3) @ R.T

    # Deduplicate surfel collisions: smallest pixel index wins — one
    # min-scatter of pixel ids into the slot grid.  Update records are then
    # *scattered* pixel->slot (fast on TPU) rather than gathered slot->pixel
    # (capacity-sized gathers serialize).
    pix_ids = jnp.arange(n_pix, dtype=jnp.int32)
    # Unmatched pixels get the out-of-bounds index `capacity` and are
    # dropped by the scatter (cheaper than a sacrificial duplicate slot).
    slot = jnp.where(matched.ravel(), best_id.ravel(), smap_capacity)
    win_pix = jnp.full((smap_capacity,), INVALID, jnp.int32).at[slot].min(
        pix_ids, mode="drop")
    has_update = win_pix != INVALID
    # Out-of-bounds gather clips to the last slot — harmless, the result is
    # only consulted where `matched` holds (slot < capacity there).
    wp_at_pix = win_pix[jnp.minimum(slot, smap_capacity - 1)]
    is_winner_pix = matched.ravel() & (wp_at_pix == pix_ids)
    tgt = jnp.where(is_winner_pix, slot, smap_capacity)  # drop non-winners

    # ONE wide row-scatter for all 11 update fields (scatter cost follows
    # the index count, not the row width — microbench_scatter.py).
    payload = jnp.concatenate([
        world_pos, meas_conf[:, None], rgb.reshape(-1, 3), world_nrm,
        filt.radius.reshape(-1, 1)], axis=1)
    rec = jnp.zeros((smap_capacity, payload.shape[1]),
                    payload.dtype).at[tgt].set(payload, mode="drop")

    updates = UpdateRecords(
        has_update=has_update,
        pos=rec[:, 0:3],
        conf=rec[:, 3],
        color=rec[:, 4:7],
        normal=rec[:, 7:10],
        radius=rec[:, 10],
    )

    new = _new_surfels(s.raw, s.filt, is_new, rgb, static_prob, pose,
                       jnp.asarray(tick, jnp.int32) % 2, config)
    return AssociationResult(updates=updates, new=new)
