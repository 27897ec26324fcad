"""Fusion pass 3: map cleaning — redundancy/free-space culling and the
unstable-surfel lifecycle, plus free-slot allocation of new surfels.

Reference: `copy_unstable.vert/.geom` + the clean pass orchestration
(GlobalModel.cpp:491-601).  The GL version stream-compacts survivors into the
other half of a double-buffered VBO and appends the new-unstable transform
feedback, with a primitive-count query maintaining `count`.

TPU design:
* The 16x16 half-texel window test becomes a (2F+1)^2 *stencil over the
  texel attribute images* (F = index_factor; the sample reach is ±1 px =
  ±F texels): a surfel projects to exactly one texel, and for every texel
  whose winner is the surfel under test the whole check is shifted-image
  arithmetic — zero gathers.  The GLSL's duplicate-sample multiplicities
  are reproduced from the projection's fractional texel coordinate.
* Surfels that lost their texel's z-test (occluded this frame) skip the
  window check.  The reference checks them too, but its kill conditions
  (older confident surfel *behind*, free-space violator *behind*) target
  front-most surfels — the texel winners — so occluded duplicates are culled
  when they resurface.  Cheap age/confidence kills still apply to everyone.
* Survivor selection is a dense boolean mask update; new surfels scatter
  into the first free slots (static-size `jnp.nonzero`).
"""

from __future__ import annotations

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.association import NewSurfels
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.fusion.texelmap import SurfelsLocal, TexelImages


def _axis_weight(off: int, frac: jnp.ndarray, F: int) -> jnp.ndarray:
    """How many of the 16 samples land on texel (own + off), given the
    projection's fractional texel coordinate `frac` in [0,1).

    The GLSL takes 16 samples spanning ±1 px (= ±F texels) around the
    continuous projection: sample k (k=0..15) sits at F·x − F + k·F/8, i.e.
    hits texel own+off for k in
    [(off − frac + F)·8/F, (off + 1 − frac + F)·8/F) ∩ [0,16).
    At F=4 this reduces to the reference's half-texel stepping
    (copy_unstable.vert:66-124)."""
    s = 8.0 / F
    lo = jnp.ceil(jnp.maximum(s * (off - frac + F), 0.0))
    hi = jnp.ceil(jnp.minimum(s * (off + 1 - frac + F), 16.0))
    return jnp.maximum(hi - lo, 0.0)


def window_kill_tex(tex: TexelImages, tick: jnp.ndarray,
                    config: SFConfig) -> jnp.ndarray:
    """(Ht, Wt) bool — texels whose winner the copy_unstable window test
    kills.  Pure stencil arithmetic over the texel attribute images; the
    caller folds the verdict into the surfel write-back."""
    fus = config.fusion
    tickf = jnp.asarray(tick, jnp.float32)
    F = fus.index_factor
    R = F  # the ±1 px sample reach is ±F texels

    # Self attributes per texel (= winner's).
    self_has = tex.has
    self_z = tex.z
    self_init = tex.init_time
    self_x = tex.x
    self_y = tex.y
    rad2 = (tex.radius * 1.4) ** 2

    # Fractional texel coordinates of the winner's continuous projection.
    # The winner sits in its own texel so frac in [0, 1).
    cam = config.camera
    safe_z = jnp.where(self_z == 0.0, 1.0, self_z)
    x4 = F * (cam.fx * self_x / safe_z + cam.cx)
    y4 = F * (cam.fy * self_y / safe_z + cam.cy)
    fx_ = x4 - jnp.floor(x4)
    fy_ = y4 - jnp.floor(y4)

    # Pre-pad candidate images once.
    pads = {k: jnp.pad(getattr(tex, k), R) for k in
            ("z", "conf", "init_time", "last_time", "x", "y")}
    p_has = jnp.pad(tex.has, R)
    rows4, cols4 = tex.z.shape

    def sl(img, dy, dx):
        return img[R + dy:R + dy + rows4, R + dx:R + dx + cols4]

    count = jnp.zeros_like(self_z)
    zcount = jnp.zeros_like(self_z)
    for dy in range(-F, F + 1):
        wy = _axis_weight(dy, fy_, F)
        for dx in range(-F, F + 1):
            w = _axis_weight(dx, fx_, F) * wy
            c_has = sl(p_has, dy, dx)
            cz = sl(pads["z"], dy, dx)
            c_conf = sl(pads["conf"], dy, dx)
            c_init = sl(pads["init_time"], dy, dx)
            c_last = sl(pads["last_time"], dy, dx)
            d2 = ((sl(pads["x"], dy, dx) - self_x) ** 2
                  + (sl(pads["y"], dy, dx) - self_y) ** 2)
            behind = cz > self_z
            red = (c_has & (c_init < self_init)
                   & (c_conf > fus.confidence_threshold)
                   & behind & (cz - self_z < 0.01) & (d2 < rad2))
            fsv = (c_has & (c_last == tickf)
                   & (c_conf > 0.4 * fus.confidence_threshold)
                   & behind & (cz - self_z > 0.01))
            count = count + jnp.where(red, w, 0.0)
            zcount = zcount + jnp.where(fsv, w, 0.0)

    # The reference thresholds (copy_unstable.vert:116) count *samples*, and
    # one candidate surfel collects up to (8/F)^2 of the 256 window samples
    # — 4^2 at the reference's F=4.  Scale so a threshold always means the
    # same number of qualifying neighbor surfels regardless of F.
    mult = (4.0 / F) ** 2
    return self_has & ((count > fus.clean_redundant_count * mult)
                       | (zcount > fus.clean_free_space_count * mult))


def kill_mask_from_tex(kill_tex: jnp.ndarray, idx: jnp.ndarray,
                       capacity: int) -> jnp.ndarray:
    """Texel-space kill verdicts -> (capacity,) slot mask (one row scatter).
    Non-killing texels route out of bounds and are dropped (a shared
    in-bounds sentinel slot would serialize the duplicate group)."""
    tgt = jnp.where(kill_tex.ravel(), idx.ravel(), capacity)
    killed = jnp.zeros((capacity,), jnp.int32).at[tgt].max(
        jnp.ones((tgt.shape[0],), jnp.int32), mode="drop")
    return killed > 0


def window_kill_mask(tex: TexelImages, capacity: int,
                     tick: jnp.ndarray, config: SFConfig) -> jnp.ndarray:
    """(capacity,) bool — slot-space window-kill verdict (used by the
    slot-routed compat path and the sparse F>1 fuse; the F=1 texel pipeline
    keeps the verdict in texel space)."""
    kill_tex = window_kill_tex(tex, tick, config)
    return kill_mask_from_tex(kill_tex, tex.idx, capacity)


def clean_and_insert(smap: SurfelMap,
                     tex: TexelImages,
                     local: SurfelsLocal,
                     new: NewSurfels,
                     tick: jnp.ndarray,
                     config: SFConfig) -> SurfelMap:
    fus = config.fusion
    tickf = jnp.asarray(tick, jnp.float32)

    del local
    keep = smap.valid & ~window_kill_mask(tex, smap.capacity, tick, config)
    # Unstable too long with low confidence, or zero-confidence
    # (copy_unstable.vert:118-122).
    too_old_unstable = ((tickf - smap.last_time) > fus.clean_unstable_age) & \
                       (smap.conf < fus.clean_unstable_conf)
    keep = keep & ~(too_old_unstable | (smap.conf == 0.0))
    # Stable surfels outside the update window are always retained
    # (copy_unstable.vert:~124).
    stale_stable = (smap.last_time > 0) & \
                   ((tickf - smap.last_time) > fus.time_delta)
    keep = (keep | (smap.valid & stale_stable)) & smap.valid

    # ---- insert new unstable surfels into free slots ----
    # The association pass activates at most a quarter of the pixels (the
    # checkerboard-in-time subsample, data.vert:115), so the free-slot list —
    # the expensive size-`n` nonzero over the capacity mask — only needs
    # ceil(P/4) entries.
    max_new = new.is_new.shape[0]
    cam = config.camera
    n_slots = min(max_new,
                  ((cam.height + 1) // 2) * ((cam.width + 1) // 2))
    free = ~keep
    # First n_slots free slot ids, ascending, capacity-filled when fewer
    # free slots exist.  A stable argsort (bitonic, parallel) is ~20x
    # cheaper than jnp.nonzero's cumsum+scatter lowering on TPU.
    order = jnp.argsort(keep, stable=True)[:n_slots]
    n_free = smap.capacity - jnp.sum(keep.astype(jnp.int32))
    free_slots = jnp.where(jnp.arange(n_slots) < n_free, order,
                           smap.capacity)
    rank = jnp.cumsum(new.is_new.astype(jnp.int32)) - 1
    slot = jnp.where(new.is_new, free_slots[jnp.clip(rank, 0, n_slots - 1)],
                     smap.capacity)
    ins = new.is_new & (slot < smap.capacity) & (rank < n_slots)
    tgt = jnp.where(ins, slot, smap.capacity)  # out of range -> dropped

    # ONE wide row-scatter instead of nine narrow ones (one (P, 15)
    # payload writes all fields for ~the price of one: 9x narrow 3.4 ms vs
    # 1x 16-wide 1.1 ms at P=77k, round-3 microbench).  This slot-routed
    # path is the rarely-run reference-parity ORACLE; the production
    # write-back (`writeback_and_insert`) has since moved to a
    # surfel-major gather, which beats any scatter formulation — the wide
    # scatter is retained here only because this path exists for
    # equivalence tests, not speed.
    col = lambda a: a[:, None]
    tick_col = jnp.full((max_new, 1), tickf)
    base = jnp.concatenate([
        smap.pos, col(smap.conf), smap.color, col(smap.hist),
        col(smap.init_time), col(smap.last_time), smap.normal,
        col(smap.radius), col(keep.astype(jnp.float32))], axis=1)
    payload = jnp.concatenate([
        new.pos, col(new.conf), new.color, jnp.ones((max_new, 1)),
        tick_col, tick_col, new.normal, col(new.radius),
        col(ins.astype(jnp.float32))], axis=1)
    out = base.at[tgt].set(payload, mode="drop")

    used = jnp.maximum(smap.used,
                       jnp.max(jnp.where(ins, slot + 1, 0))).astype(jnp.int32)
    return SurfelMap(
        pos=out[:, 0:3], conf=out[:, 3], color=out[:, 4:7],
        hist=out[:, 7], init_time=out[:, 8], last_time=out[:, 9],
        normal=out[:, 10:13], radius=out[:, 13],
        valid=out[:, 14] > 0.5,
        used=used,
    )


def writeback_and_insert(smap: SurfelMap,
                         merged: TexelImages,
                         upd_has: jnp.ndarray,
                         kill_tex: jnp.ndarray,
                         local: SurfelsLocal,
                         new: NewSurfels,
                         pose: jnp.ndarray,
                         tick: jnp.ndarray,
                         config: SFConfig) -> SurfelMap:
    """Fold the update-merge, the clean verdicts, and the new-surfel insert
    into ONE wide scatter (TPU scatter cost is per-op, nearly independent of
    index count and row width — scripts/microbench_scatter.py).

    Three disjoint write classes:
    * elementwise: age/zero-conf kills on every slot (copy_unstable.vert:118-122)
      with the stale-stable retention quirk;
    * texel write-back: texels whose winner was updated (merged attributes,
      update.vert) or window-killed (valid=0) scatter to `merged.idx`;
    * insert: new unstable surfels append at the `used` high-water mark (the
      reference appends at its transform-feedback count,
      GlobalModel.cpp:577-581) — a cumsum replaces the free-slot argsort;
      killed slots leak until the host's periodic compact_map reclaims them.

    Disjointness proof: write-back targets are z-buffer winners, which are
    valid surfels in [0, used); inserts target [used, capacity).

    The texel write-back runs SURFEL-MAJOR: scattering all S texel rows
    pixel-major pays the per-row scatter cost for every texel whether or
    not it writes (VGA F=1: 307k + 77k rows measured 20.8 ms — the single
    hottest op of the step).  Instead each slot GATHERS its own texel
    (through the same projection `local` that produced the render) and
    accepts the merged row iff it is that texel's winner — one
    capacity-row stacked gather (winner id rides as a float column: ids
    < 2^24 are exact in f32, no-winner texels carry -1) plus elementwise
    selects, leaving only the insert scatter (active-subgrid rows)."""
    fus = config.fusion
    cam = config.camera
    F = fus.index_factor
    rows4, cols4 = cam.height * F, cam.width * F
    tickf = jnp.asarray(tick, jnp.float32)
    cap = smap.capacity
    # The winner id rides as a value-cast f32 column and is compared
    # against arange floats: exact only below 2^24.  (A bitcast like the
    # texelmap/sparse paths use would NOT be safe here — small int32 ids
    # bitcast to denormals, which TPU flushes to zero, collapsing the
    # equality test.)  The reference's own map is 9.4M < 2^24 slots.
    assert cap < (1 << 24), f"capacity {cap} overflows the f32 id column"

    # ---- elementwise lifecycle on the old slot arrays ----
    too_old_unstable = ((tickf - smap.last_time) > fus.clean_unstable_age) & \
                       (smap.conf < fus.clean_unstable_conf)
    keep_elem = smap.valid & ~(too_old_unstable | (smap.conf == 0.0))
    stale_stable = (smap.last_time > 0) & \
                   ((tickf - smap.last_time) > fus.time_delta)
    keep_elem = (keep_elem | (smap.valid & stale_stable)) & smap.valid

    # ---- surfel-major texel write-back ----
    wb = merged.has & (upd_has | kill_tex)
    inb = ((local.u4 >= 0) & (local.u4 < cols4)
           & (local.v4 >= 0) & (local.v4 < rows4))
    fi = (jnp.clip(local.v4, 0, rows4 - 1) * cols4
          + jnp.clip(local.u4, 0, cols4 - 1))
    idx_f = jnp.where(merged.has, merged.idx, -1).astype(jnp.float32)
    flatc = lambda a: a.ravel()
    tab = jnp.stack([
        flatc(merged.x), flatc(merged.y), flatc(merged.z),
        flatc(merged.conf), flatc(merged.r), flatc(merged.g),
        flatc(merged.b), flatc(merged.hist), flatc(merged.init_time),
        flatc(merged.last_time), flatc(merged.nx), flatc(merged.ny),
        flatc(merged.nz), flatc(merged.radius),
        flatc(kill_tex.astype(jnp.float32)),
        flatc(wb.astype(jnp.float32)), flatc(idx_f)], axis=1)  # (S, 17)
    g = tab[fi]                                                # (cap, 17)
    ids_f = jnp.arange(cap, dtype=jnp.float32)
    take = inb & (g[:, 16] == ids_f) & (g[:, 15] > 0)

    R, t = pose[:3, :3], pose[:3, 3]
    wpos = g[:, 0:3] @ R.T + t
    wnrm = g[:, 10:13] @ R.T
    sel = lambda new_col, old: jnp.where(take, new_col, old)
    pos = jnp.where(take[:, None], wpos, smap.pos)
    nrm = jnp.where(take[:, None], wnrm, smap.normal)
    color = jnp.where(take[:, None], g[:, 4:7], smap.color)
    conf = sel(g[:, 3], smap.conf)
    hist = sel(g[:, 7], smap.hist)
    init_time = sel(g[:, 8], smap.init_time)
    last_time = sel(g[:, 9], smap.last_time)
    radius = sel(g[:, 13], smap.radius)
    valid = jnp.where(take, g[:, 14] < 0.5, keep_elem)

    # ---- append new surfels at the high-water mark ----
    max_new = new.is_new.shape[0]
    rank = jnp.cumsum(new.is_new.astype(jnp.int32)) - 1
    slot = smap.used + rank
    ins = new.is_new & (slot < cap)
    tgt_ins = jnp.where(ins, slot, cap)
    n_new = jnp.where(max_new > 0, rank[-1] + 1, 0)
    used = jnp.minimum(cap, smap.used + n_new).astype(jnp.int32)

    col = lambda a: a[:, None]
    tick_col = jnp.full((max_new, 1), tickf)
    payload_ins = jnp.concatenate([
        new.pos, col(new.conf), new.color, jnp.ones((max_new, 1)),
        tick_col, tick_col, new.normal, col(new.radius),
        col(ins.astype(jnp.float32))], axis=1)
    base = jnp.concatenate([
        pos, col(conf), color, col(hist), col(init_time), col(last_time),
        nrm, col(radius), col(valid.astype(jnp.float32))], axis=1)
    out = base.at[tgt_ins].set(payload_ins, mode="drop")

    return SurfelMap(
        pos=out[:, 0:3], conf=out[:, 3], color=out[:, 4:7],
        hist=out[:, 7], init_time=out[:, 8], last_time=out[:, 9],
        normal=out[:, 10:13], radius=out[:, 13],
        valid=out[:, 14] > 0.5,
        used=used,
    )
