"""Fusion pass 3: map cleaning — redundancy/free-space culling and the
unstable-surfel lifecycle, plus free-slot allocation of new surfels.

Reference: `copy_unstable.vert/.geom` + the clean pass orchestration
(GlobalModel.cpp:491-601).  The GL version stream-compacts survivors into the
other half of a double-buffered VBO and appends the new-unstable transform
feedback, with a primitive-count query maintaining `count`.

TPU design:
* Survivor selection is a dense boolean update of the validity mask — no
  compaction ever moves surfels (stable indices make the index map cheaper).
* New surfels are scattered into the first free slots found with a
  static-size `jnp.nonzero` — the functional replacement for the append.
* The window test replicates the GLSL's 16x16 half-texel nearest sampling
  *including its duplicate-sample multiplicity*: the unique 9x9 texel window
  is weighted by how many of the 16 sample positions land on each texel
  (the reference counts duplicates toward `count`/`zCount`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.association import NewSurfels
from staticfusion_tpu.fusion.indexmap import IndexMapRender
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.ops.zbuffer import INVALID


def _axis_weights(a: jnp.ndarray):
    """For sample positions floor(a + 0.5*k), k=0..15: the 9 unique texels
    floor(a)+m (m=0..8) and how many k land on each."""
    base = jnp.floor(a)
    ms = []
    ws = []
    for off in range(9):
        m = base + off
        lo = jnp.ceil(jnp.maximum(2.0 * (m - a), 0.0))
        hi = jnp.ceil(jnp.minimum(2.0 * (m + 1.0 - a), 16.0))
        ws.append(jnp.maximum(hi - lo, 0.0))
        ms.append(m.astype(jnp.int32))
    return ms, ws


def clean_and_insert(smap: SurfelMap,
                     index_render: IndexMapRender,
                     new: NewSurfels,
                     pose: jnp.ndarray,
                     tick: jnp.ndarray,
                     config: SFConfig) -> SurfelMap:
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows, cols = cam.height, cam.width
    rows4, cols4 = rows * F, cols * F
    tickf = jnp.asarray(tick, jnp.float32)

    # ---- survivor test (copy_unstable.vert) ----
    local = index_render.local_pos            # (N, 3) — same pose as render
    z = local[:, 2]
    safe_z = jnp.where(z == 0.0, 1.0, z)
    x = cam.fx * local[:, 0] / safe_z + cam.cx   # GL continuous coords
    y = cam.fy * local[:, 1] / safe_z + cam.cy

    recent = (tickf - smap.last_time) < fus.time_delta
    in_img = (z > 0) & (x > 0) & (y > 0) & (x < cols) & (y < rows)
    do_window = smap.valid & recent & in_img

    winner = index_render.winner.ravel()
    mx, wx = _axis_weights(jnp.where(do_window, 4.0 * x - 4.0, 0.0))
    my, wy = _axis_weights(jnp.where(do_window, 4.0 * y - 4.0, 0.0))

    count = jnp.zeros_like(z)
    zcount = jnp.zeros_like(z)
    mx_all = jnp.stack(mx, axis=-1)          # (N, 9)
    wx_all = jnp.stack(wx, axis=-1)
    x_ok = (mx_all >= 0) & (mx_all < cols4)
    tx_all = jnp.clip(mx_all, 0, cols4 - 1)
    # One window row per step: (N, 9) vectorized, 9 steps — bounds the
    # gather temporaries to N*9 instead of N*81.
    for iy in range(9):
        ty = jnp.clip(my[iy], 0, rows4 - 1)
        ok = (do_window & (my[iy] >= 0) & (my[iy] < rows4))[:, None] & x_ok
        w = wx_all * wy[iy][:, None]                       # (N, 9)
        cand = winner[ty[:, None] * cols4 + tx_all]
        has = ok & (cand != INVALID) & (w > 0)
        safe = jnp.where(has, cand, 0)
        cz = local[safe, 2]
        c_conf = smap.conf[safe]
        c_init = smap.init_time[safe]
        c_last = smap.last_time[safe]
        dxy = local[safe, :2] - local[:, None, :2]
        d2 = jnp.sum(dxy * dxy, axis=-1)
        red = (has & (c_init < smap.init_time[:, None])
               & (c_conf > fus.confidence_threshold)
               & (cz > z[:, None]) & (cz - z[:, None] < 0.01)
               & (d2 < (smap.radius[:, None] * 1.4) ** 2))
        fsv = (has & (c_last == tickf)
               & (c_conf > 0.4 * fus.confidence_threshold)
               & (cz > z[:, None]) & (cz - z[:, None] > 0.01))
        count = count + jnp.sum(jnp.where(red, w, 0.0), axis=-1)
        zcount = zcount + jnp.sum(jnp.where(fsv, w, 0.0), axis=-1)

    keep = smap.valid
    keep = keep & ~((count > fus.clean_redundant_count)
                    | (zcount > fus.clean_free_space_count))
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
    max_new = new.is_new.shape[0]
    free = ~keep
    free_slots = jnp.nonzero(free, size=max_new,
                             fill_value=smap.capacity)[0]
    # Rank each new surfel among the new ones; slot = free_slots[rank].
    rank = jnp.cumsum(new.is_new.astype(jnp.int32)) - 1
    slot = jnp.where(new.is_new, free_slots[jnp.clip(rank, 0, max_new - 1)],
                     smap.capacity)
    fits = slot < smap.capacity
    slot_c = jnp.where(fits, slot, smap.capacity - 1)
    ins = new.is_new & fits

    def put(arr, val):
        if arr.ndim == 2:
            return arr.at[slot_c].set(
                jnp.where(ins[:, None], val, arr[slot_c]))
        return arr.at[slot_c].set(jnp.where(ins, val, arr[slot_c]))

    tick_col = jnp.full((max_new,), tickf)
    return SurfelMap(
        pos=put(smap.pos, new.pos),
        conf=put(smap.conf, new.conf),
        color=put(smap.color, new.color),
        hist=put(smap.hist, jnp.ones((max_new,))),
        init_time=put(smap.init_time, tick_col),
        last_time=put(smap.last_time, tick_col),
        normal=put(smap.normal, new.normal),
        radius=put(smap.radius, new.radius),
        valid=put(keep, ins),
    )
