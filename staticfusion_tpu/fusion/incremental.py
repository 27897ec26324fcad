"""Incremental texel-image rendering: warp last fuse's texel state forward
instead of re-rendering the whole surfel map every frame.

The reference re-renders its index map from scratch each frame
(IndexMap.cpp:127-185) because GL rasterization is nearly free.  On TPU the
equivalent render is two per-index walls: a z-buffer scatter-min over every
live surfel plus a winner-attribute gather over every texel (~40 ns/index
each, scripts/microbench*.py) — the single largest stage of the fused step
(scripts/ablate_step.py: 3.6 ms marginal of a 10.4 ms QVGA frame).

This module exploits the frame-to-frame structure the reference never
needed: the winner set changes slowly.  After fuse at frame t we already
hold every winner's *post-merge* attributes as texel images (the same
values written back to the map), and every inserted surfel's attributes as
per-pixel images.  The next fuse's index map at pose P_{t+1} = P_t @ T is
then reconstructed with zero indexed ops:

1. transform the carried positions/normals by T^-1 (elementwise),
2. re-project to texel coords (elementwise),
3. compensate the dominant image motion with ONE global integer shift
   (median displacement, applied as a dynamic slice of the stacked
   field images),
4. re-rasterize with a (2R+1)^2 *stencil* window search — for each target
   texel, scan the shifted source texels that could land on it and keep
   the nearest-depth candidate (packed-key order: quantized depth, then
   smaller id — bitwise the same winner rule as texelmap.py's scatter).

Everything is fixed-shape VPU work, like the splat (predict.py), so the
cost is ~an order of magnitude below the scatter+gather render.

What the warp cannot see — surfels that were visible-but-not-winners within
the freshness window (occluded surfels whose occluder died, z-buffer
losers), or surfels re-entering the frustum — is bounded by running a full
render every `incremental_every` frames and whenever the residual
displacement after the global shift exceeds the stencil reach R (fast
motion).  The accuracy suite (scripts/accuracy_bench.py) pins the ATE/IoU
cost of the approximation.

Only `index_factor == 1` (the production default) is supported: at F=1 the
insert layer (one candidate per camera pixel) aligns with the texel grid,
so carrying it needs no scatter.  F>1 configs always take the full render.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.association import (NewSurfels, TexelUpdates,
                                                 expand_subgrid)
from staticfusion_tpu.fusion.texelmap import (INT_MAX, PACKED_MAX_ID_BITS,
                                              TexelImages, id_bits_for)
from staticfusion_tpu.geometry.se3 import se3_inverse

# Stacked-field layout for the carried state (one (C, H, W) array so the
# global shift is ONE pad + dynamic-slice and each stencil select is ONE
# jnp.where).  All channels are float32; `id` is exact in f32 because the
# packed-key path caps ids at 2^21 < 2^24 (texelmap.PACKED_MAX_ID_BITS).
_FIELDS = ("x", "y", "z", "nx", "ny", "nz", "radius", "conf",
           "init_time", "last_time", "r", "g", "b", "hist")
_C_ID = len(_FIELDS)        # carried surfel id channel
_C_HAS = _C_ID + 1          # candidate-valid channel (0.0 / 1.0)
_N_CH = _C_HAS + 1


class CarriedTexels(NamedTuple):
    """Post-writeback texel snapshot, camera frame of the fuse that built it.

    `stack` is the (N_CH, H, W) field stack described above; `ok` is False
    until the first full-render fuse populates it and is cleared by the host
    whenever slot ids move under it (map compaction, loop-closure
    deformation)."""
    stack: jnp.ndarray   # (N_CH, H, W) float32
    ok: jnp.ndarray      # () bool


def empty_carried(rows: int, cols: int) -> CarriedTexels:
    return CarriedTexels(stack=jnp.zeros((_N_CH, rows, cols), jnp.float32),
                         ok=jnp.asarray(False))


def supports_incremental(config: SFConfig, capacity: int) -> bool:
    """Static gate: the config + map tier can take the incremental path.
    `capacity` is the current map tier (smap.capacity), whose id-bit count
    sets the packed-key layout the warp must reproduce; ib >= 7 keeps the
    quantized-depth levels exactly representable in float32."""
    fus = config.fusion
    ib = id_bits_for(capacity)
    return (fus.incremental_every > 1 and fus.index_factor == 1
            and 7 <= ib <= PACKED_MAX_ID_BITS)


def _quantize_depth(z: jnp.ndarray, ib: int, depth_max: float) -> jnp.ndarray:
    """texelmap.py's packed-key depth quantization, as exact float32
    (dlevels <= 2^(31-ib)-1 < 2^24 whenever ib >= 8; QVGA+ capacities
    always are)."""
    dlevels = (1 << (31 - ib)) - 1
    q = jnp.clip((z * (dlevels / depth_max)).astype(jnp.int32), 0, dlevels)
    return q.astype(jnp.float32)


def build_carried(merged: TexelImages,
                  upd: TexelUpdates,
                  kill_tex: jnp.ndarray,
                  new: NewSurfels,
                  used: jnp.ndarray,
                  pose: jnp.ndarray,
                  tick: jnp.ndarray,
                  capacity: int,
                  config: SFConfig) -> CarriedTexels:
    """Snapshot the texel state writeback_and_insert is about to commit.

    Two candidate layers share each texel (F=1: texel == pixel):
    * the merged winner, if it survives this fuse's kill rules — the same
      `keep_elem` lifecycle writeback_and_insert applies
      (copy_unstable.vert:118-122) plus the window kill;
    * the freshly inserted surfel at this pixel (slot = high-water mark +
      rank, exactly writeback_and_insert's cumsum), which exists where the
      association matched nothing.
    The nearer (packed-key order) of the two is carried; losing the other
    costs one candidate until the next full render.
    """
    del upd
    fus = config.fusion
    rows, cols = merged.has.shape
    ib = id_bits_for(capacity)
    tickf = jnp.asarray(tick, jnp.float32)

    # --- layer 1: surviving winners (attrs already camera-local) ---
    too_old_unstable = ((tickf - merged.last_time) > fus.clean_unstable_age) \
        & (merged.conf < fus.clean_unstable_conf)
    stale_stable = (merged.last_time > 0) & \
                   ((tickf - merged.last_time) > fus.time_delta)
    keep = merged.has & ~kill_tex & \
        ~((too_old_unstable & ~stale_stable) | (merged.conf == 0.0))

    # --- layer 2: this fuse's inserts, back in camera-local coords ---
    # NewSurfels arrays are compacted to the checkerboard-active subgrid
    # (association.active_subgrid); expand back to the texel grid with the
    # scatter-free phase-mask upsample.
    t_par = jnp.asarray(tick, jnp.int32) % 2
    sub_rows, sub_cols = rows // 2, cols // 2

    def ximg(a):
        return expand_subgrid(a.reshape(sub_rows, sub_cols), rows, cols,
                              t_par)

    ins_flat = new.is_new
    rank = jnp.cumsum(ins_flat.astype(jnp.int32)) - 1
    slot = used + rank
    ins_flat = ins_flat & (slot < capacity)
    ins = ximg(ins_flat) > 0.0
    slot_img = ximg(slot.astype(jnp.float32))
    # new.pos/normal are world (data.vert:83-106); the carried stack is
    # camera-local, so undo the rigid transform applied in _new_surfels
    # (exactly frame_cloud's backprojection up to float round-off).
    # Planar math for the same layout reason as _transform_project.
    Rw, tw = pose[:3, :3], pose[:3, 3]

    def plane(a, col):
        return ximg(a[:, col])

    wx = plane(new.pos, 0) - tw[0] * ins
    wy = plane(new.pos, 1) - tw[1] * ins
    wz = plane(new.pos, 2) - tw[2] * ins

    def unrot(a, b, c, col):
        return Rw[0, col] * a + Rw[1, col] * b + Rw[2, col] * c

    npos = (unrot(wx, wy, wz, 0), unrot(wx, wy, wz, 1), unrot(wx, wy, wz, 2))
    nnrm = tuple(unrot(plane(new.normal, 0), plane(new.normal, 1),
                       plane(new.normal, 2), j) for j in range(3))
    ncol = tuple(plane(new.color, j) for j in range(3))
    nconf = ximg(new.conf)
    nrad = ximg(new.radius)

    return _combine_layers(merged, keep, ins, slot_img, npos, nnrm, ncol,
                           nconf, nrad, tickf, ib, config)


def _combine_layers(merged, keep, ins, slot_img, npos, nnrm,
                    ncol, nconf, nrad, tickf, ib, config):
    fus = config.fusion
    rows, cols = merged.has.shape

    qz_m = _quantize_depth(merged.z, ib, fus.depth_max)
    id_m = jnp.where(keep, merged.idx, INT_MAX).astype(jnp.float32)

    # Insert layer in local coords (caller pre-transforms world -> local).
    ins_z = npos[2]
    qz_i = _quantize_depth(ins_z, ib, fus.depth_max)

    # Winner between the two layers by (quantized depth, id) — the same
    # order the packed-key z-buffer resolves.
    ins_better = ins & (~keep | (qz_i < qz_m)
                        | ((qz_i == qz_m) & (slot_img < id_m)))
    m_sel = keep & ~ins_better
    any_sel = keep | ins

    def pick(m_img, i_img):
        return jnp.where(ins_better, i_img, jnp.where(m_sel, m_img, 0.0))

    one = jnp.ones((rows, cols), jnp.float32)
    ch = [
        pick(merged.x, npos[0]),
        pick(merged.y, npos[1]),
        pick(merged.z, ins_z),
        pick(merged.nx, nnrm[0]),
        pick(merged.ny, nnrm[1]),
        pick(merged.nz, nnrm[2]),
        pick(merged.radius, nrad),
        pick(merged.conf, nconf),
        pick(merged.init_time, tickf * one),
        pick(merged.last_time, tickf * one),
        pick(merged.r, ncol[0]),
        pick(merged.g, ncol[1]),
        pick(merged.b, ncol[2]),
        pick(merged.hist, one),
        pick(id_m, slot_img),
        any_sel.astype(jnp.float32),
    ]
    return CarriedTexels(stack=jnp.stack(ch), ok=jnp.asarray(True))


def _transform_project(stack: jnp.ndarray, T_odometry: jnp.ndarray,
                       capacity: int, config: SFConfig):
    """Carried camera frame -> next camera frame + texel re-projection.

    Returns (stack', vcell, ucell, qz, valid, dy, dx): the stack with
    positions/normals replaced by their transformed values, the integer
    landing cell per source texel, the quantized depth, the render-cull
    validity, and the displacement field."""
    cam = config.camera
    fus = config.fusion
    ib = id_bits_for(capacity)
    rows, cols = stack.shape[1:]

    # x_{t+1} = T_odometry^{-1} x_t  (pose_{t+1} = pose_t @ T_odometry).
    # Planar form: 9 scalar-coefficient multiply-adds on (H, W) planes.
    # Stacking the planes into (H, W, 3) + a K=3 matmul puts a 3-wide dim
    # in the lane position — a whole-array relayout plus a 42x-padded MXU
    # op that costs ~1.7 ms at QVGA (scripts/microbench_incr3.py); this
    # form fuses to near-zero.
    Ti = se3_inverse(T_odometry)
    R, t = Ti[:3, :3], Ti[:3, 3]
    x0, y0, z0 = stack[0], stack[1], stack[2]
    nx0, ny0, nz0 = stack[3], stack[4], stack[5]

    def rot(a, b, c, row):
        return R[row, 0] * a + R[row, 1] * b + R[row, 2] * c

    px = rot(x0, y0, z0, 0) + t[0]
    py = rot(x0, y0, z0, 1) + t[1]
    z = rot(x0, y0, z0, 2) + t[2]
    n2x = rot(nx0, ny0, nz0, 0)
    n2y = rot(nx0, ny0, nz0, 1)
    n2z = rot(nx0, ny0, nz0, 2)

    safe_z = jnp.where(z == 0.0, 1.0, z)
    xc = cam.fx * px / safe_z + cam.cx
    yc = cam.fy * py / safe_z + cam.cy
    ucell = jnp.floor(xc).astype(jnp.int32)
    vcell = jnp.floor(yc).astype(jnp.int32)

    has = stack[_C_HAS] > 0.0
    valid = (has & (z > 0.0) & (z <= fus.depth_max)
             & (ucell >= 0) & (ucell < cols) & (vcell >= 0) & (vcell < rows))

    qz = _quantize_depth(z, ib, fus.depth_max)

    uu = jnp.arange(cols, dtype=jnp.int32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.int32)[:, None]
    dy = vcell - vv
    dx = ucell - uu

    stack2 = jnp.concatenate(
        [jnp.stack([px, py, z, n2x, n2y, n2z]), stack[6:]])
    return stack2, vcell, ucell, qz, valid, dy, dx


def motion_fits(carried: CarriedTexels, T_odometry: jnp.ndarray,
                tick: jnp.ndarray, capacity: int,
                config: SFConfig) -> jnp.ndarray:
    """() bool — every fresh carried candidate lands within the stencil
    reach R of the global median shift (i.e. the warp loses nothing to
    fast motion).  Cheap elementwise math + reductions; evaluated OUTSIDE
    the full/incremental cond so it can gate it."""
    fus = config.fusion
    stack = carried.stack
    _, _, _, _, valid, dy, dx = _transform_project(stack, T_odometry,
                                                   capacity, config)
    fresh = (jnp.asarray(tick, jnp.float32) - stack[_FIELDS.index("last_time")]
             ) <= fus.time_delta
    v = valid & fresh
    sy, sx = _global_shift(dy, dx, v, config)
    R = fus.incremental_window
    ry = jnp.abs(dy - sy)
    rx = jnp.abs(dx - sx)
    worst = jnp.max(jnp.where(v, jnp.maximum(ry, rx), 0))
    return carried.ok & (worst <= R)


def _global_shift(dy, dx, valid, config: SFConfig):
    """Median-ish integer displacement (mean of the valid field, rounded),
    clamped to the padding budget."""
    M = config.fusion.incremental_max_shift
    w = valid.astype(jnp.float32)
    tot = jnp.maximum(jnp.sum(w), 1.0)
    sy = jnp.clip(jnp.round(jnp.sum(dy * w) / tot).astype(jnp.int32), -M, M)
    sx = jnp.clip(jnp.round(jnp.sum(dx * w) / tot).astype(jnp.int32), -M, M)
    return sy, sx


def incremental_render(carried: CarriedTexels, T_odometry: jnp.ndarray,
                       tick: jnp.ndarray, capacity: int,
                       config: SFConfig) -> TexelImages:
    """Reconstruct the next fuse's TexelImages from the carried snapshot.

    Winner rule per target texel: smallest (quantized depth, id) among the
    candidates landing on it — bitwise the packed-key scatter's order."""
    fus = config.fusion
    R = fus.incremental_window
    M = fus.incremental_max_shift
    rows, cols = carried.stack.shape[1:]

    stack, vcell, ucell, qz, valid, dy, dx = _transform_project(
        carried.stack, T_odometry, capacity, config)

    # Freshness cull (render_cull parity: tick - lastTime <= timeDelta).
    fresh = (jnp.asarray(tick, jnp.float32)
             - stack[_FIELDS.index("last_time")]) <= fus.time_delta
    valid = valid & fresh

    sy, sx = _global_shift(dy, dx, valid, config)

    # Augment the stack with the landing cell / depth key / validity, pad
    # once, apply the global shift with ONE dynamic slice, then run the
    # static stencil.
    aug = jnp.concatenate([
        stack[:_C_HAS],                       # fields + id
        valid[None].astype(jnp.float32),
        vcell[None].astype(jnp.float32),
        ucell[None].astype(jnp.float32),
        qz[None],
    ])
    A_HAS, A_V, A_U, A_QZ = _C_HAS, _C_HAS + 1, _C_HAS + 2, _C_HAS + 3
    P = M + R
    pad = jnp.pad(aug, ((0, 0), (P, P), (P, P)))
    # After this slice, channel images are the source shifted by the global
    # displacement (value at (v,u) = src[v - sy, u - sx]), with an R-ring.
    base = jax.lax.dynamic_slice(
        pad, (0, P - sy - R, P - sx - R),
        (aug.shape[0], rows + 2 * R, cols + 2 * R))

    uu = jnp.arange(cols, dtype=jnp.float32)[None, :]
    vv = jnp.arange(rows, dtype=jnp.float32)[:, None]

    best = jnp.zeros((_C_HAS, rows, cols), jnp.float32)
    best_qz = jnp.full((rows, cols), jnp.inf)
    best_id = jnp.full((rows, cols), jnp.float32(INT_MAX))
    hit = jnp.zeros((rows, cols), jnp.bool_)

    for ddv in range(-R, R + 1):
        for ddu in range(-R, R + 1):
            # Source texel (v - sy - ddv, u - sx - ddu) for target (v, u).
            c = base[:, R + ddv:R + ddv + rows, R + ddu:R + ddu + cols]
            lands = ((c[A_HAS] > 0.0) & (c[A_V] == vv) & (c[A_U] == uu))
            cqz = c[A_QZ]
            cid = c[_C_ID]
            better = lands & ((cqz < best_qz)
                              | ((cqz == best_qz) & (cid < best_id)))
            best_qz = jnp.where(better, cqz, best_qz)
            best_id = jnp.where(better, cid, best_id)
            hit = hit | better
            best = jnp.where(better[None], c[:_C_HAS], best)

    f = {name: jnp.where(hit, best[i], 0.0)
         for i, name in enumerate(_FIELDS)}
    return TexelImages(
        idx=jnp.where(hit, best_id.astype(jnp.int32), INT_MAX),
        has=hit,
        x=f["x"], y=f["y"], z=f["z"],
        nx=f["nx"], ny=f["ny"], nz=f["nz"],
        radius=f["radius"], conf=f["conf"],
        init_time=f["init_time"], last_time=f["last_time"],
        r=f["r"], g=f["g"], b=f["b"],
        hist=f["hist"],
    )
