"""Surfel map storage and per-frame feedback (depth -> oriented point cloud).

Reference mapping:
* `GlobalModel` VBO of 3 vec4s per surfel (Vertex.cpp:21-40) -> fixed-capacity
  SoA arrays in HBM (static shapes; a validity mask replaces the
  transform-feedback `count`).
* `vertex_feedback.vert` + `surfels.glsl` (back-projection, central-difference
  normals, radius, radial confidence) -> one fused elementwise pass.
* `init_unstable.vert` (first-frame map init with confidence decoded from the
  static-probability image) -> `initialise_map`.

The attribute layout mirrors the reference's packed vec4 semantics:
  pos[N,3], conf[N]            (vPosition.xyz, .w)
  color[N,3], hist[N], init_time[N], last_time[N]
                               (vColor: .x encoded rgb, .y, .z, .w)
  normal[N,3], radius[N]       (vNormRad)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig


class SurfelMap(NamedTuple):
    pos: jnp.ndarray        # (N, 3) world
    conf: jnp.ndarray       # (N,)
    color: jnp.ndarray      # (N, 3) float rgb in [0,1]
    hist: jnp.ndarray       # (N,) times-seen weight (vColor.y)
    init_time: jnp.ndarray  # (N,) first-seen tick (vColor.z)
    last_time: jnp.ndarray  # (N,) last-update tick (vColor.w)
    normal: jnp.ndarray     # (N, 3) world
    radius: jnp.ndarray     # (N,)
    valid: jnp.ndarray      # (N,) bool
    # Scalar high-water mark: slots [0, used) have ever held a surfel.  New
    # surfels append at `used` (the reference appends at its transform-
    # feedback `count`, GlobalModel.cpp:577-581); slots freed by kills leak
    # until the host's periodic compaction reclaims them — this removes the
    # per-frame free-slot argsort from the fuse hot path.
    used: jnp.ndarray       # () int32

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def empty_map(capacity: int) -> SurfelMap:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    z1 = jnp.zeros((capacity,), jnp.float32)
    return SurfelMap(pos=z3, conf=z1, color=z3, hist=z1, init_time=z1,
                     last_time=z1, normal=z3, radius=z1,
                     valid=jnp.zeros((capacity,), bool),
                     used=jnp.asarray(0, jnp.int32))


def next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


def next_tier(n: int) -> int:
    """Smallest map tier >= n from the {2^k, 1.5*2^k} ladder.

    Every per-surfel indexed op costs ~50 ns/row on v5e regardless of
    width, so tier slack is pure waste: pow2-only tiers leave up to 2x
    slack (a 77k-surfel map pays for 131k rows).  The 1.5x mid-tiers cap
    slack at 33% for ~1.5x more distinct compiled programs (tiers are
    still geometric, ratio 1.33)."""
    p = next_pow2(n)
    if n <= (p >> 2) * 3:           # 1.5 * 2^(k-1) == 0.75 * 2^k
        return (p >> 2) * 3
    return p


def concat_maps(a: SurfelMap, b: SurfelMap) -> SurfelMap:
    """Stack two maps slot-wise (capacity a+b); callers usually compact the
    result.  Slot ids are frame-local, so concatenation order is free."""
    import jax

    cat = jax.tree_util.tree_map(
        lambda x, y: jnp.concatenate([jnp.atleast_1d(x), jnp.atleast_1d(y)])
        if jnp.ndim(x) > 0 else x, a, b)
    return cat._replace(used=(a.capacity + b.used).astype(jnp.int32))


def compact_map(smap: SurfelMap, new_capacity: int,
                keep_mask=None) -> SurfelMap:
    """Pack the valid surfels into the prefix of a `new_capacity`-sized map.

    The TPU equivalent of the reference's count-driven processing: GL's
    transform-feedback compaction keeps `count` (GlobalModel.cpp:562-581) so
    every per-surfel pass scales with the *live* map, not the allocation.
    Here all per-surfel passes scale with the array size, so the host
    periodically repacks the map into the smallest power-of-two tier with
    headroom (pipeline/system.py).  Surfel slot ids are frame-local — nothing
    in SlamState references them across frames — so repacking between frames
    is exact.  Valid surfels beyond `new_capacity` are dropped (callers pick
    tiers with headroom, so this matches map-full behavior).

    `keep_mask` (default: smap.valid) selects which surfels survive the
    pack — the active/archive split (pipeline/system.py) passes
    valid & fresh / valid & stale respectively."""
    cap = smap.capacity
    keep = smap.valid if keep_mask is None else (smap.valid & keep_mask)
    # Kept slot ids, ascending (stable argsort ~20x cheaper than
    # jnp.nonzero's lowering on TPU).  Growing tiers pad with dummy ids —
    # `has` masks them off.
    order = jnp.argsort(~keep, stable=True)
    if new_capacity <= cap:
        order = order[:new_capacity]
    else:
        order = jnp.concatenate(
            [order, jnp.zeros((new_capacity - cap,), order.dtype)])
    n_valid = jnp.sum(keep.astype(jnp.int32))
    has = jnp.arange(new_capacity) < n_valid
    safe = jnp.where(has, order, 0)

    col = lambda a: a[:, None]
    packed = jnp.concatenate([
        smap.pos, col(smap.conf), smap.color, col(smap.hist),
        col(smap.init_time), col(smap.last_time), smap.normal,
        col(smap.radius)], axis=1)
    out = jnp.where(has[:, None], packed[safe], 0.0)  # one wide gather
    used = jnp.minimum(n_valid, new_capacity).astype(jnp.int32)
    return SurfelMap(pos=out[:, 0:3], conf=out[:, 3], color=out[:, 4:7],
                     hist=out[:, 7], init_time=out[:, 8],
                     last_time=out[:, 9], normal=out[:, 10:13],
                     radius=out[:, 13], valid=keep[safe] & has,
                     used=used)


class FrameCloud(NamedTuple):
    """Per-pixel oriented points in the camera frame (vertex_feedback.vert)."""
    pos: jnp.ndarray      # (H, W, 3)
    normal: jnp.ndarray   # (H, W, 3)
    radius: jnp.ndarray   # (H, W)
    conf: jnp.ndarray     # (H, W) radial confidence
    valid: jnp.ndarray    # (H, W) 0 < z <= maxDepth


def radial_confidence(rows: int, cols: int, cx: float, cy: float,
                      weighting: float = 1.0) -> jnp.ndarray:
    """Radial Gaussian confidence (surfels.glsl confidence()); the reference
    hard-codes maxRadDist = 200 regardless of resolution."""
    x = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    rd2 = ((x - cx) ** 2 + (y - cy) ** 2) / (200.0 ** 2)
    del weighting  # the GLSL takes it but never uses it in confidence()
    return jnp.exp(-rd2 / (2.0 * 0.72))


def backproject_fusion(depth_m: jnp.ndarray, config: SFConfig) -> jnp.ndarray:
    """(H, W, 3) camera-frame positions with the fusion intrinsics sampled at
    pixel centers (geometry.glsl getVertex: x = texcoord*cols = u + 0.5)."""
    cam = config.camera
    rows, cols = depth_m.shape
    x = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    px = (x - cam.cx) * depth_m / cam.fx
    py = (y - cam.cy) * depth_m / cam.fy
    return jnp.stack([jnp.broadcast_to(px, depth_m.shape),
                      jnp.broadcast_to(py, depth_m.shape), depth_m], axis=-1)


def compute_normals(pos: jnp.ndarray) -> jnp.ndarray:
    """Central-difference normals (geometry.glsl float getNormal):
    n = normalize(cross((P(x-1)-P(x+1))/2, (P(y-1)-P(y+1))/2)), edge-clamped.
    These point *away* from the camera (+z for a fronto-parallel wall),
    matching the reference's convention."""
    p = jnp.pad(pos, ((1, 1), (1, 1), (0, 0)), mode="edge")
    del_x = 0.5 * (p[1:-1, :-2] - p[1:-1, 2:])
    del_y = 0.5 * (p[:-2, 1:-1] - p[2:, 1:-1])
    n = jnp.cross(del_x, del_y)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-12)


def compute_radius(depth_m: jnp.ndarray, normal_z: jnp.ndarray,
                   config: SFConfig) -> jnp.ndarray:
    """surfels.glsl getRadius: r = (z/meanFocal)*sqrt2, divided by |n_z| and
    capped at 2r."""
    cam = config.camera
    mean_focal = 0.5 * (cam.fx + cam.fy)
    r = depth_m / mean_focal * math.sqrt(2.0)
    rn = r / jnp.maximum(jnp.abs(normal_z), 1e-6)
    return jnp.minimum(2.0 * r, rn)


def frame_cloud(depth_m: jnp.ndarray, config: SFConfig) -> FrameCloud:
    """vertex_feedback.vert for one (already metricised) depth image."""
    pos = backproject_fusion(depth_m, config)
    normal = compute_normals(pos)
    radius = compute_radius(depth_m, normal[..., 2], config)
    cam = config.camera
    conf = radial_confidence(depth_m.shape[0], depth_m.shape[1], cam.cx, cam.cy)
    valid = (depth_m > 0.0) & (depth_m <= config.fusion.depth_max)
    return FrameCloud(pos=pos, normal=normal, radius=radius, conf=conf,
                      valid=valid)


def quantize8(x: jnp.ndarray) -> jnp.ndarray:
    """Round-trip through the 8-bit color codec (color.glsl), which the
    reference applies to the static-probability image before it becomes the
    initial surfel confidence (init_unstable.vert:39-41)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def initialise_map(capacity: int,
                   raw_depth_m: jnp.ndarray,
                   filtered_depth_m: jnp.ndarray,
                   rgb: jnp.ndarray,
                   static_prob: jnp.ndarray,
                   pose: jnp.ndarray,
                   config: SFConfig) -> SurfelMap:
    """First-frame map init (GlobalModel::initialise + init_unstable.vert):
    positions/colors from the raw cloud, normals/radii from the filtered
    cloud, confidence = 8-bit-quantized static probability, init time 1."""
    raw = frame_cloud(raw_depth_m, config)
    filt = frame_cloud(filtered_depth_m, config)

    # A map smaller than the frame keeps the first `capacity` pixels (the
    # same truncation a full map applies to later insertions).
    n_pix = min(raw_depth_m.size, capacity)
    crop = lambda a: a[:n_pix]
    m = empty_map(capacity)
    R, t = pose[:3, :3], pose[:3, 3]
    world_pos = raw.pos.reshape(-1, 3) @ R.T + t
    world_nrm = filt.normal.reshape(-1, 3) @ R.T

    valid = crop(raw.valid.ravel())
    conf = jnp.where(valid, crop(quantize8(static_prob.ravel())), 0.0)
    return SurfelMap(
        pos=m.pos.at[:n_pix].set(
            jnp.where(valid[:, None], crop(world_pos), 0.0)),
        conf=m.conf.at[:n_pix].set(conf),
        color=m.color.at[:n_pix].set(
            jnp.where(valid[:, None], crop(rgb.reshape(-1, 3)), 0.0)),
        hist=m.hist.at[:n_pix].set(valid.astype(jnp.float32)),
        init_time=m.init_time.at[:n_pix].set(valid.astype(jnp.float32)),
        last_time=m.last_time.at[:n_pix].set(valid.astype(jnp.float32)),
        normal=m.normal.at[:n_pix].set(
            jnp.where(valid[:, None], crop(world_nrm), 0.0)),
        radius=m.radius.at[:n_pix].set(
            jnp.where(valid, crop(filt.radius.ravel()), 0.0)),
        valid=m.valid.at[:n_pix].set(valid),
        used=jnp.asarray(n_pix, jnp.int32),
    )
