"""Texel-space attribute images: the central TPU data structure of the
fusion backend.

The reference renders surfels into FACTOR=4 super-resolution id/vertConf/
colorTime/normalRad textures and samples them per pixel/per surfel
(IndexMap.cpp:127-185, data.vert, copy_unstable.vert).  GL gets this almost
for free from hardware rasterization; on TPU every scatter/gather costs
~10 ns per element, so the design minimizes element counts:

1. ONE packed-key scatter-min picks the winning surfel per texel:
   key = (quantized_depth << id_bits) | surfel_id.  A single int32 scatter
   replaces the two-pass (depth, then id) z-buffer and is deterministic by
   construction (depth ties break toward the smaller surfel id; GL's raster
   order is submission-dependent).
2. Winner ids come out of the key by masking — no second pass.
3. Attribute images are per-field gathers at *texel-grid scale*.  Their cost
   scales with the texel count: at QVGA, `index_factor=1` gathers 77k
   elements per field vs 1.23M at the reference's 4.  All consumers
   (association window search, splat prediction, clean redundancy test) are
   generic over the factor.  The shipped default is the reference's
   `index_factor=4` (accuracy-best, ACCURACY.md), whose fuse runs through
   the O(capacity) surfel-major sparse path (fusion/sparse.py) rather than
   this dense pixel-major one; `index_factor=1` is the fast preset.

Trade at factor 1: surfels that project onto the same pixel collapse to the
front-most one, so window searches see at most one candidate per pixel cell
(the reference can discriminate up to 16 sub-pixel candidates).  For
prediction this is exactly the wanted front surface; for association/clean
it slightly coarsens candidate selection (measured: no ATE regression on the
synthetic suites).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.geometry.se3 import se3_inverse

INT_MAX = 2**31 - 1

# Packed (depth << id_bits | id) keys keep the render to ONE scatter, but
# depth gets only (31 - id_bits) bits.  Up to 21 id bits (2M surfels) that is
# >= 10 depth bits ~ 4.4 mm buckets over 4.5 m — finer than the sensor.
# Above it (e.g. the reference-scale 2^23 capacity, GlobalModel.cpp:21-22,
# where packing would leave 256 levels ~ 1.8 cm buckets) the render switches
# to a two-pass z-buffer with EXACT float32 depth ordering (see
# render_texel_images).
PACKED_MAX_ID_BITS = 21


def id_bits_for(capacity: int) -> int:
    b = max(1, math.ceil(math.log2(capacity + 1)))
    assert b < 31, "capacity too large for int32 surfel ids"
    return b


class TexelImages(NamedTuple):
    """Winner-surfel attributes per texel (camera-local frame)."""
    idx: jnp.ndarray     # (Ht, Wt) int32 surfel index, INT_MAX if empty
    has: jnp.ndarray     # (Ht, Wt) bool
    x: jnp.ndarray       # local position
    y: jnp.ndarray
    z: jnp.ndarray
    nx: jnp.ndarray      # local normal
    ny: jnp.ndarray
    nz: jnp.ndarray
    radius: jnp.ndarray
    conf: jnp.ndarray
    init_time: jnp.ndarray
    last_time: jnp.ndarray
    r: jnp.ndarray       # color
    g: jnp.ndarray
    b: jnp.ndarray
    hist: jnp.ndarray    # update-count history (update.vert's vPosition0.w)


class SurfelsLocal(NamedTuple):
    """All surfels transformed into the camera frame (shared by passes)."""
    pos: jnp.ndarray      # (N, 3)
    normal: jnp.ndarray   # (N, 3)
    u4: jnp.ndarray       # (N,) int32 texel column (invalid -> out of range)
    v4: jnp.ndarray
    x4c: jnp.ndarray      # (N,) continuous texel coords (F * x_gl)
    y4c: jnp.ndarray


def project_surfels(smap: SurfelMap, pose: jnp.ndarray,
                    config: SFConfig) -> SurfelsLocal:
    cam = config.camera
    F = config.fusion.index_factor
    T_inv = se3_inverse(pose)
    R, t = T_inv[:3, :3], T_inv[:3, 3]
    local = smap.pos @ R.T + t
    local_nrm = smap.normal @ R.T
    z = local[:, 2]
    safe_z = jnp.where(z == 0.0, 1.0, z)
    x4c = F * (cam.fx * local[:, 0] / safe_z + cam.cx)
    y4c = F * (cam.fy * local[:, 1] / safe_z + cam.cy)
    u4 = jnp.floor(x4c).astype(jnp.int32)
    v4 = jnp.floor(y4c).astype(jnp.int32)
    return SurfelsLocal(pos=local, normal=local_nrm, u4=u4, v4=v4,
                        x4c=x4c, y4c=y4c)


def render_cull(smap: SurfelMap, local: SurfelsLocal, tick: jnp.ndarray,
                config: SFConfig,
                conf_threshold: float | jnp.ndarray = 0.0,
                z_min: float = 0.0,
                time_delta: float | None = None) -> jnp.ndarray:
    """(capacity,) bool — surfels that enter the z-buffer render
    (index_map.vert:48-56 culls).  Shared with the clean pass's free-slot
    allocator, which must never hand out a slot the render may write back."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows4, cols4 = cam.height * F, cam.width * F
    td = fus.time_delta if time_delta is None else time_delta
    z = local.pos[:, 2]
    fresh = (jnp.asarray(tick, jnp.float32) - smap.last_time) <= td
    return (smap.valid & fresh & (z > z_min) & (z <= fus.depth_max)
            & (smap.conf >= conf_threshold)
            & (local.u4 >= 0) & (local.u4 < cols4)
            & (local.v4 >= 0) & (local.v4 < rows4))


def render_texel_images(smap: SurfelMap, local: SurfelsLocal,
                        tick: jnp.ndarray, config: SFConfig,
                        conf_threshold: float | jnp.ndarray = 0.0,
                        z_min: float = 0.0,
                        time_delta: float | None = None,
                        materialize: str = "auto") -> TexelImages:
    """Packed-key z-buffered surfel render + per-field attribute gathers.

    Culls as index_map.vert:48-56 (z in (z_min, maxDepth], fresh within
    timeDelta) plus an optional confidence cull (splat.vert:50).
    `time_delta` overrides the config freshness window (viz passes inf,
    matching the GL draw passes that render the whole map)."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows4, cols4 = cam.height * F, cam.width * F
    S = rows4 * cols4

    ib = id_bits_for(smap.capacity)

    z = local.pos[:, 2]
    ok = render_cull(smap, local, tick, config, conf_threshold, z_min,
                     time_delta)
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)

    # Invalid sources get an out-of-bounds index and mode="drop": XLA skips
    # them entirely, where a sacrificial in-bounds slot would serialize the
    # whole duplicate group (~40% of the scatter cost at steady state).
    flat = jnp.where(ok, local.v4 * cols4 + local.u4, S)

    if ib <= PACKED_MAX_ID_BITS:
        # One scatter-min on packed (quantized depth, id) keys.
        dlevels = (1 << (31 - ib)) - 1
        qd = jnp.clip((z * (dlevels / fus.depth_max)).astype(jnp.int32),
                      0, dlevels)
        key = (qd << ib) | ids
        fb = jnp.full((S,), INT_MAX, jnp.int32).at[flat].min(key, mode="drop")
        has = fb != INT_MAX
        winner = jnp.where(has, fb & ((1 << ib) - 1), INT_MAX)
    else:
        # Large-capacity path: two scatter-mins with EXACT depth ordering.
        # Positive float32 bit patterns are order-isomorphic to int32, so
        # pass 1 min-scatters raw depth bits (culled surfels all have z > 0);
        # pass 2 min-scatters ids restricted to surfels that match their
        # texel's winning depth bit-exactly — deterministic smaller-id
        # tie-break, same semantics as the packed path.
        zq = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.int32)
        zbuf = jnp.full((S,), INT_MAX, jnp.int32).at[flat].min(
            zq, mode="drop")
        win_z = zbuf.at[flat].get(mode="fill", fill_value=INT_MAX)
        flat2 = jnp.where(ok & (zq == win_z), flat, S)
        fb = jnp.full((S,), INT_MAX, jnp.int32).at[flat2].min(
            ids, mode="drop")
        has = fb != INT_MAX
        winner = fb

    stacked = jnp.stack([
        local.pos[:, 0], local.pos[:, 1], local.pos[:, 2],
        local.normal[:, 0], local.normal[:, 1], local.normal[:, 2],
        smap.radius, smap.conf, smap.init_time, smap.last_time,
        smap.color[:, 0], smap.color[:, 1], smap.color[:, 2],
        smap.hist,
    ])

    use_gather = (S <= 2 * smap.capacity if materialize == "auto"
                  else materialize == "gather")
    if use_gather:
        # Texel-count-bound attribute materialization: ONE (14, capacity)
        # gather at the winner ids (TPU gather cost follows the index
        # count, not the row width).  Right whenever the texel grid is no
        # bigger than the map tier (the F=1 default).
        safe = jnp.where(has, winner, 0)
        g = jnp.where(has[None, :], stacked[:, safe], 0.0)

        def I(row):
            return g[row].reshape(rows4, cols4)

        idx_img = winner.reshape(rows4, cols4)
    else:
        # Capacity-bound materialization for super-resolution grids
        # (the reference's FACTOR=4, IndexMap.cpp:21, where S = 16*H*W
        # dwarfs the live map): each surfel re-reads its own texel's
        # winning key (ONE capacity-sized gather) and the winners write
        # their attributes back with ONE wide row-scatter — indexed-op
        # cost stays O(capacity), never O(S).  Same winners, same values.
        win_key = fb.at[flat].get(mode="fill", fill_value=INT_MAX)
        if ib <= PACKED_MAX_ID_BITS:
            won = ok & (win_key == key)
        else:
            won = ok & (win_key == ids)
        tgt = jnp.where(won, flat, S)
        # Ride the id along the one wide f32 scatter bitwise (f32 can't
        # represent ids above 2^24 exactly).
        ids_f = jax.lax.bitcast_convert_type(ids, jnp.float32)
        payload = jnp.concatenate([stacked.T, ids_f[:, None]], axis=1)
        out = jnp.zeros((S, 15), jnp.float32).at[tgt].set(
            payload, mode="drop")

        def I(row):
            return out[:, row].reshape(rows4, cols4)

        has_img = has.reshape(rows4, cols4)
        idx_scat = jax.lax.bitcast_convert_type(out[:, 14], jnp.int32)
        idx_img = jnp.where(has_img, idx_scat.reshape(rows4, cols4),
                            INT_MAX)

    return TexelImages(
        idx=idx_img,
        has=has.reshape(rows4, cols4),
        x=I(0), y=I(1), z=I(2),
        nx=I(3), ny=I(4), nz=I(5),
        radius=I(6), conf=I(7),
        init_time=I(8), last_time=I(9),
        r=I(10), g=I(11), b=I(12),
        hist=I(13),
    )


def window_offsets(F: int) -> range:
    """Texel offsets (relative to the pixel's base texel F*u) covering the
    reference's association/splat search reach of ~±0.5 px around the pixel
    center (data.vert window [4u-2, 4u+5] at F=4)."""
    w = max(1, F // 2)
    return range(-w, w + F)


def phase_decompose(img: jnp.ndarray, F: int) -> jnp.ndarray:
    """(H*F, W*F) -> (F, F, H, W): sub-phase images.

    phase[sv, su][v, u] == img[F*v + sv, F*u + su].  One transpose per field
    replaces per-offset stride-F slices (stride-F lane access relayouts the
    whole image on TPU; this does it once).  At F=1 it is a cheap reshape."""
    H4, W4 = img.shape
    if F == 1:
        return img[None, None]
    return img.reshape(H4 // F, F, W4 // F, F).transpose(1, 3, 0, 2)


def phase_window(phases: jnp.ndarray, dv: int, du: int, F: int) -> jnp.ndarray:
    """Texel (F*v + dv, F*u + du) for every pixel (v, u), any integer
    offsets; out-of-range texels are zero-filled.

    Decomposes the offset into a phase (dv mod F) and a +-1 pixel-block
    shift (dv // F) — the shift is a cheap full-lane pad+slice."""
    sv, bv = dv % F, dv // F
    su, bu = du % F, du // F
    img = phases[sv, su]
    if bv == 0 and bu == 0:
        return img
    H, W = img.shape
    a = max(abs(bv), abs(bu))
    p = jnp.pad(img, a)
    return p[a + bv:a + bv + H, a + bu:a + bu + W]
