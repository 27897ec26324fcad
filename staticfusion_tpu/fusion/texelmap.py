"""Texel-space attribute images: the central TPU data structure of the
fusion backend.

The reference renders surfels into 4x-resolution id/vertConf/colorTime/
normalRad textures and then samples them per pixel/per surfel
(IndexMap.cpp:127-185, data.vert, copy_unstable.vert).  On TPU, per-element
gathers *inside fused loops* serialize catastrophically (measured ~70 ms per
(1M,9) gather vs 0.05 ms standalone), so the design inverts:

1. one deterministic z-buffer scatter picks the winning surfel per texel;
2. one packed row-gather materializes ALL winner attributes as images;
3. every consumer (association window search, splat prediction, clean
   redundancy test) becomes strided slices / shifted stencils over those
   images — pure VPU code with zero per-element gathers.

This matches GL's dataflow more closely than the gather version did: the GL
textures *are* these images.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.geometry.se3 import se3_inverse
from staticfusion_tpu.ops.zbuffer import INVALID, zbuffer_scatter


class TexelImages(NamedTuple):
    """Winner-surfel attributes per 4x texel (camera-local frame)."""
    idx: jnp.ndarray     # (H4, W4) int32 surfel index, INVALID if empty
    has: jnp.ndarray     # (H4, W4) bool
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


class SurfelsLocal(NamedTuple):
    """All surfels transformed into the camera frame (shared by passes)."""
    pos: jnp.ndarray      # (N, 3)
    normal: jnp.ndarray   # (N, 3)
    u4: jnp.ndarray       # (N,) int32 4x texel column (invalid -> -1)
    v4: jnp.ndarray
    x4c: jnp.ndarray      # (N,) continuous 4x coords (4 * x_gl)
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


def render_texel_images(smap: SurfelMap, local: SurfelsLocal,
                        tick: jnp.ndarray, config: SFConfig,
                        conf_threshold: float | jnp.ndarray = 0.0,
                        z_min: float = 0.0) -> TexelImages:
    """Z-buffered surfel-id render + packed attribute gather.

    Culls as index_map.vert:48-56 (z in (z_min, maxDepth], fresh within
    timeDelta) plus an optional confidence cull (splat.vert:50 uses one for
    combinedPredict)."""
    cam = config.camera
    fus = config.fusion
    F = fus.index_factor
    rows4, cols4 = cam.height * F, cam.width * F

    z = local.pos[:, 2]
    fresh = (jnp.asarray(tick, jnp.float32) - smap.last_time) <= fus.time_delta
    ok = (smap.valid & fresh & (z > z_min) & (z <= fus.depth_max)
          & (smap.conf >= conf_threshold)
          & (local.u4 >= 0) & (local.u4 < cols4)
          & (local.v4 >= 0) & (local.v4 < rows4))

    flat = local.v4 * cols4 + local.u4
    winner, _ = zbuffer_scatter(flat, z, ok, rows4 * cols4)
    has = winner != INVALID
    safe = jnp.where(has, winner, 0)

    # Per-field flat gathers: full-lane (N,) -> (H4*W4,) reads instead of a
    # packed (N, 13) row-gather whose minor dim pads to 128 lanes.
    def I(field):
        return jnp.where(has, field[safe], 0.0).reshape(rows4, cols4)

    return TexelImages(
        idx=winner.reshape(rows4, cols4),
        has=has.reshape(rows4, cols4),
        x=I(local.pos[:, 0]), y=I(local.pos[:, 1]), z=I(local.pos[:, 2]),
        nx=I(local.normal[:, 0]), ny=I(local.normal[:, 1]),
        nz=I(local.normal[:, 2]),
        radius=I(smap.radius), conf=I(smap.conf),
        init_time=I(smap.init_time), last_time=I(smap.last_time),
        r=I(smap.color[:, 0]), g=I(smap.color[:, 1]), b=I(smap.color[:, 2]),
    )


def phase_decompose(img: jnp.ndarray, F: int) -> jnp.ndarray:
    """(H*F, W*F) -> (F, F, H, W): sub-phase images.

    phase[sv, su][v, u] == img[F*v + sv, F*u + su].  One transpose per field
    replaces per-offset stride-F slices (stride-F lane access relayouts the
    whole image on TPU; this does it once)."""
    H4, W4 = img.shape
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
