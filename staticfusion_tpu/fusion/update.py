"""Fusion pass 2: merge update records into the surfel map.

Reference: `update.vert` — per-surfel log-odds confidence fusion and weighted
averaging of position/color/normal, gated by the radius-growth test
(newRadius < 1.5 * oldRadius); otherwise geometry is kept and only
confidence/history advance.

One fused elementwise pass over the capacity-sized arrays — the GL
transform-feedback buffer swap disappears entirely (functional update).
"""

from __future__ import annotations

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.association import TexelUpdates, UpdateRecords
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.fusion.texelmap import TexelImages


def apply_updates(smap: SurfelMap, upd: UpdateRecords, tick: jnp.ndarray,
                  config: SFConfig) -> SurfelMap:
    del config
    m = upd.has_update & smap.valid

    c_k = jnp.clip(smap.conf, 0.01, 0.99)
    a = jnp.clip(2.0 * upd.conf * upd.conf, 0.01, 0.53)  # update.vert:66-68
    # Log-odds fusion (update.vert:69-71).
    ltm = jnp.log(1.0 / (1.0 - c_k) - 1.0) + jnp.log(a / (1.0 - a))
    c_k1 = 1.0 - 1.0 / (1.0 + jnp.exp(ltm))

    merge = m & (upd.radius < 1.5 * smap.radius)  # update.vert:73
    w_old = smap.hist * c_k
    denom = jnp.maximum(w_old + a, 1e-12)

    def blend(old, new):
        return (w_old[:, None] * old + a[:, None] * new) / denom[:, None]

    new_pos = blend(smap.pos, upd.pos)
    new_color = blend(smap.color, upd.color)
    nr = blend(smap.normal, upd.normal)
    nr = nr / jnp.maximum(jnp.linalg.norm(nr, axis=-1, keepdims=True), 1e-12)
    new_radius = (w_old * smap.radius + a * upd.radius) / denom

    sel3 = lambda cond, new, old: jnp.where(cond[:, None], new, old)
    pos = sel3(merge, new_pos, smap.pos)
    color = sel3(merge, new_color, smap.color)
    normal = sel3(merge, nr, smap.normal)
    radius = jnp.where(merge, new_radius, smap.radius)

    conf = jnp.where(m, c_k1, smap.conf)
    hist = jnp.where(m, smap.hist + 1.0, smap.hist)
    last_time = jnp.where(m, jnp.asarray(tick, jnp.float32), smap.last_time)

    return smap._replace(pos=pos, conf=conf, color=color, hist=hist,
                         normal=normal, radius=radius, last_time=last_time)


def merge_texels(tex: TexelImages, upd: TexelUpdates, tick: jnp.ndarray,
                 config: SFConfig) -> TexelImages:
    """update.vert in *texel space*: the winner-surfel attribute images merge
    with the texel-routed update records elementwise — no slot gathers or
    scatters.  Positions/normals stay camera-local (the affine merge commutes
    with the rigid transform); the write-back converts to world once.

    Same math as `apply_updates` (log-odds confidence fusion, radius-growth
    merge gate), verified equivalent by tests/test_fusion.py."""
    del config
    m = upd.has & tex.has

    c_k = jnp.clip(tex.conf, 0.01, 0.99)
    a = jnp.clip(2.0 * upd.conf * upd.conf, 0.01, 0.53)  # update.vert:66-68
    ltm = jnp.log(1.0 / (1.0 - c_k) - 1.0) + jnp.log(a / (1.0 - a))
    c_k1 = 1.0 - 1.0 / (1.0 + jnp.exp(ltm))              # update.vert:69-71

    merge = m & (upd.radius < 1.5 * tex.radius)           # update.vert:73
    w_old = tex.hist * c_k
    denom = jnp.maximum(w_old + a, 1e-12)

    def blend(old, new):
        return jnp.where(merge, (w_old * old + a * new) / denom, old)

    bx = blend(tex.nx, upd.normal[..., 0])
    by = blend(tex.ny, upd.normal[..., 1])
    bz = blend(tex.nz, upd.normal[..., 2])
    nn = jnp.maximum(jnp.sqrt(bx * bx + by * by + bz * bz), 1e-12)
    # Renormalize only on the merge branch (apply_updates parity).
    nx = jnp.where(merge, bx / nn, tex.nx)
    ny = jnp.where(merge, by / nn, tex.ny)
    nz = jnp.where(merge, bz / nn, tex.nz)

    tickf = jnp.asarray(tick, jnp.float32)
    return tex._replace(
        x=blend(tex.x, upd.pos[..., 0]),
        y=blend(tex.y, upd.pos[..., 1]),
        z=blend(tex.z, upd.pos[..., 2]),
        nx=nx, ny=ny, nz=nz,
        radius=blend(tex.radius, upd.radius),
        conf=jnp.where(m, c_k1, tex.conf),
        hist=jnp.where(m, tex.hist + 1.0, tex.hist),
        last_time=jnp.where(m, tickf, tex.last_time),
        r=blend(tex.r, upd.color[..., 0]),
        g=blend(tex.g, upd.color[..., 1]),
        b=blend(tex.b, upd.color[..., 2]),
    )
