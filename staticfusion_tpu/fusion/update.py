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
from staticfusion_tpu.fusion.association import UpdateRecords
from staticfusion_tpu.fusion.surfels import SurfelMap


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
