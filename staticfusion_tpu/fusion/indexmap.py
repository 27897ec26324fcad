"""Index-map predictive render: every surfel as a depth-tested point at 4x
resolution, for data association and cleaning.

Reference: `IndexMap::predictIndices` (IndexMap.cpp:127-185) +
`index_map.vert/.frag` — transform by pose^{-1}, project with FACTOR-scaled
intrinsics, z-buffered write of the surfel id.

TPU design: the rasterizer becomes `ops.zbuffer.zbuffer_scatter` over the
flattened 4x grid (deterministic min-depth, min-id ties).  Instead of
materializing vertConf/colorTime/normRad textures, we keep the winning surfel
index per texel and gather attributes on demand — the same memory the GL
textures would cost is saved, and XLA fuses the gathers into consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.geometry.se3 import se3_inverse
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.ops.zbuffer import INVALID, zbuffer_scatter


class IndexMapRender(NamedTuple):
    winner: jnp.ndarray       # (H*F, W*F) int32 surfel index, INVALID if empty
    local_pos: jnp.ndarray    # (N, 3) all surfels in camera frame
    local_normal: jnp.ndarray  # (N, 3)

    def has_surfel(self) -> jnp.ndarray:
        return self.winner != INVALID

    def safe_index(self) -> jnp.ndarray:
        return jnp.where(self.winner != INVALID, self.winner, 0)


def predict_indices(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                    config: SFConfig) -> IndexMapRender:
    """Render surfel ids into the 4x grid (index_map.vert:39-64).

    Culls: local z outside (0, maxDepth], stale (tick - last_time > timeDelta),
    invalid slots."""
    cam = config.camera
    F = config.fusion.index_factor
    rows4, cols4 = cam.height * F, cam.width * F

    T_inv = se3_inverse(pose)
    R, t = T_inv[:3, :3], T_inv[:3, 3]
    local = smap.pos @ R.T + t
    local_nrm = smap.normal @ R.T

    z = local[:, 2]
    fresh = (tick - smap.last_time) <= config.fusion.time_delta
    ok = smap.valid & fresh & (z > 0.0) & (z <= config.fusion.depth_max)

    safe_z = jnp.where(z == 0.0, 1.0, z)
    # GL continuous coords with FACTOR-scaled intrinsics; pixel = floor.
    u = jnp.floor(F * (cam.fx * local[:, 0] / safe_z + cam.cx)).astype(jnp.int32)
    v = jnp.floor(F * (cam.fy * local[:, 1] / safe_z + cam.cy)).astype(jnp.int32)
    ok = ok & (u >= 0) & (u < cols4) & (v >= 0) & (v < rows4)

    flat = v * cols4 + u
    winner, _ = zbuffer_scatter(flat, z, ok, rows4 * cols4)
    return IndexMapRender(winner=winner.reshape(rows4, cols4),
                          local_pos=local, local_normal=local_nrm)
