"""Index-map predictive render (compat shim over texelmap).

Reference: `IndexMap::predictIndices` (IndexMap.cpp:127-185) +
`index_map.vert/.frag` — transform by pose^{-1}, project with FACTOR-scaled
intrinsics, z-buffered write of the surfel id.

The actual machinery lives in `fusion/texelmap.py` (which also materializes
the vertConf/colorTime/normalRad textures as attribute images); this module
keeps the reference-shaped entry point.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.fusion.texelmap import (SurfelsLocal, TexelImages,
                                              project_surfels,
                                              render_texel_images)


def predict_indices(smap: SurfelMap, pose: jnp.ndarray, tick: jnp.ndarray,
                    config: SFConfig) -> Tuple[TexelImages, SurfelsLocal]:
    """Render surfel ids + attributes into the 4x texel grid."""
    local = project_surfels(smap, pose, config)
    tex = render_texel_images(smap, local, tick, config)
    return tex, local
