"""StaticFusion-TPU: a TPU-native dense RGB-D SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of StaticFusion
(Scona et al., ICRA 2018): joint camera odometry and static/dynamic
segmentation against a predicted view of a surfel map, with background-only
fusion, expressed as a single jitted pure function per frame.

Layout (mirrors the reference's five-layer architecture, SURVEY.md section 1):
  geometry/  SE(3) + camera models                    (reference: Eigen + MRPT poses)
  ops/       dense image ops: pyramid, warp, filters  (reference: FrontEnd.cpp loops + GLSL)
  solver/    clustering, segmentation, joint IRLS     (reference: FrontEnd/KMeans/SegmentationBackground.cpp)
  fusion/    surfel map backend                       (reference: GlobalModel/IndexMap/FillIn + shaders)
  pipeline/  per-frame step + host driver             (reference: StaticFusion-*.cpp mains)
  parallel/  mesh/sharding + distributed layers       (no reference counterpart; TPU-native)
  io/        datasets, trajectories, PLY, native loader
  utils/     metrics, checkpointing, profiling
  kernels/   Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compile cache: the per-frame program is large and XLA compiles
# are slow on small hosts / tunneled TPUs.  Honored only if the user hasn't
# configured one already.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/staticfusion_tpu_xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# SLAM numerics are fp32-sensitive (6x6/24x24 normal equations, SE(3) chains).
# JAX's default matmul precision lowers f32 matmuls (bf16x6-style passes) —
# a 3x3 K@K already loses ~1e-3.  All our matmul FLOPs are tiny (the hot path
# is VPU/elementwise + scatters), so full-precision matmuls cost nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

from staticfusion_tpu.config import SFConfig, solver_preset_ctor, solver_preset_datasets

__all__ = ["SFConfig", "solver_preset_ctor", "solver_preset_datasets", "__version__"]
