"""Static/dynamic cluster segmentation.

Reference: SegmentationBackground.cpp — `computeSegPrior` (53-103),
`buildSystemSegm` (105-130), `solveSegmIteration` (133-174),
`buildSegmImage` (176-197).

The reference assembles a tall (K + #connections) x K least-squares system
and forms AtA/AtB.  We assemble the K x K normal equations directly:
the connection rows contribute (2*lambda_reg)^2 * GraphLaplacian, the data/
prior rows a diagonal — algebraically identical, no dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig, NUM_CLUSTERS
from staticfusion_tpu.ops.smallsolve import spd_solve_fast


class SegPrior(NamedTuple):
    b_prior: jnp.ndarray    # (K,)
    lambda_t_w: jnp.ndarray  # (K,) per-cluster trust


def compute_seg_prior(onehot: jnp.ndarray, null: jnp.ndarray,
                      ddt: jnp.ndarray, config: SFConfig) -> SegPrior:
    """Per-cluster temporal prior b_prior = mean(1 - kz*|ddt|) over non-null
    pixels; clusters with <10% valid depth get prior -1 and trust 0.1
    (SegmentationBackground.cpp:53-103).  `onehot` is the (N, K+1) cluster
    one-hot (irls.cluster_onehot) — the three per-cluster reductions are
    skinny MXU matmuls instead of scatters."""
    kz = config.solver.kz
    k = NUM_CLUSTERS
    oh = onehot[:, :k]
    nonnull = (~null.ravel()).astype(jnp.float32)
    contrib = nonnull * (1.0 - kz * jnp.abs(ddt.ravel()))

    size = jnp.sum(oh, axis=0)
    nn = nonnull @ oh
    b_sum = contrib @ oh

    ratio = jnp.where(size > 0, nn / jnp.maximum(size, 1.0), 0.0)
    b_mean = jnp.clip(b_sum / jnp.maximum(nn, 1.0), -1.0, 2.0)
    starved = (size > 0) & (ratio < 0.1)
    healthy = (size > 0) & (ratio >= 0.1)
    b_prior = jnp.where(starved, -1.0, jnp.where(healthy, b_mean, 0.0))
    lambda_t_w = jnp.where(starved, 0.1, jnp.where(healthy, ratio, 0.0))
    return SegPrior(b_prior=b_prior, lambda_t_w=lambda_t_w)


def reg_normal_matrix(connectivity: jnp.ndarray, lambda_reg: float) -> jnp.ndarray:
    """(2*lambda_reg)^2 * Laplacian of the off-diagonal connectivity graph —
    the normal-equation contribution of the spatial regularization rows
    (SegmentationBackground.cpp:119-129)."""
    w = 2.0 * lambda_reg
    adj = connectivity & (~jnp.eye(NUM_CLUSTERS, dtype=bool))
    a = adj.astype(jnp.float32)
    deg = jnp.sum(a, axis=1)
    return (w * w) * (jnp.diag(deg) - a)


def solve_segm_iteration(b_segm: jnp.ndarray,
                         aver_res_label: jnp.ndarray,
                         aver_res_overall: jnp.ndarray,
                         prior: SegPrior,
                         reg_ata: jnp.ndarray,
                         config: SFConfig,
                         kb=None) -> jnp.ndarray:
    """One coupled segmentation solve (SegmentationBackground.cpp:133-174).

    Data term: log(1+(kb*r̄/(kc*r̄_all))^2) − log(1+(r̄_l/(kc*r̄_all))^2),
    temporal prior 2*lambda_prior*lambda_t*b_prior; K x K LDLT; clamp [-1,2].
    `kb` may be a traced scalar (the mains schedule it: 1.05 warm-up, 1.5
    steady; StaticFusion-datasets.cpp:156-165)."""
    s = config.solver
    if kb is None:
        kb = s.kb
    repr_res = jnp.maximum(0.001, aver_res_overall)
    safe_all = jnp.maximum(aver_res_overall, 1e-20)
    mult_res = 1.0 / (s.kc_cauchy * safe_all)
    fixed_term = jnp.log1p((kb * repr_res * mult_res) ** 2)

    trusted = prior.lambda_t_w > 0.1
    dataterm = fixed_term - jnp.log1p((aver_res_label * mult_res) ** 2)
    a_diag = jnp.where(trusted, 2.0 * prior.lambda_t_w * s.lambda_prior,
                       2.0 * prior.lambda_t_w)
    b_rhs = jnp.where(
        trusted,
        dataterm + 2.0 * s.lambda_prior * prior.lambda_t_w * prior.b_prior,
        2.0 * prior.lambda_t_w * prior.b_prior,
    )

    ata = jnp.diag(a_diag * a_diag) + reg_ata
    atb = a_diag * b_rhs
    del b_segm  # the solve is independent of the previous iterate
    sol = spd_solve_fast(ata, atb, ridge=1e-6)  # ridge covers empty clusters
    return jnp.clip(sol, -1.0, 2.0)


def build_segm_image(labels_full: jnp.ndarray, b_segm: jnp.ndarray,
                     per_cluster_residual: jnp.ndarray,
                     config: SFConfig) -> jnp.ndarray:
    """Per-pixel static probability (SegmentationBackground.cpp:176-197):
    clamp(b_segm[label], 0, 1); invalid-label pixels are static (1); clusters
    whose 5-frame average residual is < rescue threshold are pushed toward
    static: b := max(b, 1-b).  NaN per-cluster residuals (not yet buffered)
    compare false, matching the reference."""
    k = NUM_CLUSTERS
    b_ext = jnp.concatenate([jnp.clip(b_segm, 0.0, 1.0), jnp.ones((1,))])
    lbl = jnp.clip(labels_full, 0, k)
    b_img = b_ext[lbl]
    res_ext = jnp.concatenate([per_cluster_residual, jnp.array([jnp.nan])])
    rescue = res_ext[lbl] < config.rescue_residual_threshold
    b_img = jnp.where(rescue & (labels_full < k),
                      jnp.maximum(b_img, 1.0 - b_img), b_img)
    return b_img
