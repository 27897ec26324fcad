"""Coarse-to-fine driver for the joint odometry/segmentation solver.

Reference: `runSolver` (FrontEnd.cpp:1071-1146).

The pyramid levels have different static shapes, so the coarse-to-fine loop
is unrolled at trace time (one fused XLA subgraph per level); the
`max_iter_per_level` inner iterations share shapes and run as a
`lax.fori_loop` whose early exit (||xi_level|| < 0.04, FrontEnd.cpp:1130) is
a `done` mask.  The whole solve is a pure function
(pyramids, labels, twist_old) -> (T_odometry, b_segm, ...), jittable as one
program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.geometry import se3
from staticfusion_tpu.ops.derivatives import (calculate_coords,
                                              calculate_derivatives,
                                              compute_weights)
from staticfusion_tpu.ops.pyramid import Pyramid, PyramidLevel
from staticfusion_tpu.ops.warp import (WarpedImages, warp_images_gather,
                                       warp_images_inverse)
from staticfusion_tpu.solver.clustering import Clustering, cluster_frame
from staticfusion_tpu.solver.irls import (build_jacobian, cluster_onehot,
                                          motion_filter, solve_irls)
from staticfusion_tpu.solver.segmentation import (compute_seg_prior,
                                                  reg_normal_matrix)


class SolverResult(NamedTuple):
    T_odometry: jnp.ndarray       # (4,4) frame-to-frame transform
    twist_odometry: jnp.ndarray   # (6,) log of T_odometry
    twist_old_next: jnp.ndarray   # (6,) velocity rotated into the new frame
    b_segm: jnp.ndarray           # (K,) cluster static scores
    clustering: Clustering
    ddt_full: jnp.ndarray         # (rows, cols) final-level depth residual


def _solve_at_level(cur: PyramidLevel, warped: WarpedImages,
                    labels: jnp.ndarray, onehot: jnp.ndarray, b_segm,
                    reg_ata, level_idx: int,
                    T_odo, twist_old, config: SFConfig, kb=None):
    """One warp-free solver iteration at a level; returns updated state."""
    inter = calculate_coords(cur, warped)
    deriv = calculate_derivatives(inter, cur, warped)
    w = compute_weights(deriv, inter.valid)
    prior = compute_seg_prior(onehot, inter.null, deriv.ddt, config)
    sys = build_jacobian(inter, deriv, w, labels, onehot, config)

    # At the coarsest level the segmentation restarts from the prior
    # (FrontEnd.cpp:604); later levels refine the carried solution.
    b_init = prior.b_prior if level_idx == 0 else b_segm
    result = solve_irls(sys, b_init, prior, reg_ata, config, kb=kb)

    twist = result.twist
    if config.solver.use_motion_filter:
        twist = motion_filter(twist, result.est_cov, twist_old,
                              se3.se3_log(T_odo), level_idx, config)
    T_new = se3.se3_exp(twist) @ T_odo
    converged = jnp.linalg.norm(twist) < config.solver.level_twist_convergence
    return T_new, result.b_segm, converged, deriv.ddt


def run_solver(cur_pyr: Pyramid, pred_pyr: Pyramid, twist_old: jnp.ndarray,
               config: SFConfig, kb=None,
               T_init: jnp.ndarray | None = None) -> SolverResult:
    """Full per-frame solve: clustering + coarse-to-fine joint IRLS.

    `T_init` seeds the coarse-to-fine iteration (default identity — the
    tracking case).  Wide-baseline relocalization pairs (keyframe
    verification, pipeline/keyframes.py) pass the chain-predicted
    relative pose: a multi-meter baseline is far outside the dense
    solver's zero-init convergence basin, and in self-similar scenes the
    wrong basin can even look depth-consistent (the corridor-aliasing
    failure, ACCURACY.md round 4)."""
    clustering = cluster_frame(cur_pyr, config)
    reg_ata = reg_normal_matrix(clustering.connectivity,
                                config.solver.lambda_reg)
    fovh = config.camera.fovh
    n_levels = config.ctf_levels

    T_odo = jnp.eye(4) if T_init is None else T_init
    b_segm = jnp.full((config.num_clusters,), 0.5)
    ddt_full = jnp.zeros(cur_pyr[0].depth.shape)

    for level_idx in range(n_levels):
        image_level = n_levels - 1 - level_idx
        cur = cur_pyr[image_level]
        pred = pred_pyr[image_level]
        labels = clustering.labels[image_level]
        onehot = cluster_onehot(labels)
        done = jnp.asarray(False)

        def iteration(carry, first: bool):
            k, T_odo, b_segm, done, ddt = carry
            if first and T_init is None:
                # First coarse iteration reuses the prediction directly as the
                # "warped" view (FrontEnd.cpp:1103-1110) — only valid when
                # the iteration starts at identity.
                warped = WarpedImages(depth=pred.depth, intensity=pred.intensity,
                                      xx=pred.xx, yy=pred.yy)
            else:
                warped = warp_images_gather(pred, cur.depth, T_odo, fovh)
            T_new, b_new, converged, ddt_new = _solve_at_level(
                cur, warped, labels, onehot, b_segm, reg_ata, level_idx,
                T_odo, twist_old, config, kb=kb)
            # Early exit (FrontEnd.cpp:1130-1131) is a real while-loop break:
            # the converged iteration's values are kept.
            return (k + 1, T_new, b_new, converged, ddt_new)

        ddt_lvl = jnp.zeros(cur.depth.shape)
        carry = (jnp.int32(0), T_odo, b_segm, done, ddt_lvl)
        if level_idx == 0:
            carry = iteration(carry, first=True)
        carry = jax.lax.while_loop(
            lambda c: (c[0] < config.solver.max_iter_per_level) & ~c[3],
            lambda c: iteration(c, first=False), carry)
        _, T_odo, b_segm, _, ddt_lvl = carry
        if image_level == 0:
            ddt_full = ddt_lvl

    twist_odo = se3.se3_log(T_odo)
    R = T_odo[:3, :3]
    Rinv = R.T
    twist_old_next = jnp.concatenate(
        [Rinv @ twist_odo[:3], Rinv @ twist_odo[3:]])

    return SolverResult(T_odometry=T_odo, twist_odometry=twist_odo,
                        twist_old_next=twist_old_next, b_segm=b_segm,
                        clustering=clustering, ddt_full=ddt_full)
