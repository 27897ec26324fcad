"""Joint odometry + segmentation IRLS solver.

Reference: `solveOdometryAndSegmJoint` (FrontEnd.cpp:513-692),
`filterEstimateAndComputeT` (FrontEnd.cpp:713-772).

Design: the dense 2N x 6 Jacobian never materializes as pixel loops — the
photometric and geometric rows (FrontEnd.cpp:550-585) are built as two
(rows*cols, 6) arrays in one fused elementwise pass; invalid pixels carry
zero pre-weights so their rows vanish without masking.  Each IRLS iteration
is two skinny matmuls (A^T W A, A^T W b) on the MXU followed by a 6x6 solve,
alternating with the 24x24 segmentation solve — the paper's core coupling.
The data-dependent convergence break becomes a `done` mask in a fori_loop.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig, NUM_CLUSTERS
from staticfusion_tpu.ops.derivatives import Derivatives, InterCoords, PreWeights
from staticfusion_tpu.ops.smallsolve import spd_inverse_fast, spd_solve_fast
from staticfusion_tpu.solver.segmentation import SegPrior, solve_segm_iteration


def cluster_onehot(labels: jnp.ndarray) -> jnp.ndarray:
    """(N, K+1) float one-hot of the flattened cluster labels (column K =
    invalid).  Per-cluster reductions and b_segm broadcasts become skinny
    matmuls on the MXU instead of scatter/gather — the TPU replacement for
    the reference's per-pixel label loops (FrontEnd.cpp:650-667)."""
    flat = jnp.clip(labels.ravel(), 0, NUM_CLUSTERS).astype(jnp.int32)
    return (flat[:, None] == jnp.arange(NUM_CLUSTERS + 1)[None, :]).astype(
        jnp.float32)


class JacobianSystem(NamedTuple):
    A_cT: jnp.ndarray  # (6, N) photometric rows, lane-major
    B_c: jnp.ndarray   # (N,)
    A_dT: jnp.ndarray  # (6, N) geometric rows, lane-major
    B_d: jnp.ndarray   # (N,)
    labels: jnp.ndarray  # (N,) int32 cluster labels clipped to [0, K]
    onehot: jnp.ndarray  # (N, K+1) float cluster one-hot (col K = invalid)
    cluster_counts: jnp.ndarray  # (K,) pixels per cluster
    valid_count: jnp.ndarray  # scalar — number of valid pixels


class IRLSResult(NamedTuple):
    twist: jnp.ndarray     # (6,) level solution
    est_cov: jnp.ndarray   # (6, 6) covariance estimate
    b_segm: jnp.ndarray    # (K,) cluster static scores
    aver_res: jnp.ndarray  # scalar final average residual


def build_jacobian(inter: InterCoords, deriv: Derivatives, w: PreWeights,
                   labels: jnp.ndarray, onehot: jnp.ndarray,
                   config: SFConfig) -> JacobianSystem:
    """Photometric + geometric rows of the range/optical-flow constraint
    (FrontEnd.cpp:537-586) for twist xi = (vx, vy, vz, wx, wy, wz).

    Rows are built lane-major (6, N): the per-pixel axis stays the 128-lane
    axis through every downstream matmul, and the fused TPU kernel
    (kernels/irls_pallas.py) consumes it without a relayout."""
    rows_i, cols_i = inter.depth.shape
    f_inv = float(cols_i) / (2.0 * math.tan(0.5 * config.camera.fovh))

    d = inter.depth
    inv_d = jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), 0.0)
    x, y = inter.xx, inter.yy

    def rows6(du, dv, tw, geometric):
        dy = du * f_inv * inv_d
        dz = dv * f_inv * inv_d
        g = 1.0 if geometric else 0.0
        a0 = tw * (-dy)
        a1 = tw * (-dz)
        a2 = tw * (g + dy * x * inv_d + dz * y * inv_d)
        a3 = tw * (g * y + dy * inv_d * y * x + dz * (y * y * inv_d + d))
        a4 = tw * (-g * x - dy * (x * x * inv_d + d) - dz * inv_d * y * x)
        a5 = tw * (dy * y - dz * x)
        return jnp.stack([a0.ravel(), a1.ravel(), a2.ravel(),
                          a3.ravel(), a4.ravel(), a5.ravel()], axis=0)

    twc = w.weights_c * config.solver.k_photometric_res
    twd = w.weights_d
    A_cT = rows6(deriv.dcu, deriv.dcv, twc, geometric=False)
    B_c = (twc * (-deriv.dct)).ravel()
    A_dT = rows6(deriv.ddu, deriv.ddv, twd, geometric=True)
    B_d = (twd * (-deriv.ddt)).ravel()

    return JacobianSystem(
        A_cT=A_cT, B_c=B_c, A_dT=A_dT, B_d=B_d,
        labels=jnp.clip(labels.ravel(), 0, NUM_CLUSTERS).astype(jnp.int32),
        onehot=onehot,
        cluster_counts=jnp.sum(onehot[:, :NUM_CLUSTERS], axis=0),
        valid_count=jnp.sum(inter.valid.astype(jnp.float32)),
    )


def _normal_equations(A_cT, B_c, A_dT, B_d, wc, wd):
    """AtA, AtB with per-row IRLS weights (already including b_segm)."""
    Awc = A_cT * wc[None, :]
    Awd = A_dT * wd[None, :]
    AtA = (jnp.einsum("in,jn->ij", Awc, Awc, preferred_element_type=jnp.float32)
           + jnp.einsum("in,jn->ij", Awd, Awd, preferred_element_type=jnp.float32))
    AtB = Awc @ (wc * B_c) + Awd @ (wd * B_d)
    return AtA, AtB


def solve_irls(sys: JacobianSystem, b_segm0: jnp.ndarray, prior: SegPrior,
               reg_ata: jnp.ndarray, config: SFConfig, kb=None) -> IRLSResult:
    """Backend dispatch: the fused Pallas iteration kernel on TPU
    (kernels/irls_pallas.py — one kernel launch per IRLS iteration), the
    XLA op-soup formulation elsewhere (CPU tests, GSPMD-sharded solves)."""
    if config.solver.fused_irls and jax.default_backend() == "tpu":
        from staticfusion_tpu.kernels.irls_pallas import solve_irls_fused
        return solve_irls_fused(sys, b_segm0, prior, reg_ata, config, kb=kb)
    return solve_irls_xla(sys, b_segm0, prior, reg_ata, config, kb=kb)


def solve_irls_xla(sys: JacobianSystem, b_segm0: jnp.ndarray, prior: SegPrior,
                   reg_ata: jnp.ndarray, config: SFConfig,
                   kb=None) -> IRLSResult:
    """The coupled IRLS loop (FrontEnd.cpp:593-689)."""
    s = config.solver
    k = NUM_CLUSTERS
    n2 = jnp.maximum(2.0 * sys.valid_count, 1.0)

    res_c0, res_d0 = -sys.B_c, -sys.B_d
    aver_res0 = (jnp.sum(jnp.abs(res_c0)) + jnp.sum(jnp.abs(res_d0))) / n2

    b_ext = lambda b: jnp.concatenate([b, jnp.ones((1,), b.dtype)])
    AtA0 = jnp.eye(6)

    def cond(carry):
        (i, var, prev_sol, b_segm, res_c, res_d, aver_res, AtA_last,
         done) = carry
        return (i < s.max_iter_irls) & ~done

    def body(carry):
        (i, var, prev_sol, b_segm, res_c, res_d, aver_res, AtA_last,
         done) = carry

        inv_c = 1.0 / (s.kc_cauchy * jnp.maximum(aver_res, 1e-20))
        b_weight = sys.onehot @ jnp.clip(b_ext(b_segm), 0.0, 1.0)
        wc = b_weight * jnp.sqrt(1.0 / (1.0 + (res_c * inv_c) ** 2))
        wd = b_weight * jnp.sqrt(1.0 / (1.0 + (res_d * inv_c) ** 2))

        AtA, AtB = _normal_equations(sys.A_cT, sys.B_c, sys.A_dT, sys.B_d,
                                     wc, wd)
        new_var = spd_solve_fast(AtA, AtB, ridge=1e-12)

        new_res_c = new_var @ sys.A_cT - sys.B_c
        new_res_d = new_var @ sys.A_dT - sys.B_d

        # Per-cluster average residuals (FrontEnd.cpp:650-667); the +1 pixel
        # and /2 factors replicate the reference's accounting exactly.
        ress = jnp.abs(new_res_c) + jnp.abs(new_res_d)
        sums = (ress @ sys.onehot)[:k]
        aver_res_label = sums / (2.0 * (sys.cluster_counts + 1.0))
        aver_res_old = aver_res
        new_aver_res = jnp.sum(sums) / n2

        new_b = solve_segm_iteration(b_segm, aver_res_label, aver_res_old,
                                     prior, reg_ata, config, kb=kb)

        # Convergence break AFTER the update (FrontEnd.cpp:676-683): the
        # converged iteration's values are kept, the loop just stops paying
        # for the remaining iterations.
        delta = jnp.max(jnp.abs(prev_sol - new_var))
        new_done = delta < s.irls_delta_threshold

        return (i + 1, new_var, new_var, new_b, new_res_c, new_res_d,
                new_aver_res, AtA, new_done)

    init = (jnp.int32(0), jnp.zeros((6,)), jnp.zeros((6,)), b_segm0,
            res_c0, res_d0, aver_res0, AtA0, jnp.asarray(False))
    _, var, _, b_segm, res_c, res_d, aver_res, AtA, _ = jax.lax.while_loop(
        cond, body, init)

    res_sq = jnp.sum(res_c * res_c) + jnp.sum(res_d * res_d)
    est_cov = spd_inverse_fast(AtA, ridge=1e-12) * res_sq  # FrontEnd.cpp:689
    return IRLSResult(twist=var, est_cov=est_cov, b_segm=b_segm,
                      aver_res=aver_res)


def motion_filter(twist: jnp.ndarray, est_cov: jnp.ndarray,
                  twist_old: jnp.ndarray, accumulated_twist: jnp.ndarray,
                  level: int, config: SFConfig) -> jnp.ndarray:
    """Low-pass the level twist in the eigenbasis of the covariance
    (FrontEnd.cpp:713-756). `accumulated_twist` = log(T_odometry) so far.

    The reference eigendecomposes C = est_cov and blends per eigenmode with
    weight cf*lambda_i + df.  That map is the degree-1 rational matrix
    function x -> (x + (cf*C + df)x_old)/(1 + cf*C + df), so it collapses to
    ONE 6x6 SPD solve — identical result, no eigendecomposition:
        M = (1+df) I + cf C;  kai_fil = M^{-1} (kai + (cf C + df I) kai_old).
    """
    s = config.solver
    kai_loc_sub = twist_old - accumulated_twist
    cf = s.previous_speed_eig_weight * math.exp(-level)
    df = s.previous_speed_const_weight * math.exp(-level)
    eye = jnp.eye(6, dtype=est_cov.dtype)
    M = (1.0 + df) * eye + cf * est_cov
    rhs = twist + cf * (est_cov @ kai_loc_sub) + df * kai_loc_sub
    return spd_solve_fast(M, rhs)
