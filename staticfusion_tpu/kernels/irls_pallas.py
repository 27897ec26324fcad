"""Fused Pallas TPU kernel: the ENTIRE coupled IRLS loop in one launch.

The XLA formulation of the IRLS solve (solver/irls.py `solve_irls_xla`,
reference FrontEnd.cpp:593-689) runs a `lax.while_loop` whose per-iteration
sequencing overhead on this TPU is ~80 us — for a <=6-iteration loop called
10-15 times per frame that alone is ~2 ms/frame, dwarfing the arithmetic
(the per-iteration math at QVGA is ~25 us of matmuls).  This kernel runs the
whole loop as one `pallas_call` over grid (max_iter, 2, tiles):

  pass (i, 0, t): residuals from the carried twist, Cauchy x segmentation
    weights, normal equations accumulated across tiles in VMEM scratch,
    6x6 in-kernel Cholesky solve -> new twist;
  pass (i, 1, t): residuals from the NEW twist, per-cluster residual sums
    (an on-the-fly one-hot matmul over the label row), the 24x24
    segmentation solve (SegmentationBackground.cpp:133-174), the
    convergence update.

The reference's data-dependent early exit (FrontEnd.cpp:676-683) is an SMEM
`done` flag: once ||delta xi||_inf falls under the threshold at the end of
an iteration, every later grid step is a predicated no-op (a scalar branch,
~ns), and the outputs keep the converged iteration's values — the exact
while-loop semantics without per-iteration loop overhead.

Layouts are lane-major: the Jacobian rides as (16, N) = [A_c^T; A_d^T; 0]
so every tile op contracts over the 128-lane axis; the twist rides as the
2x16 block matrix M = [[xi,0],[0,xi]] so both residual rows come from one
MXU dot.  All small solves use the scatter-free value-level Cholesky from
kernels/smallsolve_pallas.py in row-vector form (solve-by-inverse + row
dot) so nothing ever transposes in-kernel.

The XLA path (solver/irls.py) remains the oracle for CPU tests and sharded
execution; tests/test_pallas_kernels.py pins this kernel against it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from staticfusion_tpu.config import NUM_CLUSTERS
from staticfusion_tpu.kernels.smallsolve_pallas import _chol_solve_body

_K = NUM_CLUSTERS  # 24
_MAX_TILE = 16384  # lanes per grid step: (16+2+1) rows x 16k x 4B ~ 1.2 MB


def _dot_nt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(m, T) x (n, T) -> (m, n), contracting the lane axis of both."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _row_solve(ata: jnp.ndarray, rhs_row: jnp.ndarray,
               ridge: float) -> jnp.ndarray:
    """(1, n) row x = rhs (ata)^-1 for symmetric ata — Cholesky inverse +
    row dot keeps everything lane-major (no in-kernel transposes)."""
    n = ata.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = jnp.where(r == c, 1.0, 0.0).astype(ata.dtype)
    inv = _chol_solve_body(ata, eye, ridge)
    return jax.lax.dot_general(rhs_row, inv, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _predict_res(M: jnp.ndarray, at: jnp.ndarray,
                 b2: jnp.ndarray) -> jnp.ndarray:
    """(2, T) residuals [res_c; res_d] = M @ A^T - B for the twist block
    matrix M (2, 16)."""
    pred = jax.lax.dot_general(M, at, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return pred - b2


def _onehot(lbl: jnp.ndarray, T: int) -> jnp.ndarray:
    """(K+1, T) float one-hot of the label row, built in-register."""
    rK = jax.lax.broadcasted_iota(jnp.int32, (_K + 1, T), 0)
    return (rK == jnp.broadcast_to(lbl, (_K + 1, T))).astype(jnp.float32)


def _kernel(at_ref, b_ref, lbl_ref, small_ref, reg_ref,
            out_small, out_ata,
            ata_s, atb_s, sums_s, m_s, bext_s, scal_s,
            *, kc: float, lambda_prior: float, delta_thr: float,
            tiles: int):
    p = pl.program_id(1)
    t = pl.program_id(2)
    first = ((pl.program_id(0) == 0) & (p == 0)) & (t == 0)

    @pl.when(first)
    def _init():
        # Loop-carried state lives in scratch across the whole grid.
        m_s[:, :] = small_ref[0:2, 0:16]          # M0 (zero twist)
        bext_s[:, :] = small_ref[2:3, :]          # b_segm0 row, col K = 1
        scal_s[0, 0] = small_ref[3, 0]            # aver_res0
        scal_s[0, 1] = 0.0                        # res_sq
        scal_s[0, 2] = 0.0                        # done
        scal_s[0, 3] = 0.0                        # done pending
        out_small[:, :] = jnp.zeros_like(out_small)
        out_ata[:, :] = jnp.zeros_like(out_ata)

    live = scal_s[0, 2] == 0.0

    @pl.when(live & (p == 0) & (t == 0))
    def _init0():
        ata_s[:, :] = jnp.zeros_like(ata_s)
        atb_s[:, :] = jnp.zeros_like(atb_s)

    @pl.when(live & (p == 1) & (t == 0))
    def _init1():
        sums_s[:, :] = jnp.zeros_like(sums_s)
        scal_s[0, 1] = 0.0

    at = at_ref[:]            # (16, T): rows 0-5 A_c^T, 6-11 A_d^T, 12-15 0
    b2 = b_ref[:]             # (2, T): [B_c; B_d]
    lbl = lbl_ref[:]          # (1, T) int32 labels, K = invalid, padded = K
    T = at.shape[1]
    aver_res = scal_s[0, 0]
    kb = small_ref[7, 0]
    n2 = small_ref[7, 1]

    @pl.when(live & (p == 0))
    def _pass0():
        res = _predict_res(m_s[:, :], at, b2)
        inv_c = 1.0 / (kc * jnp.maximum(aver_res, 1e-20))

        # b_segm weight per pixel: one-hot(label) built in-register, then a
        # (1, K+1) x (K+1, T) MXU dot (FrontEnd.cpp:624-635's b_segm[label]).
        oh = _onehot(lbl, T)
        b_ext = jnp.clip(bext_s[0:1, 0:_K + 1], 0.0, 1.0)
        bw = jax.lax.dot_general(b_ext, oh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        wc = bw * jax.lax.rsqrt(1.0 + (res[0:1, :] * inv_c) ** 2)
        wd = bw * jax.lax.rsqrt(1.0 + (res[1:2, :] * inv_c) ** 2)

        r16 = jax.lax.broadcasted_iota(jnp.int32, (16, T), 0)
        wx = jnp.where(r16 < 6, jnp.broadcast_to(wc, (16, T)),
                       jnp.where(r16 < 12, jnp.broadcast_to(wd, (16, T)),
                                 0.0))
        aw = at * wx
        ata_s[:, :] = ata_s[:, :] + _dot_nt(aw, aw)
        wb = jnp.concatenate([wc, wd], axis=0) * b2
        atb_s[0:2, :] = atb_s[0:2, :] + _dot_nt(wb, aw)

        @pl.when(t == tiles - 1)
        def _solve6():
            ata = ata_s[0:6, 0:6] + ata_s[6:12, 6:12]
            atb_row = atb_s[0:1, 0:6] + atb_s[1:2, 6:12]
            x_row = _row_solve(ata, atb_row, ridge=1e-12)      # (1, 6)
            z10 = jnp.zeros((1, 10), jnp.float32)
            z6 = jnp.zeros((1, 6), jnp.float32)
            z4 = jnp.zeros((1, 4), jnp.float32)
            row0 = jnp.concatenate([x_row, z10], axis=1)
            row1 = jnp.concatenate([z6, x_row, z4], axis=1)
            # Convergence pending (FrontEnd.cpp:676-683): the converged
            # iteration still completes; later iterations are skipped.
            delta = jnp.max(jnp.abs(row0 - m_s[0:1, :]))
            scal_s[0, 3] = jnp.where(delta < delta_thr, 1.0, 0.0)
            m_s[:, :] = jnp.concatenate([row0, row1], axis=0)
            out_ata[0:6, 0:6] = ata

    @pl.when(live & (p == 1))
    def _pass1():
        res = _predict_res(m_s[:, :], at, b2)
        ress = jnp.abs(res[0:1, :]) + jnp.abs(res[1:2, :])     # (1, T)
        oh = _onehot(lbl, T)
        sums_s[0:1, 0:_K + 1] = (sums_s[0:1, 0:_K + 1]
                                 + _dot_nt(ress, oh))
        scal_s[0, 1] = scal_s[0, 1] + jnp.sum(res * res)

        @pl.when(t == tiles - 1)
        def _segm():
            # Per-cluster averages (FrontEnd.cpp:650-667).
            s24 = sums_s[0:1, 0:_K]
            counts = small_ref[6:7, 0:_K]
            arl = s24 / (2.0 * (counts + 1.0))
            new_aver = jnp.sum(s24) / n2

            # Segmentation solve (SegmentationBackground.cpp:133-174),
            # identical math to solver/segmentation.solve_segm_iteration.
            repr_res = jnp.maximum(0.001, aver_res)
            mult = 1.0 / (kc * jnp.maximum(aver_res, 1e-20))
            fixed = jnp.log1p((kb * repr_res * mult) ** 2)
            bp = small_ref[4:5, 0:_K]
            lt = small_ref[5:6, 0:_K]
            trusted = lt > 0.1
            dataterm = fixed - jnp.log1p((arl * mult) ** 2)
            a_diag = jnp.where(trusted, 2.0 * lt * lambda_prior, 2.0 * lt)
            b_rhs = jnp.where(
                trusted, dataterm + 2.0 * lambda_prior * lt * bp,
                2.0 * lt * bp)

            rk = jax.lax.broadcasted_iota(jnp.int32, (_K, _K), 0)
            ck = jax.lax.broadcasted_iota(jnp.int32, (_K, _K), 1)
            diag = jnp.where(rk == ck,
                             jnp.broadcast_to(a_diag * a_diag, (_K, _K)),
                             0.0)
            ata24 = diag + reg_ref[:, :]
            rhs_row = a_diag * b_rhs                            # (1, K)
            sol = _row_solve(ata24, rhs_row, ridge=1e-6)
            b_new = jnp.clip(sol, -1.0, 2.0)
            one = jnp.ones((1, 1), jnp.float32)
            z7 = jnp.zeros((1, 32 - _K - 1), jnp.float32)
            bext_s[:, :] = jnp.concatenate([b_new, one, z7], axis=1)
            scal_s[0, 0] = new_aver
            # Iteration complete: commit outputs (the last executed
            # iteration's values survive) and latch the pending exit.
            out_small[0:2, 0:16] = m_s[:, :]
            out_small[2:3, :] = bext_s[:, :]
            out_small[3:4, :] = jnp.concatenate(
                [jnp.full((1, 1), new_aver),
                 jnp.full((1, 1), scal_s[0, 1]),
                 jnp.zeros((1, 30), jnp.float32)], axis=1)
            scal_s[0, 2] = scal_s[0, 3]


class FusedSolve(NamedTuple):
    M: jnp.ndarray        # (2, 16) final twist block matrix
    b_ext: jnp.ndarray    # (1, 32) final b_segm row (col K = 1)
    aver_res: jnp.ndarray
    res_sq: jnp.ndarray
    ata: jnp.ndarray      # (6, 6) normal matrix of the last iteration


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tile_plan(n: int) -> tuple[int, int]:
    """(tile, tiles) covering n lanes in <= _MAX_TILE chunks."""
    tiles = -(-n // _MAX_TILE)
    tile = _round_up(-(-n // tiles), 128)
    return tile, tiles


def irls_solve_call(at16: jnp.ndarray, b2: jnp.ndarray, lbl: jnp.ndarray,
                    small: jnp.ndarray, reg: jnp.ndarray,
                    kc: float, lambda_prior: float, delta_thr: float,
                    max_iter: int, interpret: bool = False) -> FusedSolve:
    """The whole IRLS loop in one launch.  at16 (16, Np), b2 (2, Np),
    lbl (1, Np) int32, small (8, 32) packed state, reg (24, 24)."""
    np_ = at16.shape[1]
    tile, tiles = tile_plan(np_)
    assert tile * tiles == np_, (np_, tile, tiles)

    out_small, out_ata = pl.pallas_call(
        functools.partial(_kernel, kc=kc, lambda_prior=lambda_prior,
                          delta_thr=delta_thr, tiles=tiles),
        grid=(max_iter, 2, tiles),
        in_specs=[
            pl.BlockSpec((16, tile), lambda i, p, t: (0, t)),
            pl.BlockSpec((2, tile), lambda i, p, t: (0, t)),
            pl.BlockSpec((1, tile), lambda i, p, t: (0, t)),
            pl.BlockSpec((8, 32), lambda i, p, t: (0, 0)),
            pl.BlockSpec((_K, _K), lambda i, p, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((4, 32), lambda i, p, t: (0, 0)),
            pl.BlockSpec((8, 8), lambda i, p, t: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((4, 32), jnp.float32),
                   jax.ShapeDtypeStruct((8, 8), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, 16), jnp.float32),
                        pltpu.VMEM((2, 16), jnp.float32),
                        pltpu.VMEM((1, 32), jnp.float32),
                        pltpu.VMEM((2, 16), jnp.float32),
                        pltpu.VMEM((1, 32), jnp.float32),
                        pltpu.SMEM((1, 4), jnp.float32)],
        interpret=interpret,
    )(at16, b2, lbl, small, reg)

    return FusedSolve(M=out_small[0:2, 0:16], b_ext=out_small[2:3, :],
                      aver_res=out_small[3, 0], res_sq=out_small[3, 1],
                      ata=out_ata[0:6, 0:6])


def pack_inputs(sys):
    """JacobianSystem -> padded lane-major kernel inputs."""
    n = sys.B_c.shape[0]
    tile, tiles = tile_plan(n)
    np_ = tile * tiles
    pad = np_ - n
    zeros4 = jnp.zeros((4, n), jnp.float32)
    at16 = jnp.pad(jnp.concatenate([sys.A_cT, sys.A_dT, zeros4], axis=0),
                   ((0, 0), (0, pad)))
    b2 = jnp.pad(jnp.stack([sys.B_c, sys.B_d]), ((0, 0), (0, pad)))
    # Padded labels get the invalid id: zero Jacobian/residual rows keep
    # them out of every reduction; their cluster column (K) is never read.
    lbl = jnp.pad(sys.labels[None, :], ((0, 0), (0, pad)),
                  constant_values=_K).astype(jnp.int32)
    return at16, b2, lbl


def solve_irls_fused(sys, b_segm0, prior, reg_ata, config, kb=None,
                     interpret: bool = False):
    """Drop-in twin of solver/irls.solve_irls_xla built on the fused
    whole-loop kernel; see tests/test_pallas_kernels.py for the
    equivalence pin."""
    from staticfusion_tpu.ops.smallsolve import spd_inverse_fast
    from staticfusion_tpu.solver.irls import IRLSResult

    s = config.solver
    if kb is None:
        kb = s.kb
    at16, b2, lbl = pack_inputs(sys)

    n2 = jnp.maximum(2.0 * sys.valid_count, 1.0)
    aver_res0 = (jnp.sum(jnp.abs(sys.B_c)) + jnp.sum(jnp.abs(sys.B_d))) / n2

    small = jnp.zeros((8, 32), jnp.float32)
    # rows 0-1: M0 = zero twist; row 2: b_ext0; row 3: aver_res0;
    # rows 4-6: prior/counts; row 7: traced scalars.
    small = small.at[2, 0:_K].set(b_segm0).at[2, _K].set(1.0)
    small = small.at[3, 0].set(aver_res0)
    small = small.at[4, 0:_K].set(prior.b_prior)
    small = small.at[5, 0:_K].set(prior.lambda_t_w)
    small = small.at[6, 0:_K].set(sys.cluster_counts)
    small = small.at[7, 0].set(jnp.asarray(kb, jnp.float32))
    small = small.at[7, 1].set(n2)

    out = irls_solve_call(at16, b2, lbl, small, reg_ata,
                          kc=s.kc_cauchy, lambda_prior=s.lambda_prior,
                          delta_thr=s.irls_delta_threshold,
                          max_iter=s.max_iter_irls, interpret=interpret)

    est_cov = spd_inverse_fast(out.ata, ridge=1e-12) * out.res_sq
    return IRLSResult(twist=out.M[0, 0:6], est_cov=est_cov,
                      b_segm=out.b_ext[0, 0:_K], aver_res=out.aver_res)
