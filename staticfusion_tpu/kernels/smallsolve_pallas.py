"""Pallas TPU kernels for the tiny SPD solves on the solver's critical path.

The IRLS loop chains ~90 sequential 6x6 and 24x24 Cholesky solves per frame
(FrontEnd.cpp:640-642, SegmentationBackground.cpp:157).  The trace-unrolled
XLA versions (ops/smallsolve.py) emit ~100-300 un-fusable scalar/vector HLO
ops each; at ~1-2 us of per-op scheduling overhead that dwarfs the
arithmetic.  Compiling the same factorization *inside one Pallas kernel*
turns each solve into a single kernel launch — Mosaic schedules the whole
dependency chain on-core.

The in-kernel code is scatter-free (Mosaic has no scatter lowering): the
factorization is right-looking Cholesky via masked rank-1 updates, and the
triangular substitutions are masked row eliminations — 2-D VPU ops only.

On non-TPU backends callers should use ops/smallsolve.py (see
`irls._spd_solve`); these kernels are TPU-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RIDGE_FLOOR = 1e-30


def _chol_solve_body(M: jnp.ndarray, b: jnp.ndarray,
                     ridge: float) -> jnp.ndarray:
    """Scatter-free unrolled Cholesky solve; M (n,n), b (n,m)."""
    n = M.shape[0]
    dt = M.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    if ridge:
        M = M + ridge * jnp.where(row == col, jnp.ones((), dt), 0.0)

    # Right-looking Cholesky: n masked rank-1 updates.
    A = M
    L = jnp.zeros_like(M)
    for j in range(n):
        dj = jnp.sqrt(jnp.maximum(A[j, j], _RIDGE_FLOOR))
        cvec = jnp.where(row[:, j:j + 1] >= j, A[:, j:j + 1] / dj, 0.0)
        L = jnp.where(col == j, cvec, L)
        A = A - cvec * cvec.reshape(1, n)

    m = b.shape[1]
    rowm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)

    # Forward substitution: L y = b.
    y = b
    for i in range(n):
        yi = y[i:i + 1, :] / L[i, i]
        y = jnp.where(rowm == i, yi,
                      jnp.where(rowm > i, y - L[:, i:i + 1] * yi, y))

    # Backward substitution: L^T x = y  (rows of L^T are columns of L).
    x = y
    for i in reversed(range(n)):
        xi = x[i:i + 1, :] / L[i, i]
        x = jnp.where(rowm == i, xi,
                      jnp.where(rowm < i, x - L[i:i + 1, :].reshape(n, 1) * xi,
                                x))
    return x


def _chol_solve_kernel(m_ref, b_ref, x_ref, *, ridge: float):
    x_ref[:] = _chol_solve_body(m_ref[:], b_ref[:], ridge)


@functools.partial(jax.jit, static_argnames=("ridge", "interpret"))
def spd_solve(M: jnp.ndarray, b: jnp.ndarray,
              ridge: float = 0.0, interpret: bool = False) -> jnp.ndarray:
    """x = (M + ridge I)^-1 b via one in-kernel unrolled Cholesky.

    M: (n, n) SPD; b: (n,) or (n, m)."""
    b2 = b[:, None] if b.ndim == 1 else b
    out = pl.pallas_call(
        functools.partial(_chol_solve_kernel, ridge=ridge),
        out_shape=jax.ShapeDtypeStruct(b2.shape, M.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,  # lets the CPU test suite pin this kernel
    )(M, b2)
    return out[:, 0] if b.ndim == 1 else out


@functools.partial(jax.jit, static_argnames=("ridge", "interpret"))
def spd_inverse(M: jnp.ndarray, ridge: float = 0.0,
                interpret: bool = False) -> jnp.ndarray:
    return spd_solve(M, jnp.eye(M.shape[0], dtype=M.dtype), ridge=ridge,
                     interpret=interpret)
