"""Small dense linear algebra, unrolled for TPU.

The solver needs three tiny factorizations per IRLS iteration: a 6x6 SPD
solve (normal equations, FrontEnd.cpp:640-642), a 24x24 SPD solve (the
segmentation system, SegmentationBackground.cpp:157) and, per level, a 6x6
symmetric eigendecomposition (motion filter, FrontEnd.cpp:727).  XLA lowers
`jnp.linalg.solve`/`eigh` to LU/QR custom calls built on `while` loops whose
per-iteration sequencing overhead dwarfs the arithmetic at these sizes, and
the coarse-to-fine driver runs ~90 of them back to back.  Here every
factorization is *trace-time unrolled* into a flat DAG of vector ops — no
control flow, everything fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RIDGE_FLOOR = 1e-30


def spd_solve_fast(M: jnp.ndarray, b: jnp.ndarray,
                   ridge: float = 0.0) -> jnp.ndarray:
    """Backend-dispatched SPD solve: one Pallas kernel on TPU (Mosaic
    schedules the whole unrolled Cholesky in-core, ~10 us vs ~120 us of XLA
    op soup for 24x24), the trace-unrolled XLA version elsewhere."""
    if jax.default_backend() == "tpu":
        from staticfusion_tpu.kernels import smallsolve_pallas
        return smallsolve_pallas.spd_solve(M, b, ridge=ridge)
    return spd_solve(M, b, ridge=ridge)


def spd_inverse_fast(M: jnp.ndarray, ridge: float = 0.0) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        from staticfusion_tpu.kernels import smallsolve_pallas
        return smallsolve_pallas.spd_inverse(M, ridge=ridge)
    return spd_inverse(M, ridge=ridge)


def cholesky_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular L with M = L L^T.  Unrolled Cholesky-Crout; M must be
    SPD (callers add a ridge).  Shape (n, n) with n static and small."""
    n = M.shape[0]
    row_idx = jnp.arange(n)
    L = jnp.zeros_like(M)
    for j in range(n):
        if j == 0:
            s = M[:, j]
        else:
            s = M[:, j] - L[:, :j] @ L[j, :j]
        djj = jnp.sqrt(jnp.maximum(s[j], _RIDGE_FLOOR))
        L = L.at[:, j].set(jnp.where(row_idx >= j, s / djj, 0.0))
    return L


def _forward_sub(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b for lower-triangular L.  b is (n,) or (n, m)."""
    n = L.shape[0]
    y = jnp.zeros_like(b)
    for i in range(n):
        acc = b[i] if i == 0 else b[i] - L[i, :i] @ y[:i]
        y = y.at[i].set(acc / L[i, i])
    return y


def _backward_sub(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y for lower-triangular L.  y is (n,) or (n, m)."""
    n = L.shape[0]
    x = jnp.zeros_like(y)
    for i in reversed(range(n)):
        acc = y[i] if i == n - 1 else y[i] - L[i + 1:, i] @ x[i + 1:]
        x = x.at[i].set(acc / L[i, i])
    return x


def spd_solve(M: jnp.ndarray, b: jnp.ndarray, ridge: float = 0.0) -> jnp.ndarray:
    """x = (M + ridge I)^-1 b via unrolled Cholesky."""
    n = M.shape[0]
    if ridge:
        M = M + ridge * jnp.eye(n, dtype=M.dtype)
    L = cholesky_factor(M)
    return _backward_sub(L, _forward_sub(L, b))


def spd_inverse(M: jnp.ndarray, ridge: float = 0.0) -> jnp.ndarray:
    """(M + ridge I)^-1 via unrolled Cholesky (all columns at once)."""
    n = M.shape[0]
    if ridge:
        M = M + ridge * jnp.eye(n, dtype=M.dtype)
    L = cholesky_factor(M)
    eye = jnp.eye(n, dtype=M.dtype)
    return _backward_sub(L, _forward_sub(L, eye))


def eigh_jacobi(M: jnp.ndarray, sweeps: int = 5):
    """Symmetric eigendecomposition by unrolled cyclic Jacobi rotations.

    Returns (eigvals, eigvecs) with M ~ V diag(w) V^T.  Eigenvalues are NOT
    sorted — the motion filter works in the eigenbasis and never orders it.
    `sweeps` cyclic sweeps of the n(n-1)/2 off-diagonal pairs; 5 sweeps drive
    a 6x6 to ~fp32 roundoff."""
    n = M.shape[0]
    A = M
    V = jnp.eye(n, dtype=M.dtype)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = A[p, q]
                app = A[p, p]
                aqq = A[q, q]
                # Stable rotation: theta = 0.5 atan2(2 apq, aqq - app).
                theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
                c = jnp.cos(theta)
                s = jnp.sin(theta)
                # Rotate columns p,q of A (right-mult), then rows (left-mult).
                col_p = A[:, p]
                col_q = A[:, q]
                new_p = c * col_p - s * col_q
                new_q = s * col_p + c * col_q
                A = A.at[:, p].set(new_p).at[:, q].set(new_q)
                row_p = A[p, :]
                row_q = A[q, :]
                A = A.at[p, :].set(c * row_p - s * row_q)
                A = A.at[q, :].set(s * row_p + c * row_q)
                vcol_p = V[:, p]
                vcol_q = V[:, q]
                V = V.at[:, p].set(c * vcol_p - s * vcol_q)
                V = V.at[:, q].set(s * vcol_p + c * vcol_q)
    return jnp.diagonal(A), V
