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
