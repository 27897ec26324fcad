"""Pose-graph Gauss-Newton refinement (parallel/posegraph.py).

No reference counterpart — the reference only logs poses
(Reconstruction.cpp:315); this layer is the net-new distributed
refinement called for in SURVEY.md section 2.5."""

import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.geometry import se3
from staticfusion_tpu.parallel import posegraph as pg


def _random_twists(rng, n, scale_t=0.05, scale_w=0.05):
    x = rng.normal(size=(n, 6)).astype(np.float32)
    x[:, :3] *= scale_t
    x[:, 3:] *= scale_w
    return x


def _make_chain(rng, n):
    """Ground-truth trajectory + exact odometry measurements."""
    poses = [np.eye(4, dtype=np.float32)]
    odom = []
    for k in range(n - 1):
        T = np.asarray(se3.se3_exp(jnp.asarray(_random_twists(rng, 1)[0])))
        odom.append(T)
        poses.append(poses[-1] @ T)
    return np.stack(poses), odom


def test_exact_graph_is_fixed_point(rng):
    gt, odom = _make_chain(rng, 6)
    g = pg.chain_odometry_graph(list(gt), odom)
    g2 = pg.optimize(g, iters=3)
    np.testing.assert_allclose(np.asarray(g2.poses[:6]), gt, atol=1e-5)


def test_noisy_initialization_converges(rng):
    gt, odom = _make_chain(rng, 8)
    # Perturb every pose but the gauge-fixed first one.
    noisy = [gt[0]]
    for p in gt[1:]:
        dx = jnp.asarray(0.03 * rng.normal(size=6).astype(np.float32))
        noisy.append(np.asarray(jnp.asarray(p) @ se3.se3_exp(dx)))
    g = pg.chain_odometry_graph(noisy, odom)
    g2 = pg.optimize(g, iters=15)
    np.testing.assert_allclose(np.asarray(g2.poses[:8]), gt, atol=1e-3)


def test_loop_closure_distributes_drift(rng):
    """A chain with drifted odometry plus an exact loop closure: the
    endpoint error must shrink substantially after optimization."""
    gt, odom = _make_chain(rng, 10)
    drift = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.01, -0.008, 0.012, 0.004, -0.003, 0.005], np.float32))))
    odom_bad = [T @ drift for T in odom]
    # Integrate the bad odometry for the initial guess.
    init = [gt[0]]
    for T in odom_bad:
        init.append(init[-1] @ T)
    err_before = np.linalg.norm(init[-1][:3, 3] - gt[-1][:3, 3])

    g = pg.chain_odometry_graph(init, odom_bad,
                                max_constraints=2 * len(init))
    # Loop closure: exact relative pose between first and last keyframe.
    T_0n = np.linalg.inv(gt[0]) @ gt[-1]
    g = pg.add_constraint(g, 0, len(init) - 1, jnp.asarray(T_0n), 10.0)
    g2 = pg.optimize(g, iters=20)
    err_after = np.linalg.norm(
        np.asarray(g2.poses[len(init) - 1][:3, 3]) - gt[-1][:3, 3])
    assert err_after < 0.35 * err_before


def test_inactive_padding_untouched(rng):
    gt, odom = _make_chain(rng, 4)
    g = pg.chain_odometry_graph(list(gt), odom, max_poses=16,
                                max_constraints=32)
    g2 = pg.optimize(g, iters=5)
    # Padding poses stay identity (pinned by damping, zero-weight rows).
    np.testing.assert_allclose(np.asarray(g2.poses[8:]),
                               np.broadcast_to(np.eye(4), (8, 4, 4)),
                               atol=1e-5)


def _chain_graph_with_loops(rng, n, n_loops=2, cap_extra=2):
    """Drifted chain in optimize_chain's layout: slots [0, M-1) = ordered
    chain, remaining slots = loop constraints."""
    gt, odom = _make_chain(rng, n)
    drift = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.008, -0.006, 0.01, 0.003, -0.002, 0.004], np.float32))))
    odom_bad = [T @ drift for T in odom]
    init = [gt[0]]
    for T in odom_bad:
        init.append(init[-1] @ T)
    g = pg.chain_odometry_graph(init, odom_bad,
                                max_constraints=(n - 1) + cap_extra)
    loops = []
    for l in range(n_loops):
        i = int(rng.integers(0, n // 2))
        j = int(rng.integers(n // 2, n))
        T_ij = np.linalg.inv(gt[i]) @ gt[j]
        g = pg.add_constraint(g, i, j, jnp.asarray(T_ij), 8.0)
        loops.append((i, j))
    return g, gt, np.stack(init)


def test_chain_solver_matches_dense_oracle(rng):
    """Property test (VERDICT round 4 #7): the block-tridiagonal + Woodbury
    solver must agree with the dense solve across sizes and loop counts —
    same math, different factorization."""
    for n, n_loops in [(4, 1), (8, 2), (16, 2), (33, 2), (64, 2)]:
        g, gt, _ = _chain_graph_with_loops(rng, n, n_loops)
        dense = pg.optimize(g, iters=10)
        chain = pg.optimize_chain(g, iters=10)
        np.testing.assert_allclose(np.asarray(chain.poses[:n]),
                                   np.asarray(dense.poses[:n]),
                                   atol=2e-4, err_msg=f"n={n}")


def test_chain_solver_closes_loops(rng):
    """End-to-end: drifted odometry + exact loop constraints; the chain
    solver must recover the trajectory (not just match the oracle)."""
    g, gt, init = _chain_graph_with_loops(rng, 24, n_loops=2)
    err_before = np.linalg.norm(init[-1][:3, 3] - gt[-1][:3, 3])
    g2 = pg.optimize_chain(g, iters=20)
    err_after = np.linalg.norm(
        np.asarray(g2.poses[23][:3, 3]) - gt[23][:3, 3])
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # Gauge fixed at pose 0.
    np.testing.assert_allclose(np.asarray(g2.poses[0]), np.eye(4),
                               atol=1e-6)


def test_chain_solver_scales_to_1024():
    """The headline scaling case: M=1024 keyframes (a 6144-dim state whose
    dense normal matrix would be 6144^2 and its solve O(2.3e11) flops)
    optimizes through the O(M) tridiagonal path and removes the drift.
    Runtime on the 8-dev CPU mesh is seconds; on-chip it is milliseconds
    (PERF.md)."""
    rng = np.random.default_rng(1)
    n = 1024
    # Build the drifted chain directly as arrays (chain_odometry_graph's
    # per-pose python loop is O(n) dispatches — too slow at 1024).
    xi = 0.02 * rng.normal(size=(n - 1, 6)).astype(np.float32)
    odom_T = np.asarray(se3.se3_exp(jnp.asarray(xi)))           # exact
    drift = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.004, 0.0, -0.003, 0.001, 0.0015, 0.0], np.float32))))
    odom_bad = odom_T @ drift
    gt = [np.eye(4, dtype=np.float32)]
    init = [np.eye(4, dtype=np.float32)]
    for k in range(n - 1):
        gt.append((gt[-1] @ odom_T[k]).astype(np.float32))
        init.append((init[-1] @ odom_bad[k]).astype(np.float32))
    gt, init = np.stack(gt), np.stack(init)

    ks = np.arange(n - 1, dtype=np.int32)
    g = pg.PoseGraph(
        poses=jnp.asarray(init), n_poses=jnp.asarray(n, jnp.int32),
        ci=jnp.concatenate([jnp.asarray(ks), jnp.asarray([0], jnp.int32)]),
        cj=jnp.concatenate([jnp.asarray(ks + 1),
                            jnp.asarray([n - 1], jnp.int32)]),
        cT=jnp.concatenate([jnp.asarray(odom_bad), jnp.asarray(
            (np.linalg.inv(gt[0]) @ gt[-1])[None])]),
        cw=jnp.concatenate([jnp.ones((n - 1,)), jnp.asarray([8.0])]),
        n_constraints=jnp.asarray(n, jnp.int32))

    err_before = np.linalg.norm(init[-1][:3, 3] - gt[-1][:3, 3])
    g2 = pg.optimize_chain(g, iters=10)
    err_after = np.linalg.norm(
        np.asarray(g2.poses[n - 1][:3, 3]) - gt[-1][:3, 3])
    assert err_before > 1.0          # the drift is macroscopic...
    assert err_after < 0.1 * err_before, (err_before, err_after)


def test_sharded_optimize_matches_dense(rng):
    """optimize_sharded over an 8-device CPU mesh == single-device optimize
    (up to fp addition order)."""
    import jax
    from jax.sharding import Mesh

    gt, odom = _make_chain(rng, 8)
    noisy = [gt[0]]
    for p in gt[1:]:
        dx = jnp.asarray(0.02 * rng.normal(size=6).astype(np.float32))
        noisy.append(np.asarray(jnp.asarray(p) @ se3.se3_exp(dx)))
    # Pad constraints to a multiple of 8 (zero-weight slots are inert).
    g = pg.chain_odometry_graph(noisy, odom, max_constraints=16)

    dense = pg.optimize(g, iters=8)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("pg",))
    shard = pg.optimize_sharded(g, mesh, axis="pg", iters=8)
    np.testing.assert_allclose(np.asarray(shard.poses),
                               np.asarray(dense.poses), atol=1e-5)
    np.testing.assert_allclose(np.asarray(shard.poses[:8]), gt, atol=1e-3)
