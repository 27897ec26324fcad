"""Pin the TPU Pallas kernels against their jnp reference paths.

These kernels normally run only on real TPU (`ops/bilateral.py` and
`ops/smallsolve.py` dispatch on backend), so the rest of the CPU suite never
exercises them.  Pallas interpret mode runs the same kernel bodies on CPU,
letting us property-test them against the XLA formulations they replace:
the 169-tap bilateral (`depth_bilateral.frag:34-76` math) and the unrolled
Cholesky solves (FrontEnd.cpp:640-642, SegmentationBackground.cpp:157).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from staticfusion_tpu.kernels import bilateral_pallas, smallsolve_pallas
from staticfusion_tpu.ops import bilateral as bilateral_ref
from staticfusion_tpu.ops import smallsolve as smallsolve_ref


def _depth_image(rng, rows, cols):
    """Depth-like mm image: smooth field + holes (exact 0.0 sentinels) +
    out-of-range extremes to hit every gate."""
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    d = 1500.0 + 900.0 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
    d += rng.normal(0.0, 30.0, (rows, cols)).astype(np.float32)
    d[rng.random((rows, cols)) < 0.1] = 0.0          # invalid holes
    d[rng.random((rows, cols)) < 0.03] = 150.0       # below 300 mm gate
    d[rng.random((rows, cols)) < 0.03] = 6000.0      # above maxD gate
    return np.round(d).astype(np.float32)            # u16-valued, like PNGs


# (24, 64) exercises a multi-step grid; (16, 384) and (48, 640) the
# wide-image lane-tiled 2-D grid (the VGA scoped-VMEM fix), single- and
# multi-row-block; (40, 320) the odd-divisor single-tile path.
@pytest.mark.parametrize("rows,cols", [(24, 64), (16, 384), (40, 320),
                                       (48, 640)])
def test_bilateral_kernel_matches_xla_path(rows, cols):
    rng = np.random.default_rng(rows * 1000 + cols)
    d = jnp.asarray(_depth_image(rng, rows, cols))

    got = np.asarray(bilateral_pallas.bilateral_filter_mm(
        d, 4.5, interpret=True))
    # ops/bilateral.py on CPU is the jnp shifted-MAC formulation.
    want = np.asarray(bilateral_ref.bilateral_filter_mm(d, 4.5))

    # Identical tap order; only compiler-level reassociation can differ.
    # Both round() to integer mm at the end, so allow one-ulp-of-round.
    assert np.all(np.abs(got - want) <= 1.0)
    assert np.mean(got != want) < 1e-3
    # Gates: out-of-range centers must be exactly zero.
    center = np.asarray(d)
    assert np.all(got[(center < 300.0) | (center > 4500.0)] == 0.0)


@pytest.mark.parametrize("n", [6, 24])
@pytest.mark.parametrize("nrhs", [None, 6])
def test_spd_solve_kernel(n, nrhs):
    rng = np.random.default_rng(n * 10 + (nrhs or 0))
    a = rng.normal(size=(n, n)).astype(np.float32)
    M = a @ a.T + n * np.eye(n, dtype=np.float32)
    b = rng.normal(size=(n,) if nrhs is None else (n, nrhs))
    b = b.astype(np.float32)

    got = np.asarray(smallsolve_pallas.spd_solve(
        jnp.asarray(M), jnp.asarray(b), interpret=True))
    want = np.linalg.solve(M.astype(np.float64), b.astype(np.float64))
    xla = np.asarray(smallsolve_ref.spd_solve(jnp.asarray(M),
                                              jnp.asarray(b)))

    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 5e-5
    # The kernel replaces the XLA formulation 1:1 on TPU — they must agree
    # to f32 roundoff on the same inputs.
    assert np.abs(got - xla).max() / scale < 5e-5


def test_spd_solve_kernel_ridge():
    n = 6
    rng = np.random.default_rng(7)
    a = rng.normal(size=(n, n)).astype(np.float32)
    M = a @ a.T + np.eye(n, dtype=np.float32)
    b = rng.normal(size=(n,)).astype(np.float32)
    ridge = 0.25

    got = np.asarray(smallsolve_pallas.spd_solve(
        jnp.asarray(M), jnp.asarray(b), ridge=ridge, interpret=True))
    want = np.linalg.solve(M.astype(np.float64) + ridge * np.eye(n), b)
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-6) < 5e-5


@pytest.mark.parametrize("n", [6, 24])
def test_spd_inverse_kernel(n):
    rng = np.random.default_rng(n)
    a = rng.normal(size=(n, n)).astype(np.float32)
    M = a @ a.T + n * np.eye(n, dtype=np.float32)

    got = np.asarray(smallsolve_pallas.spd_inverse(jnp.asarray(M),
                                                   interpret=True))
    ident = got @ M
    assert np.abs(ident - np.eye(n)).max() < 1e-3


# ---------------------------------------------------------------------------
# Fused IRLS iteration kernel (kernels/irls_pallas.py) vs the XLA oracle
# (solver/irls.py solve_irls_xla).

def _random_system(rng, n):
    from staticfusion_tpu.config import NUM_CLUSTERS, SFConfig
    from staticfusion_tpu.solver.irls import JacobianSystem, cluster_onehot
    from staticfusion_tpu.solver.segmentation import (SegPrior,
                                                      reg_normal_matrix)

    k = NUM_CLUSTERS
    labels = rng.integers(0, k + 1, n)          # k = invalid
    valid = labels < k
    # Plausible magnitudes: Jacobian rows O(1), residuals O(0.01-0.1).
    A_cT = (0.5 * rng.standard_normal((6, n)) * valid).astype(np.float32)
    A_dT = (0.5 * rng.standard_normal((6, n)) * valid).astype(np.float32)
    B_c = (0.05 * rng.standard_normal(n) * valid).astype(np.float32)
    B_d = (0.05 * rng.standard_normal(n) * valid).astype(np.float32)
    onehot = cluster_onehot(jnp.asarray(labels))
    sys = JacobianSystem(
        A_cT=jnp.asarray(A_cT), B_c=jnp.asarray(B_c),
        A_dT=jnp.asarray(A_dT), B_d=jnp.asarray(B_d),
        labels=jnp.asarray(labels, jnp.int32), onehot=onehot,
        cluster_counts=jnp.sum(onehot[:, :k], axis=0),
        valid_count=jnp.asarray(float(valid.sum())))
    prior = SegPrior(
        b_prior=jnp.asarray(rng.uniform(-1, 2, k).astype(np.float32)),
        lambda_t_w=jnp.asarray(rng.uniform(0, 1, k).astype(np.float32)))
    conn = rng.random((k, k)) < 0.2
    conn = jnp.asarray(conn | conn.T)
    cfg = SFConfig()
    reg = reg_normal_matrix(conn, cfg.solver.lambda_reg)
    return sys, prior, reg, cfg


@pytest.mark.parametrize("n,max_tile", [(700, None), (1500, 256)])
def test_fused_irls_matches_xla_path(n, max_tile, monkeypatch):
    """The whole fused solve (while loop + kernel) must reproduce the XLA
    formulation: twist, b_segm, aver_res, est_cov.  `max_tile=256` forces
    the multi-tile accumulation path (and non-multiple-of-128 padding)."""
    from staticfusion_tpu.kernels import irls_pallas
    from staticfusion_tpu.solver.irls import solve_irls_xla

    if max_tile is not None:
        monkeypatch.setattr(irls_pallas, "_MAX_TILE", max_tile)

    rng = np.random.default_rng(n)
    sys, prior, reg, cfg = _random_system(rng, n)
    b0 = jnp.asarray(rng.uniform(0, 1, 24).astype(np.float32))

    want = solve_irls_xla(sys, b0, prior, reg, cfg)
    got = irls_pallas.solve_irls_fused(sys, b0, prior, reg, cfg,
                                       interpret=True)

    np.testing.assert_allclose(got.twist, want.twist, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(got.b_segm, want.b_segm, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(got.aver_res, want.aver_res, rtol=1e-5)
    np.testing.assert_allclose(got.est_cov, want.est_cov, rtol=2e-3,
                               atol=1e-6)


def test_fused_irls_traced_kb(monkeypatch):
    """kb is scheduled by the apps (warm-up 1.05 vs steady 1.5,
    StaticFusion-datasets.cpp:156-165) so it reaches the kernel traced."""
    from staticfusion_tpu.kernels import irls_pallas
    from staticfusion_tpu.solver.irls import solve_irls_xla

    rng = np.random.default_rng(9)
    sys, prior, reg, cfg = _random_system(rng, 600)
    b0 = jnp.full((24,), 0.5, jnp.float32)

    import jax

    @jax.jit
    def fused(kb):
        return irls_pallas.solve_irls_fused(sys, b0, prior, reg, cfg,
                                            kb=kb, interpret=True)

    for kb in (1.05, 1.5):
        want = solve_irls_xla(sys, b0, prior, reg, cfg, kb=jnp.asarray(kb))
        got = fused(jnp.asarray(kb))
        np.testing.assert_allclose(got.b_segm, want.b_segm, rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(got.twist, want.twist, rtol=2e-4,
                                   atol=2e-6)


def test_bilateral_kernel_randomized_shapes():
    """Property test on randomized shapes (ROADMAP quality item): any
    rows%8==0 image, narrow or lane-tiled wide, must match the XLA path."""
    shape_rng = np.random.default_rng(2026)
    for _ in range(6):
        rows = 8 * int(shape_rng.integers(1, 9))
        cols = int(shape_rng.choice([40, 96, 160, 256, 320, 384, 512, 640]))
        rng = np.random.default_rng(rows * 7919 + cols)
        d = jnp.asarray(_depth_image(rng, rows, cols))
        got = np.asarray(bilateral_pallas.bilateral_filter_mm(
            d, 4.5, interpret=True))
        want = np.asarray(bilateral_ref.bilateral_filter_mm(d, 4.5))
        assert np.all(np.abs(got - want) <= 1.0), (rows, cols)
        assert np.mean(got != want) < 1e-3, (rows, cols)


def test_spd_solve_kernel_randomized():
    """Random SPD systems of random size: the unrolled Pallas Cholesky must
    track the jnp solve across conditioning regimes."""
    shape_rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(shape_rng.integers(2, 33))
        scale = float(shape_rng.choice([1e-2, 1.0, 1e2]))
        rng = np.random.default_rng(n * 131 + int(scale))
        a = rng.normal(size=(n, n)).astype(np.float32) * scale
        spd = a @ a.T + n * scale * scale * np.eye(n, dtype=np.float32)
        b = rng.normal(size=(n,)).astype(np.float32)
        got = np.asarray(smallsolve_pallas.spd_solve(
            jnp.asarray(spd), jnp.asarray(b), interpret=True))
        want = np.linalg.solve(spd.astype(np.float64),
                               b.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)
