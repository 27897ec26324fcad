import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm, logm

from staticfusion_tpu.geometry import se3


@pytest.mark.parametrize("seed", range(5))
def test_exp_matches_scipy_expm(seed):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=6) * 0.5
    T = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    T_ref = expm(np.asarray(se3.hat4(jnp.asarray(xi))))
    np.testing.assert_allclose(T, T_ref, atol=2e-4)  # f32 vs f64 accumulation


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.1, 1.0])
def test_exp_log_roundtrip(scale):
    rng = np.random.default_rng(42)
    xi = rng.normal(size=6) * scale
    T = se3.se3_exp(jnp.asarray(xi, jnp.float32))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, rtol=1e-4, atol=1e-5)


def test_exp_log_fixed_point_large_rotation():
    """Past pi the twist wraps, but exp(log(T)) must still reproduce T."""
    rng = np.random.default_rng(42)
    xi = rng.normal(size=6) * 2.5
    T = se3.se3_exp(jnp.asarray(xi, jnp.float32))
    T2 = se3.se3_exp(se3.se3_log(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-4)


def test_log_matches_scipy_logm():
    rng = np.random.default_rng(7)
    xi = rng.normal(size=6) * 0.3
    T = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)), dtype=np.float64)
    L = logm(T)
    v_ref = L[:3, 3]
    w_ref = np.array([L[2, 1], L[0, 2], L[1, 0]])
    out = np.asarray(se3.se3_log(jnp.asarray(T, jnp.float32)))
    np.testing.assert_allclose(out[:3], v_ref, atol=1e-5)
    np.testing.assert_allclose(out[3:], w_ref, atol=1e-5)


def test_identity_maps():
    assert np.allclose(se3.se3_exp(jnp.zeros(6)), np.eye(4))
    assert np.allclose(se3.se3_log(jnp.eye(4)), np.zeros(6))


def test_inverse():
    xi = jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.1, 0.2])
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T @ se3.se3_inverse(T)), np.eye(4),
                               atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        w = rng.normal(size=3)
        R = se3.so3_exp(jnp.asarray(w, jnp.float32))
        q = se3.rotmat_to_quat(R)
        R2 = se3.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_transform_points():
    xi = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = se3.se3_exp(xi)
    p = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = se3.transform_points(T, p)
    np.testing.assert_allclose(np.asarray(out), [[1, 2, 3], [2, 3, 4]],
                               atol=1e-6)
