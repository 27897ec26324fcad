"""Closed-form SE(3)/SO(3) exponential and logarithm maps.

The reference relies on Eigen's generic 4x4 matrix `exp()`/`log()`
(unsupported MatrixFunctions; FrontEnd.cpp:705-707).  On TPU a generic
matrix-function solver is wasteful and non-jittable, so we use the
Rodrigues closed forms with Taylor guards around theta = 0.

Twist layout matches the reference (FrontEnd.cpp:694-710):
    xi = (vx, vy, vz, wx, wy, wz),  T = expm(hat(xi)).

All functions are pure jnp, fp32-safe, vmap/jit friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat3(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat: (…,3) -> (…,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee3(K: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat3 for (possibly non-exactly-skew) matrices: averages."""
    return 0.5 * jnp.stack(
        [K[..., 2, 1] - K[..., 1, 2],
         K[..., 0, 2] - K[..., 2, 0],
         K[..., 1, 0] - K[..., 0, 1]],
        axis=-1,
    )


def hat4(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) hat: (…,6) -> (…,4,4) with layout (v, w)."""
    v, w = xi[..., :3], xi[..., 3:]
    K = hat3(w)
    top = jnp.concatenate([K, v[..., :, None]], axis=-1)
    bottom = jnp.zeros(xi.shape[:-1] + (1, 4), dtype=xi.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def _sinc(theta):
    """sin(theta)/theta with Taylor guard."""
    small = theta < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)


def _cosc(theta):
    """(1-cos(theta))/theta^2 with Taylor guard."""
    small = theta < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 0.5 - theta * theta / 24.0,
                     (1.0 - jnp.cos(safe)) / (safe * safe))


def _vterm(theta):
    """(theta - sin(theta))/theta^3 with Taylor guard."""
    small = theta < 1e-4
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 / 6.0 - theta * theta / 120.0,
                     (safe - jnp.sin(safe)) / (safe ** 3))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (…,3) axis-angle -> (…,3,3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1)
    K = hat3(w)
    K2 = K @ K
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) rotation -> (…,3) axis-angle. Valid for theta < pi - eps."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w_raw = vee3(R)  # = sin(theta) * axis
    # theta/(2 sin theta) * (R - R^T)^vee ; guard small theta.
    scale = jnp.where(theta < 1e-4, 1.0 + theta * theta / 6.0,
                      theta / jnp.where(theta < 1e-4, 1.0, jnp.sin(theta)))
    return scale[..., None] * w_raw


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(…,6) twist -> (…,4,4) rigid transform."""
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    K = hat3(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + _sinc(theta)[..., None, None] * K + _cosc(theta)[..., None, None] * K2
    V = eye + _cosc(theta)[..., None, None] * K + _vterm(theta)[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.concatenate(
        [jnp.zeros(xi.shape[:-1] + (1, 3), xi.dtype),
         jnp.ones(xi.shape[:-1] + (1, 1), xi.dtype)], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(…,4,4) rigid transform -> (…,6) twist (v, w)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1)
    K = hat3(w)
    K2 = K @ K
    # V^{-1} = I - K/2 + coef * K^2,
    # coef = (1/theta^2) - (1+cos)/(2 theta sin) -> 1/12 as theta -> 0.
    small = theta < 1e-4
    safe = jnp.where(small, 1.0, theta)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        (1.0 / (safe * safe))
        - (1.0 + jnp.cos(safe)) / (2.0 * safe * jnp.sin(safe)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef[..., None, None] * K2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = T[..., 3:4, :]
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,4,4) to points (…,3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(3,3) -> (x, y, z, w) quaternion, TUM trajectory convention.

    Shepperd's branchless-ish method via jnp.where; single matrix only.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 0.0)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 0.0)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 0.0)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    import jax

    idx = jnp.where(
        tr > 0.0, 0,
        jnp.where((m00 > m11) & (m00 > m22), 1, jnp.where(m11 > m22, 2, 3)),
    )
    return jax.lax.switch(idx, [case0, case1, case2, case3])


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z, w) -> (3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
