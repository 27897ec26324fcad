"""Incremental index-map rendering (fusion/incremental.py): the texel-warp
must reproduce the scatter+gather render's winners (same packed-key order)
whenever the carried set covers the view, and the pipeline with the warp
enabled must track the full-render pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.fusion import incremental
from staticfusion_tpu.fusion.incremental import (CarriedTexels, _C_HAS,
                                                 _C_ID, _FIELDS, _N_CH)
from staticfusion_tpu.fusion.texelmap import INT_MAX, id_bits_for
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step

CAM = CameraConfig(width=80, height=64)
CFG = SFConfig(camera=CAM,
               fusion=FusionConfig(capacity=1 << 14, incremental_every=4))


def _grid_carried(rng, rows, cols, cfg, jitter=0.3):
    """A carried snapshot whose surfel at texel (v,u) backprojects from
    within that texel (so a zero-motion warp must round-trip exactly)."""
    cam = cfg.camera
    z = rng.uniform(0.5, 4.0, (rows, cols)).astype(np.float32)
    uu = np.arange(cols)[None, :] + 0.5 + rng.uniform(-jitter, jitter,
                                                      (rows, cols))
    vv = np.arange(rows)[:, None] + 0.5 + rng.uniform(-jitter, jitter,
                                                      (rows, cols))
    x = (uu - cam.cx) / cam.fx * z
    y = (vv - cam.cy) / cam.fy * z
    n = rng.normal(size=(rows, cols, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    ids = rng.permutation(rows * cols).reshape(rows, cols).astype(np.float32)
    stack = np.zeros((_N_CH, rows, cols), np.float32)
    vals = dict(x=x, y=y, z=z, nx=n[..., 0], ny=n[..., 1], nz=n[..., 2],
                radius=rng.uniform(0.001, 0.05, (rows, cols)),
                conf=rng.uniform(0.05, 0.9, (rows, cols)),
                init_time=np.full((rows, cols), 3.0),
                last_time=np.full((rows, cols), 5.0),
                r=rng.uniform(0, 1, (rows, cols)),
                g=rng.uniform(0, 1, (rows, cols)),
                b=rng.uniform(0, 1, (rows, cols)),
                hist=rng.integers(1, 9, (rows, cols)).astype(np.float32))
    for i, name in enumerate(_FIELDS):
        stack[i] = vals[name]
    stack[_C_ID] = ids
    stack[_C_HAS] = 1.0
    return CarriedTexels(stack=jnp.asarray(stack), ok=jnp.asarray(True))


def test_identity_warp_round_trips():
    rng = np.random.default_rng(0)
    rows, cols = 32, 40
    cfg = SFConfig(camera=CameraConfig(width=cols, height=rows),
                   fusion=FusionConfig(capacity=1 << 12,
                                       incremental_every=4))
    carried = _grid_carried(rng, rows, cols, cfg)
    tex = incremental.incremental_render(carried, jnp.eye(4),
                                         jnp.asarray(6, jnp.int32),
                                         1 << 12, cfg)
    assert bool(jnp.all(tex.has))
    np.testing.assert_array_equal(np.asarray(tex.idx),
                                  np.asarray(carried.stack[_C_ID], np.int32))
    for i, name in enumerate(_FIELDS):
        np.testing.assert_allclose(np.asarray(getattr(tex, name)),
                                   np.asarray(carried.stack[i]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=name)


def test_warp_matches_numpy_zbuffer_under_rotation():
    """Oracle: rasterize the transformed carried points in NumPy with the
    packed-key rule and compare winners."""
    rng = np.random.default_rng(1)
    rows, cols = 32, 40
    cap = 1 << 12
    cfg = SFConfig(camera=CameraConfig(width=cols, height=rows),
                   fusion=FusionConfig(capacity=cap, incremental_every=4))
    cam = cfg.camera
    carried = _grid_carried(rng, rows, cols, cfg)

    th = np.deg2rad(0.8)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float32)
    T[:3, 3] = [0.004, -0.003, 0.006]

    tex = incremental.incremental_render(carried, jnp.asarray(T),
                                         jnp.asarray(6, jnp.int32), cap, cfg)

    st = np.asarray(carried.stack)
    p = np.stack([st[0], st[1], st[2]], -1).reshape(-1, 3)
    Ti = np.linalg.inv(T)
    p2 = p @ Ti[:3, :3].T + Ti[:3, 3]
    z = p2[:, 2]
    u = np.floor(cam.fx * p2[:, 0] / z + cam.cx).astype(int)
    v = np.floor(cam.fy * p2[:, 1] / z + cam.cy).astype(int)
    ib = id_bits_for(cap)
    dlevels = (1 << (31 - ib)) - 1
    qz = np.clip((z * (dlevels / cfg.fusion.depth_max)).astype(np.int64),
                 0, dlevels)
    ids = st[_C_ID].ravel().astype(np.int64)
    valid = (z > 0) & (z <= cfg.fusion.depth_max) & (u >= 0) & (u < cols) \
        & (v >= 0) & (v < rows)
    best = {}
    for i in np.nonzero(valid)[0]:
        key = (qz[i] << ib) | ids[i]
        cell = (v[i], u[i])
        if cell not in best or key < best[cell]:
            best[cell] = key
    want = np.full((rows, cols), INT_MAX, np.int64)
    for (vv_, uu_), key in best.items():
        want[vv_, uu_] = key & ((1 << ib) - 1)
    np.testing.assert_array_equal(np.asarray(tex.idx), want)


def test_motion_gate():
    rng = np.random.default_rng(2)
    rows, cols = 32, 40
    cap = 1 << 12
    cfg = SFConfig(camera=CameraConfig(width=cols, height=rows),
                   fusion=FusionConfig(capacity=cap, incremental_every=4))
    carried = _grid_carried(rng, rows, cols, cfg)
    tick = jnp.asarray(6, jnp.int32)
    assert bool(incremental.motion_fits(carried, jnp.eye(4), tick, cap, cfg))
    # Pure yaw is absorbed by the global shift; strong roll is not.
    th = np.deg2rad(10.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    assert not bool(incremental.motion_fits(carried, jnp.asarray(T), tick,
                                            cap, cfg))
    # Invalidated snapshots never fit.
    assert not bool(incremental.motion_fits(
        carried._replace(ok=jnp.asarray(False)), jnp.eye(4), tick, cap, cfg))


def _run_pipeline(cfg, n=12):
    tw = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    frames, _ = synthetic.make_sequence(cfg, n, tw)

    def F(i):
        rgb, d, _ = frames[i]
        return Frame(rgb=jnp.asarray(rgb), depth_mm=jnp.asarray(d))

    st, _ = bootstrap_step(F(0), F(1), jnp.eye(4), cfg)
    poses = []
    for i in range(2, n):
        st, out = slam_step(st, F(i), cfg)
        poses.append(np.asarray(out.curr_pose))
    return np.stack(poses), st


def test_pipeline_equivalence_and_carried_state():
    base = SFConfig(camera=CAM, fusion=FusionConfig(capacity=1 << 16))
    incr = SFConfig(camera=CAM, fusion=FusionConfig(capacity=1 << 16,
                                                    incremental_every=4))
    p0, s0 = _run_pipeline(base)
    p1, s1 = _run_pipeline(incr)
    assert s0.carried is None
    assert s1.carried is not None and bool(s1.carried.ok)
    # Trajectory must track the full-render pipeline closely (a few mm at
    # this tiny 80x64 test resolution; the QVGA accuracy suite pins the
    # real-operating-point cost in ACCURACY.md).
    assert np.abs(p0[:, :3, 3] - p1[:, :3, 3]).max() < 5e-3
    # The map must stay the same size (no runaway duplicate inserts).
    c0, c1 = int(s0.smap.count()), int(s1.smap.count())
    assert abs(c0 - c1) < 0.01 * c0


def test_system_invalidates_carried_on_compaction():
    from staticfusion_tpu.pipeline.system import SlamSystem

    cfg = SFConfig(camera=CAM, fusion=FusionConfig(capacity=1 << 16,
                                                   incremental_every=4))
    tw = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    frames, _ = synthetic.make_sequence(cfg, 6, tw)
    # Large interval: the automatic resize check must not fire during the
    # re-seed assertion below (when it fires and compacts, it invalidates —
    # which is exactly the behavior _invalidate_carried tests directly).
    slam = SlamSystem(cfg, resize_check_interval=1000)
    for i, (rgb, d, _) in enumerate(frames):
        slam.process(rgb, d, i / 30.0)
    assert slam.state.carried is not None
    slam._invalidate_carried()
    assert not bool(slam.state.carried.ok)
    rgb, d, _ = frames[-1]
    slam.process(rgb, d, 99.0)  # full render re-seeds
    assert bool(slam.state.carried.ok)
