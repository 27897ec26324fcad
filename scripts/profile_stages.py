"""Per-stage timing of the SLAM pipeline on the current JAX backend.

Each stage runs K times *inside one jit* chained through a token so the
per-dispatch tunnel overhead (~5 ms on axon) cancels out."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig, FusionConfig
from staticfusion_tpu.fusion import (association, backend, clean, indexmap,
                                     predict, surfels, update)
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.ops import bilateral
from staticfusion_tpu.ops.pyramid import build_pyramid
from staticfusion_tpu.ops.warp import warp_images_inverse
from staticfusion_tpu.solver.runsolver import run_solver
from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step

K = int(os.environ.get("SF_PROF_K", "8"))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    return out


def timeit(name, fn, *args, n=3):
    """In-graph: run fn K times inside one jit, salted to defeat CSE."""

    @jax.jit
    def loop(*a):
        def body(i, tok):
            out = fn(*a, tok)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _sync(loop(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(loop(*args))
    dt = (time.perf_counter() - t0) / (n * K)
    print(f"{name:30s} {dt*1000:9.2f} ms", flush=True)


def main():
    capacity = int(os.environ.get("SF_CAP", str(1 << 18)))
    config = SFConfig(fusion=FusionConfig(capacity=capacity))
    print("backend:", jax.devices()[0].platform, "capacity:", capacity,
          "F:", config.fusion.index_factor, flush=True)

    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    frames, _ = synthetic.make_sequence(config, 3, twist)
    rgb, depth_mm, _ = frames[2]
    rgb_j = jnp.asarray(rgb)
    depth_j = jnp.asarray(depth_mm)

    state, _ = bootstrap_step(
        Frame(rgb=jnp.asarray(frames[0][0]), depth_mm=jnp.asarray(frames[0][1])),
        Frame(rgb=jnp.asarray(frames[1][0]), depth_mm=jnp.asarray(frames[1][1])),
        jnp.eye(4), config)
    smap = state.smap
    pose = state.curr_pose
    tick = state.tick

    timeit("bilateral", lambda d, s: bilateral.bilateral_filter_mm(
        d + s, 4.5), depth_j)
    raw_m = bilateral.metricise_depth_mm(depth_j, 4.5)
    filt_m = bilateral.metricise_depth_mm(
        bilateral.bilateral_filter_mm(depth_j, 4.5), 4.5)
    intensity = (0.299 * rgb_j[..., 0] + 0.587 * rgb_j[..., 1]
                 + 0.114 * rgb_j[..., 2])

    timeit("build_pyramid", lambda d, i, s: build_pyramid(
        d + s, i, config), filt_m, intensity)
    pyr = build_pyramid(filt_m, intensity, config)

    timeit("warp_splat(level0)", lambda p, s: warp_images_inverse(
        p, jnp.eye(4) + s * jnp.zeros((4, 4)), config.camera.fovh), pyr[0])

    timeit("run_solver", lambda c, p, t, s: run_solver(
        c, p, t + s, config), pyr, pyr, state.twist_old)

    # Under real inter-frame motion (the while-loops run full trips).
    rgb1 = jnp.asarray(frames[1][0])
    filt1 = bilateral.metricise_depth_mm(
        bilateral.bilateral_filter_mm(jnp.asarray(frames[1][1]), 4.5), 4.5)
    int1 = (0.299 * rgb1[..., 0] + 0.587 * rgb1[..., 1]
            + 0.114 * rgb1[..., 2])
    pyr_prev = build_pyramid(filt1, int1, config)
    timeit("run_solver(motion)", lambda c, p, t, s: run_solver(
        c, p, t + s, config), pyr, pyr_prev, state.twist_old)

    from staticfusion_tpu.pipeline.temporal import compute_temporal_residuals
    labels0 = jnp.zeros(raw_m.shape, jnp.int32)
    timeit("temporal_residuals", lambda r, t, s: compute_temporal_residuals(
        r, jnp.eye(4), jnp.asarray(6, jnp.int32), filt_m + s, intensity,
        labels0, config), state.rings, jnp.asarray(0.0))

    timeit("predict_indices", lambda m, po, t, s: indexmap.predict_indices(
        m._replace(conf=m.conf + s * 0), po, t, config), smap, pose, tick)
    tex, local = indexmap.predict_indices(smap, pose, tick, config)

    sp = jnp.ones(raw_m.shape)
    tier = smap.pos.shape[0]  # live tier may be smaller than capacity
    timeit("associate", lambda tx, s: association.associate(
        tier, tx._replace(z=tx.z + s * 0), raw_m, filt_m, rgb_j, sp,
        pose, tick, jnp.asarray(1.0), config), tex)
    assoc = association.associate(tier, tex, raw_m, filt_m, rgb_j, sp,
                                  pose, tick, jnp.asarray(1.0), config)

    timeit("apply_updates", lambda m, u, s: update.apply_updates(
        m._replace(conf=m.conf + s * 0), u, tick, config), smap, assoc.updates)
    smap2 = update.apply_updates(smap, assoc.updates, tick, config)

    timeit("clean_and_insert", lambda m, tx, nw, s: clean.clean_and_insert(
        m._replace(conf=m.conf + s * 0), tx, local, nw, tick, config),
        smap2, tex, assoc.new)

    timeit("combined_predict", lambda m, s: predict.combined_predict(
        m._replace(conf=m.conf + s * 0), pose, tick, 0.13, config), smap)

    timeit("get_predicted_images", lambda m, s: predict.get_predicted_images(
        m._replace(conf=m.conf + s * 0), pose, tick, filt_m, rgb_j, sp,
        config), smap)

    timeit("fuse_frame", lambda m, s: backend.fuse_frame(
        m._replace(conf=m.conf + s * 0), pose, jnp.eye(4), raw_m, filt_m,
        rgb_j, sp, tick, config), smap)

    timeit("slam_step(full)", lambda st, f, s: slam_step(
        st._replace(tick=st.tick + jnp.int32(s * 0)), f, config),
        state, Frame(rgb=rgb_j, depth_mm=depth_j))


if __name__ == "__main__":
    main()
