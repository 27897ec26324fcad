"""Per-stage timing of the SLAM pipeline on the current JAX backend."""

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


def _sync(out):
    """block_until_ready does not actually block on the axon tunnel; a
    device->host transfer of any leaf does (in-order execution drains the
    queue)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    return out


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    capacity = int(os.environ.get("SF_CAP", str(1 << 20)))
    config = SFConfig(fusion=FusionConfig(capacity=capacity))
    print("backend:", jax.devices()[0].platform, "capacity:", capacity)

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

    jf = lambda f, **kw: jax.jit(f, **kw)

    filt_mm = timeit("bilateral", jf(
        lambda d: bilateral.bilateral_filter_mm(d, 4.5)), depth_j)
    raw_m = bilateral.metricise_depth_mm(depth_j, 4.5)
    filt_m = bilateral.metricise_depth_mm(filt_mm, 4.5)
    intensity = 0.299 * rgb_j[..., 0] + 0.587 * rgb_j[..., 1] + 0.114 * rgb_j[..., 2]

    pyr = timeit("build_pyramid", jf(
        lambda d, i: build_pyramid(d, i, config)), filt_m, intensity)

    timeit("warp_splat(level0)", jf(
        lambda p, T: warp_images_inverse(p, T, config.camera.fovh)),
        pyr[0], jnp.eye(4))

    timeit("run_solver", jf(
        lambda c, p, t: run_solver(c, p, t, config)), pyr, pyr, state.twist_old)

    tex, local = timeit("predict_indices", jf(
        lambda m, po, t: indexmap.predict_indices(m, po, t, config)),
        smap, pose, tick)

    sp = jnp.ones(raw_m.shape)
    assoc = timeit("associate", jf(
        lambda r, d1, d2, c, s, po, t: association.associate(
            capacity, r, d1, d2, c, s, po, t, jnp.asarray(1.0), config)),
        tex, raw_m, filt_m, rgb_j, sp, pose, tick)

    smap2 = timeit("apply_updates", jf(
        lambda m, u, t: update.apply_updates(m, u, t, config)),
        smap, assoc.updates, tick)

    timeit("clean_and_insert", jf(
        lambda m, tx, lc, nw, t: clean.clean_and_insert(m, tx, lc, nw, t, config)),
        smap2, tex, local, assoc.new, tick)

    timeit("combined_predict", jf(
        lambda m, po, t: predict.combined_predict(m, po, t, 0.13, config)),
        smap, pose, tick)

    timeit("get_predicted_images", jf(
        lambda m, po, t, d, c, s: predict.get_predicted_images(
            m, po, t, d, c, s, config)),
        smap, pose, tick, filt_m, rgb_j, sp)

    timeit("fuse_frame", jf(
        lambda m, po, T, d1, d2, c, s, t: backend.fuse_frame(
            m, po, T, d1, d2, c, s, t, config)),
        smap, pose, jnp.eye(4), raw_m, filt_m, rgb_j, sp, tick)

    timeit("slam_step(full)", lambda s, f: slam_step(s, f, config),
           state, Frame(rgb=rgb_j, depth_mm=depth_j), n=3)


if __name__ == "__main__":
    main()
