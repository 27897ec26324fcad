"""In-graph timing of the incremental-render machinery (token-chained to
cancel the axon dispatch overhead, like profile_stages.py): what does each
piece cost inside a fused program, and what does fuse_frame cost with the
warp vs the full render?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.fusion import backend, incremental, surfels
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step

K = int(os.environ.get("SF_PROF_K", "16"))


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(name, fn, *args, n=3):
    @jax.jit
    def loop(*a):
        def body(i, tok):
            out = fn(tok, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return tok + jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _sync(loop(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(loop(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:34s} {best*1000:7.3f} ms", flush=True)
    return best


def main():
    cfg0 = SFConfig(camera=CameraConfig(width=320, height=240),
                    fusion=FusionConfig(capacity=1 << 18))
    cfg8 = SFConfig(camera=CameraConfig(width=320, height=240),
                    fusion=FusionConfig(capacity=1 << 18,
                                        incremental_every=8))

    tw = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    frames, _ = synthetic.make_sequence(cfg0, 5, tw)

    def F(i, cfg):
        rgb, d, _ = frames[i]
        return Frame(rgb=jnp.asarray(rgb), depth_mm=jnp.asarray(d))

    # Build a steady state with a valid carried snapshot under cfg8.
    st, _ = bootstrap_step(F(0, cfg8), F(1, cfg8), jnp.eye(4), cfg8)
    count = int(st.smap.count())
    tier = max(4096, surfels.next_pow2(count + count // 4 + 4096))
    st = st._replace(smap=surfels.compact_map(st.smap, tier))
    st, _ = slam_step(st, F(2, cfg8), cfg8)   # full render, seeds carried
    st, _ = slam_step(st, F(3, cfg8), cfg8)   # warp frame
    carried = st.carried
    smap = st.smap
    pose = st.curr_pose
    tick = st.tick
    T = jnp.eye(4)
    cap = smap.capacity
    print(f"tier={cap} count={count}", flush=True)

    rgb, d, _ = frames[4]
    raw = jnp.asarray(d) / 1000.0
    sp = jnp.ones(raw.shape)

    def salt(tok, x):
        return jax.tree_util.tree_map(
            lambda a: (a + tok.astype(a.dtype) if a.dtype != jnp.bool_ else a),
            x)

    timeit("incremental_render", lambda tok, c: incremental.incremental_render(
        c._replace(stack=c.stack + tok * 0), T, tick, cap, cfg8), carried)
    timeit("motion_fits", lambda tok, c: incremental.motion_fits(
        c._replace(stack=c.stack + tok * 0), T, tick, cap, cfg8), carried)

    def fuse(cfg, use_carried):
        def run(tok, *a):
            return backend.fuse_frame(
                smap._replace(pos=smap.pos + tok * 0), pose, T, raw, raw,
                jnp.asarray(rgb), sp, tick, cfg,
                carried=(carried if use_carried else None))
        return run

    timeit("fuse_frame full (no carry)", fuse(cfg0, False))
    timeit("fuse_frame incr (warp frame)", fuse(cfg8, True))


if __name__ == "__main__":
    main()
