"""Bisect the incremental-warp cost: which sub-piece eats the time?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.fusion import incremental
from staticfusion_tpu.fusion.incremental import (_C_HAS, _FIELDS, _N_CH,
                                                 CarriedTexels,
                                                 _global_shift,
                                                 _transform_project)

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
    print(f"{name:36s} {best*1000:7.3f} ms", flush=True)


def main():
    rows, cols, cap = 240, 320, 1 << 17
    cfg = SFConfig(camera=CameraConfig(width=cols, height=rows),
                   fusion=FusionConfig(capacity=cap, incremental_every=8))
    rng = np.random.default_rng(0)
    st = rng.uniform(0.1, 3.0, (_N_CH, rows, cols)).astype(np.float32)
    carried = CarriedTexels(stack=jnp.asarray(st), ok=jnp.asarray(True))
    T = jnp.eye(4)
    tick = jnp.asarray(10, jnp.int32)

    def C(tok, c):
        return c._replace(stack=c.stack + tok * 0)

    timeit("transform_project", lambda tok, c: _transform_project(
        C(tok, c).stack, T, cap, cfg), carried)

    def tp_shift(tok, c):
        stack, vcell, ucell, qz, valid, dy, dx = _transform_project(
            C(tok, c).stack, T, cap, cfg)
        return _global_shift(dy, dx, valid, cfg)

    timeit("  + global_shift", tp_shift, carried)

    def tp_worst(tok, c):
        stack, vcell, ucell, qz, valid, dy, dx = _transform_project(
            C(tok, c).stack, T, cap, cfg)
        sy, sx = _global_shift(dy, dx, valid, cfg)
        ry = jnp.abs(dy - sy)
        rx = jnp.abs(dx - sx)
        return jnp.max(jnp.where(valid, jnp.maximum(ry, rx), 0))

    timeit("  + worst reduction", tp_worst, carried)

    def pad_slice(tok, c):
        stack, vcell, ucell, qz, valid, dy, dx = _transform_project(
            C(tok, c).stack, T, cap, cfg)
        sy, sx = _global_shift(dy, dx, valid, cfg)
        R = cfg.fusion.incremental_window
        M = cfg.fusion.incremental_max_shift
        aug = jnp.concatenate([
            stack[:_C_HAS], valid[None].astype(jnp.float32),
            vcell[None].astype(jnp.float32), ucell[None].astype(jnp.float32),
            qz[None]])
        P = M + R
        pad = jnp.pad(aug, ((0, 0), (P, P), (P, P)))
        return jax.lax.dynamic_slice(
            pad, (0, P - sy - R, P - sx - R),
            (aug.shape[0], rows + 2 * R, cols + 2 * R))

    timeit("  + pad + dynamic_slice", pad_slice, carried)
    timeit("incremental_render (full)",
           lambda tok, c: incremental.incremental_render(
               C(tok, c), T, tick, cap, cfg), carried)
    timeit("motion_fits", lambda tok, c: incremental.motion_fits(
        C(tok, c), T, tick, cap, cfg), carried)


if __name__ == "__main__":
    main()
