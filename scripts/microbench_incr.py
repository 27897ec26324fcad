"""Standalone cost of the incremental warp pieces at QVGA bench shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.fusion import incremental
from staticfusion_tpu.fusion.incremental import _N_CH, CarriedTexels


def timeit(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:30s} {dt*1000:7.3f} ms")


def main():
    rows, cols, cap = 240, 320, 1 << 17
    cfg = SFConfig(camera=CameraConfig(width=cols, height=rows),
                   fusion=FusionConfig(capacity=cap, incremental_every=8))
    rng = np.random.default_rng(0)
    st = rng.uniform(0.1, 3.0, (_N_CH, rows, cols)).astype(np.float32)
    carried = CarriedTexels(stack=jnp.asarray(st), ok=jnp.asarray(True))
    T = jnp.eye(4)
    tick = jnp.asarray(10, jnp.int32)

    timeit("incremental_render", lambda c: incremental.incremental_render(
        c, T, tick, cap, cfg), carried)
    timeit("motion_fits", lambda c: incremental.motion_fits(
        c, T, tick, cap, cfg), carried)
    timeit("transform_project", lambda c: incremental._transform_project(
        c.stack, T, cap, cfg), carried)

    # build_carried cost proxy: the cumsum + 16-channel combine
    timeit("cumsum77k", lambda x: jnp.cumsum(x),
           jnp.ones((rows * cols,), jnp.int32))


if __name__ == "__main__":
    main()
