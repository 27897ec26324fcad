"""Prototype 2: Pallas z-buffer via per-surfel (1,128) row RMW in VMEM.

Framebuffer layout: texel t -> (t // 128, t % 128).  Each loop iteration
loads one 128-lane row, min-merges a one-hot lane, stores it back."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = 2**31 - 1


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1000:9.2f} ms", flush=True)
    return out


def make_kernel(N, S):
    R = S // 128

    def kernel(row_ref, lane_ref, key_ref, fb_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        fb_ref[:] = jnp.full((R, 128), INT_MAX, jnp.int32)

        def body(i, _):
            r = row_ref[i]
            c = lane_ref[i]
            k = key_ref[i]
            row = fb_ref[pl.ds(r, 1), :]
            onehot = jnp.where(lanes == c, k, jnp.int32(INT_MAX))
            fb_ref[pl.ds(r, 1), :] = jnp.minimum(row, onehot)
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    @jax.jit
    def run(idx, key):
        row = idx // 128
        lane = idx % 128
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(row, lane, key)

    return run


def main():
    print("backend:", jax.devices()[0].platform)
    S = 960 * 1280
    key = jax.random.PRNGKey(0)
    for N in (1 << 17,):
        idx = jax.random.randint(key, (N,), 0, S, jnp.int32)
        kval = jax.random.randint(key, (N,), 0, 2**30, jnp.int32)
        run = make_kernel(N, S)
        out = timeit(f"pallas row-RMW scatter-min N={N}", run, idx, kval)
        ref = jnp.full((S,), INT_MAX, jnp.int32).at[idx].min(kval).reshape(S // 128, 128)
        print("matches XLA scatter:", bool(jnp.array_equal(out, ref)),
              flush=True)


if __name__ == "__main__":
    main()
