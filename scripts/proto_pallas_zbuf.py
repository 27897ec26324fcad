"""Prototype: Pallas scalar-loop z-buffer scatter-min.

Question: how fast is a fori_loop over N surfels doing scalar
read-modify-write into a VMEM framebuffer, vs XLA scatter (~17 ms at
N=131k, S=1.23M)?"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    def kernel(idx_ref, key_ref, fb_ref):
        fb_ref[:] = jnp.full((S,), jnp.int32(2**31 - 1))

        def body(i, _):
            t = idx_ref[i]
            k = key_ref[i]
            old = fb_ref[t]
            fb_ref[t] = jnp.minimum(old, k)
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    @jax.jit
    def run(idx, key):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, key)

    return run


def main():
    print("backend:", jax.devices()[0].platform)
    N = 1 << 17
    S = 960 * 1280
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, S, jnp.int32)
    kval = jax.random.randint(key, (N,), 0, 2**30, jnp.int32)

    run = make_kernel(N, S)
    out = timeit(f"pallas scalar scatter-min N={N}", run, idx, kval)

    # Correctness vs XLA
    ref = jnp.full((S,), jnp.int32(2**31 - 1)).at[idx].min(kval)
    print("matches XLA scatter:", bool(jnp.array_equal(out, ref)))

    N2 = 1 << 20
    idx2 = jax.random.randint(key, (N2,), 0, S, jnp.int32)
    kv2 = jax.random.randint(key, (N2,), 0, 2**30, jnp.int32)
    run2 = make_kernel(N2, S)
    timeit(f"pallas scalar scatter-min N={N2}", run2, idx2, kv2)


if __name__ == "__main__":
    main()
