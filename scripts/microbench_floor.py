"""Characterize the per-iteration floor of lax.fori_loop on this backend,
vs an unrolled in-graph chain."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def bench(name, jitted, *args, n=5):
    sync(jitted(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(jitted(*args))
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1000:9.3f} ms", flush=True)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 128))

    for K in (16, 64):
        @jax.jit
        def loop(x, K=K):
            return jax.lax.fori_loop(
                0, K, lambda i, a: a * 1.0000001 + 1e-9, x)

        bench(f"fori_loop tiny body K={K}", loop, x)

    for K in (16, 64):
        @jax.jit
        def chain(x, K=K):
            for _ in range(K):
                x = x * 1.0000001 + 1e-9
            return x

        bench(f"unrolled tiny chain K={K}", chain, x)

    # big elementwise op, unrolled chain
    N = 1 << 18
    a3 = jax.random.normal(key, (N, 3))
    b3 = jax.random.normal(key, (N, 3))
    w = jax.random.uniform(key, (N,))

    for K in (16,):
        @jax.jit
        def chain_blend(a, b, w, K=K):
            acc = jnp.float32(0)
            for _ in range(K):
                out = (w[:, None] + acc) * a + (1 - w[:, None]) * b
                acc = out.ravel()[0] * 1e-20
            return acc

        bench(f"unrolled blend (N,3) K={K} (per-iter below)", chain_blend,
              a3, b3, w)

    a3t, b3t = a3.T.copy(), b3.T.copy()

    @jax.jit
    def chain_blend_t(a, b, w):
        acc = jnp.float32(0)
        for _ in range(16):
            out = (w[None, :] + acc) * a + (1 - w[None, :]) * b
            acc = out.ravel()[0] * 1e-20
        return acc

    bench("unrolled blend (3,N) K=16", chain_blend_t, a3t, b3t, w)

    # dispatch floor: single trivial op
    @jax.jit
    def single(x):
        return x * 2.0

    bench("single tiny op (dispatch floor)", single, x)


if __name__ == "__main__":
    main()
