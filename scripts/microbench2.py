"""Round 2: validate the redesigned render primitives at several N."""

import time

import jax
import jax.numpy as jnp
import numpy as np


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


def bench_for(N, S):
    print(f"--- N={N}  S={S}")
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, S, jnp.int32)
    depth = jax.random.uniform(key, (N,)) * 4.0
    payload = jax.random.uniform(key, (N,))
    payload4 = jax.random.uniform(key, (N, 4))
    payload8 = jax.random.uniform(key, (N, 8))

    # Packed single-key z-buffer: qdepth(11b) << 20 | id(20b), one scatter.
    def packed_render(i, d):
        qd = jnp.clip((d * 512.0).astype(jnp.int32), 0, 2047)
        ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        k = (qd << 20) | ids
        fb = jnp.full((S,), jnp.int32(2**31 - 1)).at[i].min(k)
        return fb

    fb = timeit("packed key scatter-min", jax.jit(packed_render), idx, depth)

    # winner check at N-scale: gather my key back, compare.
    def winner_mask(i, d, fb):
        qd = jnp.clip((d * 512.0).astype(jnp.int32), 0, 2047)
        ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        k = (qd << 20) | ids
        return fb[i] == k

    wm = timeit("winner-check gather N from S", jax.jit(winner_mask),
                idx, depth, fb)

    # scatter-carry: one field
    def carry1(i, w, p):
        t = jnp.where(w, i, S)
        return jnp.zeros((S,), p.dtype).at[t].set(p, mode="drop")

    timeit("scatter-carry 1 field (set)", jax.jit(carry1), idx, wm, payload)

    def carry4(i, w, p):
        t = jnp.where(w, i, S)
        return jnp.zeros((S, 4), p.dtype).at[t].set(p, mode="drop")

    timeit("scatter-carry (N,4) row", jax.jit(carry4), idx, wm, payload4)

    def carry8(i, w, p):
        t = jnp.where(w, i, S)
        return jnp.zeros((S, 8), p.dtype).at[t].set(p, mode="drop")

    timeit("scatter-carry (N,8) row", jax.jit(carry8), idx, wm, payload8)

    # compaction: keep-mask -> prefix pack of M slots (the clean pass).
    keep = payload > 0.3

    def compact(k, p):
        order = jnp.argsort(~k)        # keepers first, stable
        return p[order], jnp.sum(k)

    timeit("compact via argsort(bool)+gather", jax.jit(compact), keep, payload)

    def compact8(k, p):
        order = jnp.argsort(~k)
        return p[order]

    timeit("compact (N,8) via argsort+gather", jax.jit(compact8), keep,
           payload8)

    def compact_cumsum(k, p):
        tgt = jnp.where(k, jnp.cumsum(k) - 1, N)
        return jnp.zeros((N,), p.dtype).at[tgt].set(p, mode="drop")

    timeit("compact via cumsum+scatter", jax.jit(compact_cumsum), keep,
           payload)


def main():
    print("backend:", jax.devices()[0].platform)
    bench_for(1 << 17, 960 * 1280)
    bench_for(1 << 17, 240 * 320)
    bench_for(1 << 20, 960 * 1280)


if __name__ == "__main__":
    main()
