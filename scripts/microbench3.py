"""In-graph microbenchmarks: run each op K times inside ONE jit (chained
through a data dependency) to exclude the per-dispatch tunnel overhead."""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 32


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit_graph(name, op, *args, n=3):
    """op(args, salt) -> array; run K times chained inside one jit."""

    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = op(*a, carry)
            return jnp.asarray(out).ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    sync(loop(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(loop(*args))
    dt = (time.perf_counter() - t0) / (n * K)
    print(f"{name:52s} {dt*1000:9.3f} ms", flush=True)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    for N, S in ((1 << 17, 960 * 1280), (1 << 17, 240 * 320),
                 (1 << 20, 960 * 1280)):
        print(f"--- N={N} S={S}", flush=True)
        idx = jax.random.randint(key, (N,), 0, S, jnp.int32)
        depth = jax.random.uniform(key, (N,)) * 4.0
        payload = jax.random.uniform(key, (N,))

        timeit_graph("scatter-min f32", lambda i, d, s: jnp.full(
            (S,), jnp.inf).at[i].min(d + s), idx, depth)
        timeit_graph("scatter-set masked (carry)", lambda i, p, s: jnp.zeros(
            (S,), jnp.float32).at[i].set(p + s, mode="drop"), idx, payload)
        timeit_graph("gather N from S", lambda i, s: (
            jnp.zeros((S,)).at[0].set(s)[i]), idx)
        timeit_graph("sort 1-op i32", lambda i, s: jnp.sort(i + s.astype(
            jnp.int32)), idx)
        timeit_graph("sort 2-op (key,val)", lambda i, d, s: jax.lax.sort(
            (i + s.astype(jnp.int32), d), num_keys=1)[0], idx, depth)
        timeit_graph("sorted-unique scatter-set", lambda i, p, s: jnp.zeros(
            (S,), jnp.float32).at[jnp.sort(i)].set(
                p + s, mode="drop", unique_indices=False,
                indices_are_sorted=True), idx, payload)
        timeit_graph("cumsum N", lambda p, s: jnp.cumsum(p + s), payload)
        timeit_graph("elementwise x20 N", lambda p, s: (
            [p := jnp.sin(p + s) for _ in range(20)][-1]), payload)


if __name__ == "__main__":
    main()
