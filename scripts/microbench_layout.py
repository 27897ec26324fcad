"""Layout microbench: minor-dim-3/6/25 arrays vs channel-major transposes.

TPU HBM stores f32 in (8, 128) tiles — an (N, 3) array wastes 125/128 of
every tile's lanes.  Measures the real cost of the shapes the SLAM pipeline
uses (N = surfel capacity or pixel count).  Each op runs K times inside one
jit (chained through a salt) so per-dispatch tunnel overhead cancels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 16


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit(name, fn, *args, n=3):
    """fn(*args, salt) -> array; runs K times in-graph."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, acc)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    sync(loop(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(loop(*args))
    print(f"{name:52s} {(time.perf_counter()-t0)/(n*K)*1000:9.3f} ms",
          flush=True)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)

    N = 1 << 18  # surfel capacity
    P = 320 * 240  # pixels

    # --- (N,3) blend, like apply_updates ---
    a3 = jax.random.normal(key, (N, 3))
    b3 = jax.random.normal(key, (N, 3))
    w = jax.random.uniform(key, (N,))
    timeit("blend (N,3)", lambda a, b, w, s: w[:, None] * a
           + (1 - w[:, None] + s) * b, a3, b3, w)
    a3t, b3t = a3.T.copy(), b3.T.copy()
    timeit("blend (3,N)", lambda a, b, w, s: w[None, :] * a
           + (1 - w[None, :] + s) * b, a3t, b3t, w)

    # --- gram matrix (N,6) vs (6,N), like IRLS normal equations ---
    A = jax.random.normal(key, (2 * P, 6))
    At = A.T.copy()
    w2 = jax.random.uniform(key, (2 * P,))

    def gram_row(A, w, s):
        Aw = A * (w[:, None] + s)
        return jnp.einsum("ni,nj->ij", Aw, Aw,
                          preferred_element_type=jnp.float32)

    def gram_chan(At, w, s):
        Aw = At * (w[None, :] + s)
        return jnp.einsum("in,jn->ij", Aw, Aw,
                          preferred_element_type=jnp.float32)

    timeit("gram (2P,6)", gram_row, A, w2)
    timeit("gram (6,2P)", gram_chan, At, w2)

    x6 = jax.random.normal(key, (6,))
    timeit("matvec (2P,6)@(6,)", lambda A, x, s: A @ (x + s), A, x6)
    timeit("matvec (6,)@(6,2P)", lambda At, x, s: (x + s) @ At, At, x6)

    # --- onehot reductions (P,25) vs (25,P) ---
    lbl = jax.random.randint(key, (P,), 0, 25)
    oh = (lbl[:, None] == jnp.arange(25)[None, :]).astype(jnp.float32)
    oht = oh.T.copy()
    r = jax.random.normal(key, (P,))
    b25 = jax.random.uniform(key, (25,))

    timeit("onehot sums (P,)@(P,25)", lambda r, o, s: (r + s) @ o, r, oh)
    timeit("onehot sums (25,P)@(P,)", lambda o, r, s: o @ (r + s), oht, r)
    timeit("onehot bcast (P,25)@(25,)", lambda o, b, s: o @ (b + s), oh, b25)
    timeit("onehot bcast (25,)@(25,P)", lambda b, o, s: (b + s) @ o, b25, oht)

    # --- gather rows: stacked (13,N)[:, idx] vs (N,13)[idx] ---
    S = P
    idx = jax.random.randint(key, (S,), 0, N)
    M13 = jax.random.normal(key, (13, N))
    M13r = M13.T.copy()
    timeit("gather (13,N)[:,idx]",
           lambda M, i, s: M[:, i + (s * 0).astype(jnp.int32)], M13, idx)
    timeit("gather (N,13)[idx]",
           lambda M, i, s: M[i + (s * 0).astype(jnp.int32)], M13r, idx)
    M1 = M13[0].copy()
    timeit("gather (N,)[idx]",
           lambda M, i, s: M[i + (s * 0).astype(jnp.int32)], M1, idx)

    # --- scatter-min packed keys: N updates into S slots ---
    tgt = jax.random.randint(key, (N,), 0, S)
    kv = jax.random.randint(key, (N,), 0, 2**30, jnp.int32)

    def scat_min(t, k, s):
        return jnp.full((S + 1,), 2**31 - 1, jnp.int32).at[
            t + (s * 0).astype(jnp.int32)].min(k)

    timeit(f"scatter-min N={N>>10}k -> S={S>>10}k", scat_min, tgt, kv)
    timeit(f"scatter-min N={P>>10}k -> S={S>>10}k", scat_min, tgt[:P], kv[:P])

    # --- scatter-add 5P like warp splat ---
    t5 = jax.random.randint(key, (5 * P,), 0, P)
    v5 = jax.random.normal(key, (5 * P,))

    def scat_add(t, v, s):
        return jnp.zeros((P + 1,)).at[t + (s * 0).astype(jnp.int32)].add(v)

    timeit("scatter-add 5P -> P", scat_add, t5, v5)


if __name__ == "__main__":
    main()
