"""Microbench: scatter/gather/nonzero primitive costs at pipeline sizes.

Measured *in-graph* (K iterations chained inside one jit, salted against
CSE) so the axon tunnel's multi-ms per-dispatch overhead cancels.

Questions:
  1. does a (N,16)-wide scatter cost ~= a (N,) scatter (i.e. should the
     surfel SoA be packed into one matrix so each pass does ONE scatter)?
  2. what do nonzero/cumsum cost at capacity sizes?
  3. gather costs, narrow vs wide.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 240 * 320          # pixels
CAP = 1 << 17          # surfel capacity tier
K = 16


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit(name, fn, *args, n=5):
    """Run fn K times inside one jit; the iteration's output is folded into
    a float carry (×1e-20) that salts the next iteration, defeating CSE."""

    @jax.jit
    def loop(*a):
        def body(i, tok):
            out = fn(tok, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    sync(loop(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(loop(*args))
    print(f"{name:46s} {(time.perf_counter()-t0)/(n*K)*1000:9.3f} ms",
          flush=True)


def main():
    print("backend:", jax.devices()[0].platform, "P:", P, "CAP:", CAP,
          flush=True)
    key = jax.random.PRNGKey(0)
    tgt = jax.random.randint(key, (P,), 0, CAP)
    val1 = jnp.ones((P,))
    val16 = jnp.ones((P, 16))
    base1 = jnp.zeros((CAP,))
    base16 = jnp.zeros((CAP, 16))
    mask = jax.random.bernoulli(key, 0.5, (CAP,))
    idx = jax.random.randint(key, (P,), 0, CAP)

    timeit("scatter set (P,)->(CAP,)",
           lambda tok, b, t, v: b.at[t].set(v + tok, mode="drop"),
           base1, tgt, val1)
    timeit("scatter set (P,16)->(CAP,16)",
           lambda tok, b, t, v: b.at[t].set(v + tok, mode="drop"),
           base16, tgt, val16)
    timeit("scatter set x9 (P,)->(CAP,)",
           lambda tok, b, t, v: sum(
               b.at[t].set(v + tok + i, mode="drop").sum()
               for i in range(9)), base1, tgt, val1)
    timeit("scatter min (P,)->(CAP,)",
           lambda tok, b, t, v: b.at[t].min(v + tok, mode="drop"),
           base1, tgt, val1)
    timeit("scatter add (P,)->(CAP,)",
           lambda tok, b, t, v: b.at[t].add(v + tok, mode="drop"),
           base1, tgt, val1)
    timeit("gather (CAP,)[P]",
           lambda tok, a, i: (a + tok)[i], base1, idx)
    timeit("gather (CAP,16)[P]",
           lambda tok, a, i: (a + tok)[i], base16, idx)
    timeit("nonzero size=P over CAP",
           lambda tok, m: jnp.nonzero(m & (tok < 1.0), size=P,
                                      fill_value=CAP)[0], mask)
    timeit("cumsum over CAP",
           lambda tok, m: jnp.cumsum((m & (tok < 1.0)).astype(jnp.int32)),
           mask)
    timeit("cumsum over P",
           lambda tok, m: jnp.cumsum(
               (m[:P] & (tok < 1.0)).astype(jnp.int32)), mask)
    timeit("argsort CAP int32",
           lambda tok, m: jnp.argsort(
               jnp.where(m & (tok < 1.0), 0, 1)), mask)
    timeit("elementwise (CAP,16) mul",
           lambda tok, a: (a + tok) * 1.5, base16)


if __name__ == "__main__":
    main()
