"""Microbenchmarks of the scatter/gather/sort primitives underlying the
fusion renders, on the current backend."""

import sys
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
    print(f"{name:42s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.devices()[0].platform)
    N = 1 << 20          # surfels
    S = 960 * 1280       # 4x texels
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, S, jnp.int32)
    depth = jax.random.uniform(key, (N,)) * 4.0
    payload = jax.random.uniform(key, (N,))
    payload13 = jax.random.uniform(key, (N, 13))
    tex_idx = jax.random.randint(key, (S,), 0, N, jnp.int32)

    timeit("scatter_min f32 1M->1.23M", jax.jit(
        lambda i, d: jnp.full((S,), jnp.inf).at[i].min(d)), idx, depth)
    timeit("scatter_min i32 1M->1.23M", jax.jit(
        lambda i, d: jnp.full((S,), 2**31 - 1, jnp.int32).at[i].min(
            d.astype(jnp.int32))), idx, depth)
    timeit("scatter_add f32 1M->1.23M", jax.jit(
        lambda i, d: jnp.zeros((S,)).at[i].add(d)), idx, depth)
    timeit("gather 1.23M from (1M,) f32", jax.jit(
        lambda t, p: p[t]), tex_idx, payload)
    timeit("gather 1.23M from (1M,13) f32", jax.jit(
        lambda t, p: p[t]), tex_idx, payload13)
    timeit("sort 1M by key (1 operand)", jax.jit(
        lambda d: jnp.sort(d)), depth)
    timeit("sort 1M (2 operands)", jax.jit(
        lambda i, d: jax.lax.sort((i, d), num_keys=1)), idx, depth)
    timeit("argsort 1M i32", jax.jit(lambda i: jnp.argsort(i)), idx)

    # Packed key trick: (texel_id, depth) -> one i32 sortable key? texel ids
    # need 21 bits; depth bits 11 -> coarse.  Instead sort i64? TPU i64 is
    # emulated; measure it.
    timeit("sort 1M i64", jax.jit(
        lambda i, d: jnp.sort((i.astype(jnp.int64) << 32)
                              | d.astype(jnp.int64))), idx, depth)

    # Segment min via sorted segments: sort by texel then take first of run.
    def sorted_seg(i, d):
        order = jnp.argsort(i)          # stable
        si, sd = i[order], d[order]
        first = jnp.concatenate([jnp.array([True]), si[1:] != si[:-1]])
        return si, jnp.where(first, sd, jnp.inf)

    timeit("argsort+gather2 segment heads", jax.jit(sorted_seg), idx, depth)

    # 2D image-shaped scatter via one-hot matmul? N too big. Skip.

    # histogram via bincount (scatter-add of ones)
    timeit("bincount 1M->1.23M", jax.jit(
        lambda i: jnp.bincount(i, length=S)), idx)


if __name__ == "__main__":
    main()
