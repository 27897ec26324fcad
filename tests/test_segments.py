import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.ops import segments, zbuffer


def test_segment_sums_match_scatter(rng):
    n, t = 500, 64
    targets = rng.integers(0, t, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    v1 = rng.normal(size=n).astype(np.float32)
    v2 = rng.normal(size=n).astype(np.float32)
    s1, s2 = segments.segment_sums(jnp.asarray(targets),
                                   [jnp.asarray(v1), jnp.asarray(v2)],
                                   jnp.asarray(valid), t)
    ref1 = np.zeros(t)
    ref2 = np.zeros(t)
    np.add.at(ref1, targets[valid], v1[valid])
    np.add.at(ref2, targets[valid], v2[valid])
    np.testing.assert_allclose(np.asarray(s1), ref1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), ref2, atol=1e-4)


def test_segment_min_matches_zbuffer(rng):
    n, t = 400, 50
    targets = rng.integers(0, t, n).astype(np.int32)
    depth = rng.random(n).astype(np.float32)
    valid = rng.random(n) > 0.3
    payload = np.arange(n, dtype=np.int32)

    w_ref, z_ref = zbuffer.zbuffer_scatter(jnp.asarray(targets),
                                           jnp.asarray(depth),
                                           jnp.asarray(valid), t)
    w_new, z_new = segments.segment_min_argmin(jnp.asarray(targets),
                                               jnp.asarray(depth),
                                               jnp.asarray(payload),
                                               jnp.asarray(valid), t)
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_new))
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_new))


def test_segment_min_tie_break(rng):
    targets = jnp.asarray([3, 3, 3], jnp.int32)
    depth = jnp.asarray([1.0, 1.0, 1.0])
    payload = jnp.asarray([7, 2, 9], jnp.int32)
    w, _ = segments.segment_min_argmin(targets, depth, payload,
                                       jnp.ones(3, bool), 5)
    assert int(w[3]) == 2  # smallest payload wins exact ties


def test_bincount_matmul(rng):
    n, k = 300, 25
    labels = rng.integers(0, k + 1, n).astype(np.int32)  # includes sentinel
    values = rng.normal(size=n).astype(np.float32)
    valid = labels < k
    sums, counts = segments.bincount_matmul(jnp.asarray(labels),
                                            jnp.asarray(values),
                                            jnp.asarray(valid), k)
    ref = np.zeros(k)
    np.add.at(ref, labels[valid], values[valid])
    np.testing.assert_allclose(np.asarray(sums), ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.bincount(labels[valid], minlength=k))
