"""Geometric K-means clustering of the depth image.

Reference: KMeans.cpp — `initializeKMeans` (63-135), `kMeans3DCoord`
(137-295), `computeRegionConnectivity` (297-341),
`createClustersPyramidUsingKMeans` (343-391).

TPU-native design notes:
* The reference's triangle-inequality pruning (KMeans.cpp:200-211) is a CPU
  trick to avoid distance evaluations; it computes an *exact* nearest center.
  On TPU we evaluate all NUM_CLUSTERS distances as one (pixels, clusters)
  batched VPU/MXU computation — same result, no data-dependent control flow.
* Lloyd iterations run a fixed `kmeans_iters` count with a convergence
  "done" mask replacing the data-dependent break (KMeans.cpp:227).
* Per-cluster medians for initialization use a (clusters, pixels) masked sort.
* Invalid (zero-depth) pixels get the sentinel label NUM_CLUSTERS.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig, NUM_CLUSTERS
from staticfusion_tpu.ops.pyramid import Pyramid


class Clustering(NamedTuple):
    centers: jnp.ndarray        # (3, K) — (depth, x, y) per cluster
    labels: Tuple[jnp.ndarray, ...]  # per pyramid level, int32, K = invalid
    connectivity: jnp.ndarray   # (K, K) bool, symmetric, diag True


def _seed_positions(rows_km: int, cols_km: int):
    """Image-plane seed grid (KMeans.cpp:76-84)."""
    k = NUM_CLUSTERS
    vert_div = math.ceil(math.sqrt(k))
    u_div = cols_km / (k + 1)
    v_div = rows_km / (vert_div + 1)
    u_label = [round((i + 1) * u_div) for i in range(k)]
    v_label = [round((i % vert_div + 1) * v_div) for i in range(k)]
    return jnp.array(u_label, jnp.float32), jnp.array(v_label, jnp.float32)


def initialize_centers(depth: jnp.ndarray, fovh: float) -> jnp.ndarray:
    """Initial (depth, x, y) centers from the seed grid + per-seed-region
    median depth (KMeans.cpp:86-134). `depth` is the half-resolution level."""
    rows_km, cols_km = depth.shape
    k = NUM_CLUSTERS
    u_label, v_label = _seed_positions(rows_km, cols_km)

    vv = jnp.arange(rows_km, dtype=jnp.float32)[:, None]
    uu = jnp.arange(cols_km, dtype=jnp.float32)[None, :]
    # Nearest seed in squared pixel distance.
    d2 = ((vv[..., None] - v_label) ** 2 + (uu[..., None] - u_label) ** 2)
    seed_label = jnp.argmin(d2, axis=-1)  # (rows, cols)
    valid = depth != 0.0

    # Per-seed-region median depth via masked sort over flattened pixels.
    flat_label = jnp.where(valid, seed_label, k).ravel()
    flat_depth = depth.ravel()
    inf = jnp.asarray(jnp.inf, depth.dtype)
    member = flat_label[None, :] == jnp.arange(k)[:, None]          # (K, N)
    masked = jnp.where(member, flat_depth[None, :], inf)
    sorted_d = jnp.sort(masked, axis=1)
    counts = jnp.sum(member, axis=1)
    med_pos = counts // 2  # nth_element at size/2 == upper median (KMeans.cpp:119)
    med = jnp.take_along_axis(sorted_d, med_pos[:, None], axis=1)[:, 0]
    med = jnp.where(counts > 0, med, 0.0)

    inv_f = 2.0 * math.tan(0.5 * fovh) / float(cols_km)
    disp_u = 0.5 * (cols_km - 1)
    disp_v = 0.5 * (rows_km - 1)
    cx = (u_label - disp_u) * med * inv_f
    cy = (v_label - disp_v) * med * inv_f
    return jnp.stack([med, cx, cy], axis=0)  # (3, K)


def _assign(points: jnp.ndarray, valid: jnp.ndarray, centers: jnp.ndarray):
    """Nearest-center labels; invalid pixels -> NUM_CLUSTERS sentinel.

    points: (..., 3) stacked (depth, x, y); centers: (3, K)."""
    diff = points[..., None] - centers[None, None, :, :]   # (R, C, 3, K)
    d2 = jnp.sum(diff * diff, axis=-2)                     # (R, C, K)
    lbl = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return jnp.where(valid, lbl, NUM_CLUSTERS)


def lloyd_iterate(depth: jnp.ndarray, xx: jnp.ndarray, yy: jnp.ndarray,
                  centers0: jnp.ndarray, iters: int, tol: float) -> jnp.ndarray:
    """Fixed-trip Lloyd iterations on (depth, x, y) with convergence masking
    (KMeans.cpp:167-228). Empty clusters collapse to the origin, matching the
    reference's zeroed accumulator (KMeans.cpp:169,219-221)."""
    valid = depth != 0.0
    pts = jnp.stack([depth, xx, yy], axis=-1)              # (R, C, 3)
    flat_pts = pts.reshape(-1, 3)
    flat_valid = valid.ravel()

    def body(_, carry):
        centers, done = carry
        lbl = _assign(pts, valid, centers).ravel()
        lbl = jnp.where(flat_valid, lbl, NUM_CLUSTERS)
        one_hot = (lbl[:, None] == jnp.arange(NUM_CLUSTERS)[None, :])
        w = one_hot.astype(depth.dtype)
        sums = w.T @ flat_pts                              # (K, 3) — MXU
        counts = jnp.sum(w, axis=0)
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                0.0).T                     # (3, K)
        max_diff = jnp.max(jnp.abs(centers - new_centers))
        centers = jnp.where(done, centers, new_centers)
        done = done | (max_diff < tol)
        return centers, done

    centers, _ = jax.lax.fori_loop(0, iters - 1, body,
                                   (centers0, jnp.asarray(False)))
    return centers


def compute_connectivity(depth: jnp.ndarray, xx: jnp.ndarray, yy: jnp.ndarray,
                         labels: jnp.ndarray) -> jnp.ndarray:
    """(K, K) bool adjacency from label changes across 4-neighbor edges with
    3D distance gate (KMeans.cpp:297-341)."""
    rows, cols = depth.shape
    thr2 = (0.03 * 120.0 / float(rows)) ** 2

    def edges(img):
        return img[:-1, :-1]

    def down(img):
        return img[1:, :-1]

    def right(img):
        return img[:-1, 1:]

    l0, ld, lr = edges(labels), down(labels), right(labels)
    d0, dd, dr = edges(depth), down(depth), right(depth)
    y0, yd = edges(yy), down(yy)
    x0, xr = edges(xx), right(xx)

    valid0 = d0 != 0.0
    conn_v = (valid0 & (l0 != ld) & (ld != NUM_CLUSTERS)
              & (((d0 - dd) ** 2 + (y0 - yd) ** 2) < thr2))
    conn_h = (valid0 & (l0 != lr) & (lr != NUM_CLUSTERS)
              & (((d0 - dr) ** 2 + (x0 - xr) ** 2) < thr2))

    # Duplicate-heavy (K,K) scatter-maxes serialize on TPU; the adjacency
    # count is a one-hot outer-product reduction — one MXU matmul.
    k = NUM_CLUSTERS
    la = jnp.concatenate([l0.ravel(), l0.ravel()])
    lb = jnp.concatenate([ld.ravel(), lr.ravel()])
    m = jnp.concatenate([conn_v.ravel(), conn_h.ravel()])
    ks = jnp.arange(k, dtype=la.dtype)[None, :]
    oh_a = ((la[:, None] == ks) & m[:, None]).astype(jnp.float32)
    oh_b = (lb[:, None] == ks).astype(jnp.float32)
    cnt = jnp.einsum("na,nb->ab", oh_a, oh_b,
                     preferred_element_type=jnp.float32)
    conn = (cnt + cnt.T) > 0
    return conn | jnp.eye(NUM_CLUSTERS, dtype=bool)


def kmeans_level_for(config: SFConfig) -> int:
    """Pyramid level the Lloyd iterations run at.

    Auto (-1): the shallowest level with <=120 rows.  The reference
    clusters at rows/2 of its WORKING resolution (KMeans.cpp:66 with
    rows = 480/res_factor, FrontEnd.cpp:55) — 120 rows at its QVGA
    operating point, but 240 at VGA.  Capping at 120 is therefore
    reference-exact at <=QVGA and a deliberate perf deviation above it
    (the O(pixels * K * iters) Lloyd cost stays flat as resolution
    rises); set `kmeans_level` explicitly to restore the reference's
    rows/2 rule at higher resolutions."""
    lvl = config.solver.kmeans_level
    if lvl >= 0:
        return min(lvl, config.ctf_levels - 1)
    l = 1
    while (config.camera.height >> l) > 120 and l < config.ctf_levels - 1:
        l += 1
    return l


def cluster_frame(pyr: Pyramid, config: SFConfig) -> Clustering:
    """Full clustering pass: init at the K-means level (see
    `kmeans_level_for`), Lloyd-iterate, label every pyramid level with the
    final centers, compute connectivity.

    The reference labels level 1 with the *pre-final* centers it iterated on
    and levels 0,2.. with the final ones (KMeans.cpp:238-291,343-391); we use
    the final centers everywhere — same fixed point, simpler dataflow.
    """
    half = pyr[kmeans_level_for(config)]
    centers0 = initialize_centers(half.depth, config.camera.fovh)
    centers = lloyd_iterate(half.depth, half.xx, half.yy, centers0,
                            config.solver.kmeans_iters, config.solver.kmeans_tol)

    labels = []
    for lvl in range(config.ctf_levels):
        p = pyr[lvl]
        pts = jnp.stack([p.depth, p.xx, p.yy], axis=-1)
        labels.append(_assign(pts, p.depth != 0.0, centers))

    conn = compute_connectivity(pyr[0].depth, pyr[0].xx, pyr[0].yy, labels[0])
    return Clustering(centers=centers, labels=tuple(labels), connectivity=conn)
