"""Keyframe database, loop-closure detection, and trajectory correction.

Net-new capability: the reference only *logs* its pose graph
(`Reconstruction.cpp:315` — the `poseGraph` vector is never optimized), so
drift accumulates forever.  This layer closes the loop the TPU way:

* **Fingerprints** are block-statistics embeddings (mean intensity +
  mean/validity of depth per coarse cell) — the same role as
  ElasticFusion-style fern codes, but a dense (D,) vector so the database
  query is one (K, D) matmul/reduction on device instead of per-fern code
  comparisons.
* **Relative pose** between a matched keyframe and the current frame reuses
  the full coarse-to-fine joint solver (`solver/runsolver.py`) in its
  frame-to-frame configuration (the bootstrap path, pipeline/step.py) — no
  separate feature pipeline.
* **Correction** builds a pose graph over the keyframes (odometry chain +
  the loop constraint) and runs the existing Gauss-Newton optimizer
  (`parallel/posegraph.py`), which also has a constraint-sharded
  `optimize_sharded` variant for large graphs.

On correction the surfel map is deformed piecewise-rigidly (`deform_map`):
every surfel moves with the pose delta of the keyframe interval it was
created in (assigned by birth tick), so the map stays registered to the
corrected trajectory.  The reference never corrects at all; ElasticFusion
uses a full deformation graph — per-keyframe rigid segments are the
fixed-shape TPU middle ground (one gather + one batched transform).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.geometry import se3
from staticfusion_tpu.ops.pyramid import build_pyramid_pair
from staticfusion_tpu.ops.warp import warp_images_gather
from staticfusion_tpu.parallel import posegraph
from staticfusion_tpu.solver.runsolver import run_solver

FP_GRID = (12, 16)  # coarse cells; divides QVGA (240x320) and VGA (480x640)


class KeyframeDB(NamedTuple):
    """Fixed-capacity keyframe store (static shapes; a validity count)."""
    emb: jnp.ndarray        # (K, D) fingerprints
    poses: jnp.ndarray      # (K, 4, 4) world_T_kf at insertion time
    intensity: jnp.ndarray  # (K, H, W) stored grayscale
    depth: jnp.ndarray      # (K, H, W) stored raw depth, meters
    frame_idx: jnp.ndarray  # (K,) int32 source frame number
    count: jnp.ndarray      # int32 live keyframes


def fp_dim(grid: Tuple[int, int] = FP_GRID) -> int:
    return grid[0] * grid[1] * 3


def empty_db(capacity: int, rows: int, cols: int,
             grid: Tuple[int, int] = FP_GRID) -> KeyframeDB:
    return KeyframeDB(
        emb=jnp.zeros((capacity, fp_dim(grid))),
        poses=jnp.broadcast_to(jnp.eye(4), (capacity, 4, 4)),
        intensity=jnp.zeros((capacity, rows, cols)),
        depth=jnp.zeros((capacity, rows, cols)),
        frame_idx=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
    )


def fingerprint(intensity: jnp.ndarray, depth: jnp.ndarray,
                grid: Tuple[int, int] = FP_GRID) -> jnp.ndarray:
    """(D,) appearance+geometry embedding from coarse cell statistics.

    Per cell: mean intensity (contrast-normalized over the frame), mean
    valid depth (normalized by the frame's mean depth, for lighting/scale
    robustness), and the valid-depth fraction.  Invalid depth is the exact
    0.0 sentinel, as everywhere in the pipeline."""
    gh, gw = grid
    rows, cols = intensity.shape
    bi = intensity.reshape(gh, rows // gh, gw, cols // gw).mean(axis=(1, 3))
    valid = (depth > 0.0).astype(depth.dtype)
    cells = depth.reshape(gh, rows // gh, gw, cols // gw)
    vcells = valid.reshape(gh, rows // gh, gw, cols // gw)
    vfrac = vcells.mean(axis=(1, 3))
    dsum = cells.sum(axis=(1, 3))
    dmean = dsum / jnp.maximum(vcells.sum(axis=(1, 3)), 1.0)
    bi = (bi - bi.mean()) / (bi.std() + 1e-6)
    dnorm = dmean / (jnp.sum(dsum) / jnp.maximum(jnp.sum(valid), 1.0) + 1e-6)
    return jnp.concatenate([bi.ravel(), dnorm.ravel(), vfrac.ravel()])


@jax.jit
def add_keyframe(db: KeyframeDB, intensity: jnp.ndarray, depth: jnp.ndarray,
                 pose: jnp.ndarray, frame_idx) -> KeyframeDB:
    """Append at `count`.  The host must keep a free slot available by
    halving the DB when it approaches capacity (`halve_db` + doubled
    keyframe stride — SlamSystem does this), so the clamp below is a
    never-taken safety, not an eviction policy."""
    k = jnp.minimum(db.count, db.emb.shape[0] - 1)
    return KeyframeDB(
        emb=db.emb.at[k].set(fingerprint(intensity, depth)),
        poses=db.poses.at[k].set(pose),
        intensity=db.intensity.at[k].set(intensity),
        depth=db.depth.at[k].set(depth),
        frame_idx=db.frame_idx.at[k].set(jnp.asarray(frame_idx, jnp.int32)),
        count=jnp.minimum(db.count + 1, db.emb.shape[0]),
    )


@jax.jit
def halve_db(db: KeyframeDB) -> KeyframeDB:
    """Drop every other keyframe (keep even slots), halving density.

    Called by the host when the DB nears capacity; the caller doubles its
    keyframe stride at the same time, so a fixed-capacity DB spans ANY run
    length at geometrically coarsening temporal resolution — real fr3
    sequences are 800-1700 frames (reference README.md:62-95) and the
    reference's own pose log is unbounded (Reconstruction.cpp:315).
    Keeping the even slots retains keyframe 0 (the gauge anchor and the
    cleanest, earliest-drift pose) and every second keyframe after it;
    the next tick re-adds a fresh keyframe, so recency recovers within one
    (doubled) stride."""
    K = db.emb.shape[0]
    h = (K + 1) // 2

    def take(a):
        return a.at[:h].set(a[0::2])

    return KeyframeDB(
        emb=take(db.emb),
        poses=take(db.poses),
        intensity=take(db.intensity),
        depth=take(db.depth),
        frame_idx=take(db.frame_idx).at[h:].set(-1),
        count=(db.count + 1) // 2,
    )


@partial(jax.jit, static_argnames=("grid", "trim_keep"))
def query(db: KeyframeDB, emb: jnp.ndarray, cur_frame_idx,
          min_gap, grid: Tuple[int, int] = FP_GRID,
          trim_keep: float = 0.5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(best_k, best_dist): nearest stored fingerprint at least `min_gap`
    frames older than `cur_frame_idx`.  best_dist is +inf when no keyframe
    qualifies; the host applies the acceptance threshold.

    The distance is a TRIMMED per-cell score: squared feature differences
    are summed per coarse cell (3 channels each) and only the smallest
    `trim_keep` fraction of cells is averaged.  In a dynamic scene the
    moving object occupies DIFFERENT cells on a genuine revisit, so a plain
    MSE is dominated by the mover (measured on the walk_loop suite:
    same-pose pairs score 0.43-0.58 MSE-style vs a 0.2 gate — zero
    closures fire); trimming drops the mover's cells while a wrong-place
    pair stays high everywhere (same suite: genuine 0.13-0.26 trimmed vs
    0.39+ wrong-place).  Geometric verification remains the correctness
    gate (`relative_pose`)."""
    G = grid[0] * grid[1]
    idx = jnp.arange(db.emb.shape[0])
    eligible = ((idx < db.count)
                & (db.frame_idx <= jnp.asarray(cur_frame_idx) - min_gap))
    cell = ((db.emb - emb[None, :]) ** 2).reshape(-1, 3, G).sum(axis=1)
    keep = max(1, int(trim_keep * G))
    d2 = jnp.mean(jnp.sort(cell, axis=-1)[:, :keep], axis=-1)
    d2 = jnp.where(eligible, d2, jnp.inf)
    best = jnp.argmin(d2)
    return best, d2[best]


@partial(jax.jit, static_argnames=("config",))
def relative_pose(kf_intensity: jnp.ndarray, kf_depth: jnp.ndarray,
                  intensity: jnp.ndarray, depth: jnp.ndarray,
                  config: SFConfig, T_init: jnp.ndarray | None = None):
    """kf_T_cur via the frame-to-frame joint solver (raw depth both sides,
    zero velocity prior).

    Uses the STEADY kb (dynamics-rejecting), not the bootstrap one: a
    relocalization pair in a dynamic scene contains the mover at two
    unrelated positions, and the lenient bootstrap bias lets it pull the
    constraint (measured on walk_loop: closures built with kb_bootstrap
    made ATE worse, 0.166 -> 0.175, despite passing the median-residual
    gate — the translation error hid in the static-majority median).

    Returns (T, residual): T maps current-frame points into the keyframe,
    and residual is the MEDIAN |depth residual| over the covisible pixels
    the joint solve itself labels STATIC — the host gates acceptance on it
    (geometric verification).  The static mask matters: between genuine
    revisits the dynamic content moved, and when the UNION of its two
    positions covers >=50% of the covisible area even a median over all
    covisible pixels lands inside the mover (measured on walk_loop
    same-pose pairs: raw-covisible median 1.1 m while the solved T was
    accurate to 2-5 mm).  The solver's per-cluster b scores mask the mover
    out; a misregistered/aliased pair is wrong on its static majority too,
    so its masked median stays high — and a pair whose static-covisible
    fraction falls under 25% is rejected outright (same spirit as
    denseEnough's 25% gate, Reconstruction.cpp:218-233), which also
    rejects pairs the solver could only 'explain' by declaring the scene
    dynamic."""
    pred_pyr, cur_pyr = build_pyramid_pair(kf_depth, kf_intensity,
                                           depth, intensity, config)
    sol = run_solver(cur_pyr, pred_pyr, jnp.zeros((6,)), config,
                     kb=config.solver.kb, T_init=T_init)
    warped = warp_images_gather(pred_pyr[0], cur_pyr[0].depth,
                                sol.T_odometry, config.camera.fovh)
    # Per-pixel static probability of the current frame from the solve
    # (buildSegmImage without the temporal rescue: clamp(b[label], 0, 1),
    # invalid-cluster pixels static).
    k = config.num_clusters
    b_ext = jnp.concatenate([jnp.clip(sol.b_segm, 0.0, 1.0), jnp.ones((1,))])
    static = b_ext[jnp.clip(sol.clustering.labels[0], 0, k)] > 0.5
    covis = ((warped.depth > 0.0) & (cur_pyr[0].depth > 0.0)
             & static).astype(jnp.float32)
    # Joint depth + PHOTOMETRIC residual (the temporal check's 0.15 mix,
    # FrontEnd.cpp:1041): depth alone cannot reject aliased alignments in
    # self-similar geometry — two corridor cross-sections are
    # depth-identical under a z-shift, and a depth-only median accepted
    # them (27 false/foldback closures, ATE 1.94 -> 2.32 on
    # corridor_loop).  Intensities are mean-normalized over the masked
    # region first, cancelling the rolling-exposure gain.
    m = covis > 0
    i_cur = cur_pyr[0].intensity
    i_wrp = warped.intensity
    mean_cur = jnp.sum(jnp.where(m, i_cur, 0.0)) / jnp.maximum(
        jnp.sum(covis), 1.0)
    mean_wrp = jnp.sum(jnp.where(m, i_wrp, 0.0)) / jnp.maximum(
        jnp.sum(covis), 1.0)
    i_err = jnp.abs(i_cur / jnp.maximum(mean_cur, 1e-6)
                    - i_wrp / jnp.maximum(mean_wrp, 1e-6))
    err = jnp.abs(cur_pyr[0].depth - warped.depth) + 0.15 * i_err
    resid = jnp.nanmedian(jnp.where(m, err, jnp.nan))
    frac = jnp.sum(covis) / covis.size
    resid = jnp.where(frac < 0.25, jnp.inf, resid)
    return sol.T_odometry, resid


@jax.jit
def deform_map(smap, kf_frame_idx: jnp.ndarray, old_poses: jnp.ndarray,
               new_poses: jnp.ndarray, n_kf):
    """Piecewise-rigid map correction after a pose-graph solve.

    Each surfel is assigned to the last keyframe born before it (via its
    `init_time` tick) and transformed by that node's correction
    `new @ inv(old)`.  Surfels older than the first keyframe ride node 0,
    whose delta is identity (the graph is gauge-fixed there).

    Args:
      smap: SurfelMap (world-frame pos/normal).
      kf_frame_idx: (K,) int32 birth frame of each keyframe row (-1 unused).
      old_poses / new_poses: (K, 4, 4) keyframe poses before/after the
        correction.
      n_kf: live keyframe count.
    """
    from staticfusion_tpu.fusion.surfels import SurfelMap  # cycle-free

    delta = new_poses @ se3.se3_inverse(old_poses)          # (K, 4, 4)
    k = jnp.arange(kf_frame_idx.shape[0])
    keys = jnp.where(k < jnp.asarray(n_kf), kf_frame_idx.astype(jnp.float32),
                     jnp.inf)
    seg = jnp.clip(
        jnp.searchsorted(keys, smap.init_time, side="right") - 1,
        0, jnp.maximum(jnp.asarray(n_kf) - 1, 0))
    D = delta[seg]                                          # (N, 4, 4)
    pos = jnp.einsum("nij,nj->ni", D[:, :3, :3], smap.pos) + D[:, :3, 3]
    nrm = jnp.einsum("nij,nj->ni", D[:, :3, :3], smap.normal)
    return smap._replace(
        pos=jnp.where(smap.valid[:, None], pos, smap.pos),
        normal=jnp.where(smap.valid[:, None], nrm, smap.normal))


def close_loop(kf_poses: jnp.ndarray, n_kf, loop_i, loop_j,
               T_ij: jnp.ndarray, loop_weight: float = 4.0,
               iters: int = 10) -> jnp.ndarray:
    """Optimize the keyframe chain against one loop constraint.

    kf_poses: (K, 4, 4) world poses (rows >= n_kf are ignored); the chain
    k -> k+1 contributes odometry constraints from the composed trajectory,
    plus the measured loop constraint i_T_j.  Returns (K, 4, 4) optimized
    poses (gauge-fixed at pose 0, so the map origin is preserved).

    The constraint layout (slots [0, K-1) = ordered chain, remainder =
    loops) is exactly `posegraph.optimize_chain`'s contract, so the solve
    is the O(K) block-tridiagonal + Woodbury path rather than the dense
    O((6K)^3) one — 1k-keyframe graphs stay interactive."""
    K = kf_poses.shape[0]
    g = posegraph.empty_graph(K, K + 1)
    g = g._replace(poses=kf_poses, n_poses=jnp.asarray(n_kf, jnp.int32))

    ks = jnp.arange(K - 1)
    chain_T = se3.se3_inverse(kf_poses[:-1]) @ kf_poses[1:]
    chain_w = (ks < jnp.asarray(n_kf) - 1).astype(kf_poses.dtype)
    g = g._replace(
        ci=g.ci.at[:K - 1].set(ks.astype(jnp.int32)),
        cj=g.cj.at[:K - 1].set((ks + 1).astype(jnp.int32)),
        cT=g.cT.at[:K - 1].set(chain_T),
        cw=g.cw.at[:K - 1].set(chain_w),
        n_constraints=jnp.asarray(K - 1, jnp.int32),
    )
    g = posegraph.add_constraint(g, loop_i, loop_j, T_ij, loop_weight)
    return posegraph.optimize_chain(g, iters=iters).poses
