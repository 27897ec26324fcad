"""Map backend orchestration: the `Reconstruction::fuseFrame` equivalent.

Reference: Reconstruction.cpp:235-325 — velocity-based fusion weighting,
predictIndices -> GlobalModel::fuse (associate + update) ->
predictIndices -> GlobalModel::clean.

All passes are pure functions over the SurfelMap pytree; `fuse_frame` is the
single entry the pipeline jits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import dataclasses

import jax

from staticfusion_tpu.config import CameraConfig, SFConfig
from staticfusion_tpu.fusion import predict, sparse
from staticfusion_tpu.fusion.association import associate, associate_texels
from staticfusion_tpu.fusion.clean import (clean_and_insert,
                                           kill_mask_from_tex,
                                           window_kill_tex,
                                           writeback_and_insert)
from staticfusion_tpu.fusion.indexmap import predict_indices
from staticfusion_tpu.fusion.surfels import SurfelMap
from staticfusion_tpu.fusion.update import apply_updates, merge_texels
from staticfusion_tpu.geometry.se3 import se3_inverse, so3_log


def velocity_weighting(curr_pose: jnp.ndarray, last_pose: jnp.ndarray,
                       weight_multiplier: float,
                       config: SFConfig) -> jnp.ndarray:
    """Down-weight fusion while the camera moves fast
    (Reconstruction.cpp:262-282): w = max(1 - min(max(|dt|, |dr|), 0.15)/0.15,
    0.5) * multiplier."""
    fus = config.fusion
    diff = se3_inverse(curr_pose) @ last_pose
    dt = jnp.linalg.norm(diff[:3, 3])
    dr = jnp.linalg.norm(so3_log(diff[:3, :3]))
    w = jnp.minimum(jnp.maximum(dt, dr), fus.velocity_weight_cap)
    return jnp.maximum(1.0 - w / fus.velocity_weight_cap,
                       fus.velocity_weight_floor) * weight_multiplier


def effective_route_factor(config: SFConfig) -> int:
    """Resolved FusionConfig.route_factor (0 = auto: cap the dense-fuse
    grid at QVGA rows — 1 at <=240 rows, 2 at VGA)."""
    rf = config.fusion.route_factor
    if rf > 0:
        return rf
    return max(1, config.camera.height // 240)


def routed_config(config: SFConfig, rf: int) -> SFConfig:
    """The same config with the camera scaled 1/rf (FOV-derived intrinsics
    scale consistently)."""
    cam = config.camera
    return config.replace(
        camera=CameraConfig(
            width=cam.width // rf, height=cam.height // rf,
            fovh_deg=cam.fovh_deg, fovv_deg=cam.fovv_deg),
        fusion=dataclasses.replace(config.fusion, route_factor=1))


class FuseResult(NamedTuple):
    smap: SurfelMap
    curr_pose: jnp.ndarray
    # Next frame's LOW-confidence predicted view, splatted from the merged
    # texel images (the reference re-renders the map at the start of the
    # next frame — same pose, post-clean attributes — so deriving it here
    # saves a full render: one scatter + one stacked gather per frame).
    pred: object = None


def fuse_frame(smap: SurfelMap,
               curr_pose: jnp.ndarray,
               T_odometry: jnp.ndarray,
               raw_depth_m: jnp.ndarray,
               filtered_depth_m: jnp.ndarray,
               rgb: jnp.ndarray,
               static_prob: jnp.ndarray,
               tick: jnp.ndarray,
               config: SFConfig,
               weight_multiplier: float = 1.0) -> FuseResult:
    """One steady-state map update (Reconstruction.cpp:261-313).

    `tick` is the reconstruction frame counter (>= 2 here; tick 1 is
    `initialise_map`).  Index factor 1 (the camera-res default) takes the
    texel-space path: render -> texel-routed association -> elementwise
    merge + window kill in texel space -> ONE combined write-back/insert
    scatter -> splat the merged texels into next frame's prediction.
    Even super-resolution factors (the reference's FACTOR=4,
    IndexMap.cpp:21) take the surfel-major sparse path (fusion/sparse.py),
    whose indexed-op cost stays O(capacity) instead of O(F^2 H W)."""
    if sparse.supports_sparse(config):
        return fuse_frame_sparse(smap, curr_pose, T_odometry, raw_depth_m,
                                 filtered_depth_m, rgb, static_prob, tick,
                                 config, weight_multiplier)
    rf = effective_route_factor(config)
    if rf > 1:
        # Routed fuse: map update on the 1/rf grid (QVGA-capped), solver
        # stays native-res upstream.  Strided picks keep exact-0 depth
        # sentinels intact; the half-res camera model is self-consistent
        # (FOV-derived intrinsics), with a constant half-full-pixel center
        # offset worth ~2 mm at 2 m — below sensor noise.  The carried
        # prediction is upsampled back to native res for the solver.
        cfg_r = routed_config(config, rf)
        res = fuse_frame(smap, curr_pose, T_odometry,
                         raw_depth_m[::rf, ::rf],
                         filtered_depth_m[::rf, ::rf],
                         rgb[::rf, ::rf], static_prob[::rf, ::rf],
                         tick, cfg_r, weight_multiplier)
        up = lambda a: jnp.repeat(jnp.repeat(a, rf, axis=0), rf, axis=1)
        pred = jax.tree_util.tree_map(up, res.pred)
        return res._replace(pred=pred)
    fus = config.fusion
    last_pose = curr_pose
    curr_pose = curr_pose @ T_odometry
    weighting = velocity_weighting(curr_pose, last_pose, weight_multiplier,
                                   config)

    tex, local = predict_indices(smap, curr_pose, tick, config)

    upd, new = associate_texels(tex, raw_depth_m, filtered_depth_m,
                                rgb, static_prob, curr_pose, tick,
                                weighting, config)
    merged = merge_texels(tex, upd, tick, config)
    # The clean window test runs on *post-update* attributes, matching
    # the reference's re-render before clean (Reconstruction.cpp:300).
    kill_tex = window_kill_tex(merged, tick, config)
    smap = writeback_and_insert(smap, merged, upd.has, kill_tex, local,
                                new, curr_pose, tick, config)

    # Next frame predicts at exactly this pose; splat the surviving merged
    # texels with the LOW-confidence cull (new unstable surfels sit below
    # low_conf, so their absence from the texels matches the reference cull).
    pred_has = (merged.has & ~kill_tex & (merged.conf >= fus.low_conf)
                & (merged.z > fus.predict_z_min))
    pred = predict.splat_from_texels(merged._replace(has=pred_has), config)
    return FuseResult(smap=smap, curr_pose=curr_pose, pred=pred)


def fuse_frame_sparse(smap: SurfelMap,
                      curr_pose: jnp.ndarray,
                      T_odometry: jnp.ndarray,
                      raw_depth_m: jnp.ndarray,
                      filtered_depth_m: jnp.ndarray,
                      rgb: jnp.ndarray,
                      static_prob: jnp.ndarray,
                      tick: jnp.ndarray,
                      config: SFConfig,
                      weight_multiplier: float = 1.0) -> FuseResult:
    """The F>1 fuse (fusion/sparse.py design): surfel-major association on
    the F-resolution z-buffer -> slot-space merge (update.vert math) ->
    `post_factor`-resolution render of the post-merge map for the clean
    window test and the prediction splat (reference fidelity re-renders at
    FACTOR=4 before clean, Reconstruction.cpp:300; the capacity-bound
    materialization keeps its indexed cost O(capacity)) -> elementwise
    lifecycle + watermark insert."""
    fus = config.fusion
    cfg1 = sparse.post_factor_config(config)
    last_pose = curr_pose
    curr_pose = curr_pose @ T_odometry
    weighting = velocity_weighting(curr_pose, last_pose, weight_multiplier,
                                   config)

    local = sparse.project_surfels(smap, curr_pose, config)
    assoc = sparse.associate_sparse(smap, local, raw_depth_m,
                                    filtered_depth_m, rgb, static_prob,
                                    curr_pose, tick, weighting, config)
    merged_map = apply_updates(smap, assoc.updates, tick, config)

    # Post-merge render for the clean window test + prediction splat: the
    # clean test sees post-update attributes (the reference re-renders
    # before clean, Reconstruction.cpp:300).  At post factor == index
    # factor the association's z-buffer winner set is reused, skipping the
    # second z-buffer entirely (sparse.materialize_from_winners); other
    # post factors need their own z-buffer at that grid.
    if cfg1.fusion.index_factor == fus.index_factor:
        local_m = sparse.project_surfels(merged_map, curr_pose, config)
        tex1 = sparse.materialize_from_winners(merged_map, local_m,
                                               assoc.is_winner, assoc.flat,
                                               config)
    else:
        tex1, _ = predict_indices(merged_map, curr_pose, tick, cfg1)
    kill_tex = window_kill_tex(tex1, tick, cfg1)
    killed = kill_mask_from_tex(kill_tex, tex1.idx, merged_map.capacity)
    smap_out = sparse.lifecycle_and_insert(merged_map, killed, assoc.new,
                                           tick, config)

    pred_has = (tex1.has & ~kill_tex & (tex1.conf >= fus.low_conf)
                & (tex1.z > fus.predict_z_min))
    pred = predict.splat_from_texels(tex1._replace(has=pred_has), cfg1)
    return FuseResult(smap=smap_out, curr_pose=curr_pose, pred=pred)


def fuse_frame_slots(smap: SurfelMap,
                     curr_pose: jnp.ndarray,
                     T_odometry: jnp.ndarray,
                     raw_depth_m: jnp.ndarray,
                     filtered_depth_m: jnp.ndarray,
                     rgb: jnp.ndarray,
                     static_prob: jnp.ndarray,
                     tick: jnp.ndarray,
                     config: SFConfig,
                     weight_multiplier: float = 1.0) -> FuseResult:
    """Slot-routed fusion (the original pipeline): reference-exact
    'smallest pixel wins' dedupe and slot-space merge.  Kept as the
    parity/equivalence oracle for the texel path."""
    last_pose = curr_pose
    curr_pose = curr_pose @ T_odometry
    weighting = velocity_weighting(curr_pose, last_pose, weight_multiplier,
                                   config)

    tex, local = predict_indices(smap, curr_pose, tick, config)
    assoc = associate(smap.capacity, tex, raw_depth_m, filtered_depth_m,
                      rgb, static_prob, curr_pose, tick, weighting, config)
    smap = apply_updates(smap, assoc.updates, tick, config)

    # The reference re-renders the whole index map after the merge
    # (Reconstruction.cpp:300) so the clean pass sees post-update attributes.
    # Geometry barely moves in one merge, so we reuse the pre-update winner
    # image and only *re-gather* the attributes the clean tests read — this
    # keeps the free-space test's `lastTime == tick` semantics exact while
    # saving a full render (one scatter + 15 gathers).
    has = tex.has
    safe = jnp.where(has, tex.idx, 0)
    # One stacked gather for the four re-read fields (gather cost follows
    # the index count, not the row width).
    g = jnp.where(has[None], jnp.stack([smap.conf, smap.init_time,
                                        smap.last_time, smap.radius])[:, safe],
                  0.0)
    tex = tex._replace(conf=g[0], init_time=g[1], last_time=g[2], radius=g[3])
    smap = clean_and_insert(smap, tex, local, assoc.new, tick, config)
    return FuseResult(smap=smap, curr_pose=curr_pose)
