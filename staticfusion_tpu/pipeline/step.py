"""The per-frame SLAM step as pure jittable functions.

This is the TPU-native collapse of the reference's steady-state loop
(StaticFusion-datasets.cpp:150-199 + SURVEY.md section 3.1): what the reference
does as ~6 CPU<->GPU texture round-trips per frame is here a single XLA
program over the SlamState pytree; the host only feeds frames and reads
poses/metrics.

Two entry points:
* `bootstrap_step` — frames 0+1: solve frame-to-frame, init the map
  (StaticFusion-datasets.cpp:108-144).
* `slam_step` — steady state: predict -> solve -> temporal check -> segment
  -> fuse.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.fusion import backend, predict, surfels
from staticfusion_tpu.ops import bilateral
from staticfusion_tpu.ops.pyramid import build_pyramid_pair
from staticfusion_tpu.pipeline.state import RingBuffers, SlamState, init_state
from staticfusion_tpu.pipeline.temporal import compute_temporal_residuals
from staticfusion_tpu.solver.runsolver import run_solver
from staticfusion_tpu.solver.segmentation import build_segm_image


class Frame(NamedTuple):
    """One input RGB-D frame (already at solver resolution)."""
    rgb: jnp.ndarray       # (H, W, 3) float [0,1]
    depth_mm: jnp.ndarray  # (H, W) float carrying u16 millimeters


class StepOutputs(NamedTuple):
    curr_pose: jnp.ndarray        # (4,4) global pose after this frame
    T_odometry: jnp.ndarray       # (4,4) frame-to-frame
    static_prob: jnp.ndarray      # (H, W) per-pixel b image
    labels: jnp.ndarray           # (H, W) cluster labels
    b_segm: jnp.ndarray           # (K,)
    surfel_count: jnp.ndarray     # int32
    dense: jnp.ndarray            # bool — model prediction dense enough
    ddt_sum: jnp.ndarray          # sum(ddt) — trajectory-write gate


def _intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def _preprocess(frame: Frame, config: SFConfig):
    """DEPTH_RAW upload + bilateral + metricise (Reconstruction.cpp:327-346)."""
    filtered_mm = bilateral.bilateral_filter_mm(frame.depth_mm,
                                                config.fusion.depth_max)
    raw_m = bilateral.metricise_depth_mm(frame.depth_mm,
                                         config.fusion.depth_max)
    filt_m = bilateral.metricise_depth_mm(filtered_mm, config.fusion.depth_max)
    return raw_m, filt_m


def _store_ring(rings: RingBuffers, slot, depth, intensity, odom) -> RingBuffers:
    return RingBuffers(
        depth=rings.depth.at[slot].set(depth),
        intensity=rings.intensity.at[slot].set(intensity),
        odom=rings.odom.at[slot].set(odom),
    )


@partial(jax.jit, static_argnames=("config",))
def bootstrap_step(frame0: Frame, frame1: Frame, initial_pose: jnp.ndarray,
                   config: SFConfig):
    """Frames 0 and 1: raw-depth solve with lenient kb, then map init from
    frame 1 at pose initial_pose @ T_odometry
    (StaticFusion-datasets.cpp:108-144). Returns (state, outputs)."""
    state = init_state(config)

    depth0 = frame0.depth_mm / 1000.0      # dataset-style raw meters
    intens0 = _intensity(frame0.rgb)
    depth1 = frame1.depth_mm / 1000.0
    intens1 = _intensity(frame1.rgb)

    pred_pyr, cur_pyr = build_pyramid_pair(depth0, intens0,
                                           depth1, intens1, config)

    sol = run_solver(cur_pyr, pred_pyr, state.twist_old, config,
                     kb=config.solver.kb_bootstrap)

    static_prob = build_segm_image(sol.clustering.labels[0], sol.b_segm,
                                   state.per_cluster_residual, config)

    raw_m, filt_m = _preprocess(frame1, config)
    pose = initial_pose @ sol.T_odometry
    # Size the initial map at the pixel count, not the full capacity: the
    # host grows it in power-of-two tiers as the map fills
    # (SlamSystem._maybe_resize_map), so per-surfel pass costs track the
    # live surfel count — the reference's `count`-driven processing.
    # Under routed fusion (backend.effective_route_factor > 1) the map is
    # built from the routed grid, so the initial map matches the steady
    # -state surfel density.
    rf = backend.effective_route_factor(config)
    cfg_map = backend.routed_config(config, rf) if rf > 1 else config
    cap0 = min(config.fusion.capacity,
               surfels.next_tier(frame1.depth_mm[::rf, ::rf].size))
    smap = surfels.initialise_map(cap0, raw_m[::rf, ::rf],
                                  filt_m[::rf, ::rf],
                                  frame1.rgb[::rf, ::rf],
                                  static_prob[::rf, ::rf], pose, cfg_map)

    rings = _store_ring(state.rings, 0, depth0, intens0, jnp.eye(4))
    rings = _store_ring(rings, 1, depth1, intens1, sol.T_odometry)

    # Seed the carried prediction (steady state gets it from fuse_frame).
    pred_low = predict.predict_low_view(smap, pose, jnp.asarray(2, jnp.int32),
                                        config)

    state = state._replace(
        smap=smap,
        curr_pose=pose,
        pred=pred_low,
        tick=jnp.asarray(2, jnp.int32),
        im_count=jnp.asarray(1, jnp.int32),
        twist_old=sol.twist_old_next,
        rings=rings,
        prev_rgb=frame1.rgb,
        prev_filt_depth=filt_m,
        prev_static_prob=static_prob,
    )
    out = StepOutputs(curr_pose=pose, T_odometry=sol.T_odometry,
                      static_prob=static_prob, labels=sol.clustering.labels[0],
                      b_segm=sol.b_segm, surfel_count=smap.count(),
                      dense=jnp.asarray(False),
                      ddt_sum=jnp.sum(sol.ddt_full))
    return state, out


@partial(jax.jit, static_argnames=("config",))
def slam_step(state: SlamState, frame: Frame, config: SFConfig):
    """One steady-state frame (SURVEY.md section 3.1). Returns (state, outputs)."""
    fus = config.fusion
    raw_m, filt_m = _preprocess(frame, config)
    intensity_cur = _intensity(frame.rgb)
    im_count = state.im_count + 1

    # Composite the model view carried over from the last fuse (uses the
    # *previous* frame's uploads for the FillIn raw fallback, as the GL
    # textures would).  The splat itself happened inside fuse_frame at this
    # exact pose — no render needed here.
    prediction = predict.composite_prediction(
        state.pred, state.prev_filt_depth, state.prev_rgb,
        state.prev_static_prob, config)

    # kb warm-up: the first steady frame after bootstrap uses the lenient kb
    # iff the model is not yet dense (StaticFusion-datasets.cpp:156-165).
    first_steady = state.im_count == 1
    kb = jnp.where(first_steady & ~prediction.dense,
                   config.solver.kb_bootstrap, config.solver.kb)

    pred_pyr, cur_pyr = build_pyramid_pair(
        prediction.depth, prediction.intensity, filt_m, intensity_cur, config)

    sol = run_solver(cur_pyr, pred_pyr, state.twist_old, config, kb=kb)

    # Temporal 5-frame residual rescue, once the ring is full
    # (StaticFusion-datasets.cpp:175-177).
    per_cluster = compute_temporal_residuals(
        state.rings, sol.T_odometry, im_count, filt_m, intensity_cur,
        sol.clustering.labels[0], config)
    ring_full = im_count >= config.buffer_length
    per_cluster = jnp.where(ring_full, per_cluster, jnp.nan)

    static_prob = build_segm_image(sol.clustering.labels[0], sol.b_segm,
                                   per_cluster, config)

    fused = backend.fuse_frame(state.smap, state.curr_pose, sol.T_odometry,
                               raw_m, filt_m, frame.rgb, static_prob,
                               state.tick, config)

    rings = _store_ring(state.rings, im_count % config.buffer_length,
                        filt_m, intensity_cur, sol.T_odometry)

    new_state = state._replace(
        smap=fused.smap,
        curr_pose=fused.curr_pose,
        pred=fused.pred,
        tick=state.tick + 1,
        im_count=im_count,
        twist_old=sol.twist_old_next,
        rings=rings,
        prev_rgb=frame.rgb,
        prev_filt_depth=filt_m,
        prev_static_prob=static_prob,
        per_cluster_residual=per_cluster,
    )
    out = StepOutputs(curr_pose=fused.curr_pose, T_odometry=sol.T_odometry,
                      static_prob=static_prob, labels=sol.clustering.labels[0],
                      b_segm=sol.b_segm, surfel_count=fused.smap.count(),
                      dense=prediction.dense, ddt_sum=jnp.sum(sol.ddt_full))
    return new_state, out
