"""Run StaticFusion-TPU on a PNG sequence with an association file.

The reference's StaticFusion-imagesequenceassoc.cpp, headless:
  python apps/run_sequence.py <dataset_dir> [--assoc rgbd_assoc.txt]
      [--depth-scale 1000] [--out traj.txt] [--ply map.ply]
      [--metrics metrics.jsonl] [--max-frames N] [--viz dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_dir")
    ap.add_argument("--assoc", default="rgbd_assoc.txt")
    ap.add_argument("--depth-scale", type=float, default=1000.0,
                    help="depth units per meter (TUM PNGs: 5000)")
    ap.add_argument("--res-factor", type=int, default=2)
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--ply", default=None)
    ap.add_argument("--html", default=None,
                    help="self-contained WebGL viewer of the final map")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viz", default=None,
                    help="directory for per-frame viz panels")
    ap.add_argument("--gt", default=None, help="groundtruth.txt for ATE")
    ap.add_argument("--checkpoint", default=None,
                    help="write the final SlamState (npz) here")
    ap.add_argument("--resume", default=None,
                    help="resume from a checkpoint written by --checkpoint "
                         "(config must match; trajectory covers only the "
                         "resumed frames)")
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the run")
    ap.add_argument("--loop-closure", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="keyframe loop detection + pose-graph correction. "
                         "OPT-IN with a measured operating envelope "
                         "(ACCURACY.md round 5): on drift-heavy "
                         "exploration (fast corridor sweeps) verified "
                         "closures cut ATE 7-12%%; on low-drift "
                         "trajectories the verification solve's ~0.1 m "
                         "softness in self-similar geometry can inject "
                         "more error than the chain carries — leave off "
                         "unless the trajectory revisits after long "
                         "excursions")
    ap.add_argument("--conf-threshold", type=float, default=None,
                    help="surfel confidence cut for --ply (default: config "
                         "value; the reference exposes this as a GUI slider)")
    ap.add_argument("--index-factor", type=int, default=None,
                    help="index-map super-resolution factor (default: the "
                         "config default, 4 = reference FACTOR and the "
                         "accuracy-best config; 1 = fast preset)")
    ap.add_argument("--post-factor", type=int, default=None,
                    help="texel factor of the post-merge clean/splat passes "
                         "at index-factor > 1 (default: config default 2)")
    ap.add_argument("--live", type=int, default=None, metavar="PORT",
                    help="serve a live view (RGB/depth/weights/clusters "
                         "panels + metrics) at http://127.0.0.1:PORT while "
                         "running; 0 picks a free port (the reference shows "
                         "these panels in its Pangolin GUI, Utils/GUI.h:87-99)")
    ap.add_argument("--live-every", type=int, default=5,
                    help="refresh the --live view every N frames")
    ap.add_argument("--solver-preset", default="default",
                    choices=["default", "datasets", "ctor"],
                    help="solver parameter set: 'default' = repo defaults "
                         "(lambda_reg tuned on the adversarial suite); "
                         "'datasets' = the reference datasets main "
                         "(StaticFusion-datasets.cpp:79-94, lambda_reg "
                         "0.35 as tuned on real TUM data — use this for "
                         "real sequences unless the repo default proves "
                         "out); 'ctor' = the reference ctor defaults "
                         "(FrontEnd.cpp:65-76)")
    ap.add_argument("--lambda-reg", type=float, default=None,
                    help="override the solver's cluster-coupling "
                         "regularizer (reference: 0.35)")
    args = ap.parse_args(argv)

    import contextlib
    import dataclasses

    import jax

    from staticfusion_tpu.config import (CameraConfig, FusionConfig,
                                         LoopClosureConfig, SFConfig,
                                         solver_preset_ctor,
                                         solver_preset_datasets)
    from staticfusion_tpu.io import tum
    from staticfusion_tpu.io.ply import save_ply
    from staticfusion_tpu.pipeline.system import SlamSystem
    from staticfusion_tpu.utils.metrics import MetricsLogger

    is_rawlog = args.dataset_dir.endswith(".rawlog")
    if is_rawlog:
        from staticfusion_tpu.io import rawlog

        seq = rawlog.RawlogSequence(args.dataset_dir,
                                    res_factor=args.res_factor)
    else:
        seq = tum.TumSequence(args.dataset_dir, args.assoc,
                              res_factor=args.res_factor,
                              depth_scale=args.depth_scale,
                              gt_file=args.gt or "groundtruth.txt")
    # Sensor-native 640x480 divided by res_factor (the reference's
    # `res_factor` constant in each main; 2 -> QVGA, 1 -> VGA).
    fkw = {}
    if args.index_factor is not None:
        fkw["index_factor"] = args.index_factor
    if args.post_factor is not None:
        fkw["post_factor"] = args.post_factor
    solver = {"default": None, "datasets": solver_preset_datasets,
              "ctor": solver_preset_ctor}[args.solver_preset]
    skw = {} if solver is None else {"solver": solver()}
    config = SFConfig(camera=CameraConfig(width=640 // args.res_factor,
                                          height=480 // args.res_factor),
                      fusion=FusionConfig(**fkw),
                      loop=LoopClosureConfig(enabled=args.loop_closure),
                      **skw)
    if args.lambda_reg is not None:
        config = config.replace(solver=dataclasses.replace(
            config.solver, lambda_reg=args.lambda_reg))
    slam = SlamSystem(config, initial_pose=seq.initial_gt_pose())
    if is_rawlog:
        # Exported poses land in the raw TUM GT frame (Datasets.cpp:257).
        from staticfusion_tpu.io.rawlog import ROTATE_BY_Z

        slam.pose_postmultiply = ROTATE_BY_Z
    if args.resume:
        from staticfusion_tpu.utils.checkpoint import load_archive, load_state

        slam.state = load_state(args.resume, config)
        slam.archive = load_archive(args.resume)
        print(f"resumed from {args.resume} "
              f"(tick={int(slam.state.tick)})")
    logger = MetricsLogger(args.metrics, echo=args.metrics is None)
    profile_ctx = (jax.profiler.trace(args.profile) if args.profile
                   else contextlib.nullcontext())

    with profile_ctx:
        _run_frames(args, seq, slam, logger)

    slam.write_trajectory(args.out)
    print(f"wrote {len(slam.poses)} poses to {args.out}")
    if slam.loop_closures:
        print(f"closed {len(slam.loop_closures)} loops: {slam.loop_closures}")
    if seq.gt_times is not None:
        ate = slam.ate(seq.gt_times, seq.gt_poses)
        print(f"ATE RMSE vs groundtruth: {ate:.4f} m")
        logger.log(ate_rmse=ate)
    if args.ply:
        thr = (config.fusion.confidence_threshold
               if args.conf_threshold is None else args.conf_threshold)
        save_ply(args.ply, slam.full_map(), thr)
        print(f"wrote surfel map to {args.ply}")
    if args.html:
        from staticfusion_tpu.viz.webviewer import save_html

        thr = (config.fusion.confidence_threshold
               if args.conf_threshold is None else args.conf_threshold)
        import numpy as np

        save_html(args.html, slam.full_map(), thr,
                  trajectory=np.asarray(slam.poses),
                  gt_trajectory=seq.gt_poses if seq.gt_times is not None
                  else None)
        print(f"wrote web viewer to {args.html}")
    if args.checkpoint:
        from staticfusion_tpu.utils.checkpoint import save_state

        save_state(args.checkpoint, slam.state, config,
                   archive=slam.archive)
        print(f"wrote checkpoint to {args.checkpoint}")
    logger.close()


def _run_frames(args, seq, slam, logger):
    viewer = None
    if getattr(args, "live", None) is not None:
        from staticfusion_tpu.viz.live import LiveViewer

        viewer = LiveViewer(args.live,
                            conf=slam.config.fusion.confidence_threshold,
                            depth=slam.config.fusion.depth_max)
        print(f"live view: http://127.0.0.1:{viewer.port}/")
    for i, (rgb, depth_mm, ts) in enumerate(seq):
        if args.max_frames and i >= args.max_frames:
            break
        if viewer is not None:
            import time as _time

            # Pause control read back into the loop (the reference polls
            # its GUI pause checkbox every frame, FrontEnd.cpp:1285).
            while viewer.params()["pause"]:
                _time.sleep(0.1)
        out = slam.process(rgb, depth_mm, ts)
        if out is not None:
            fps = 1.0 / max(slam.frame_seconds[-1], 1e-9)
            logger.log(frame=i, surfels=int(out.surfel_count),
                       dense=bool(out.dense), fps=fps)
            if viewer is not None and i % max(args.live_every, 1) == 0:
                # Model + ModelImg panels (Utils/GUI.h:87-99), rendered
                # with the browser's live confidence/depth settings — the
                # threshold is a traced argument of the splat render, so
                # slider moves do not recompile.
                import numpy as np

                from staticfusion_tpu.viz.render import colorize, render_view

                import jax.numpy as jnp

                p = viewer.params()
                view = render_view(slam.state.smap, out.curr_pose,
                                   jnp.asarray(p["conf"], jnp.float32),
                                   slam.config)
                cut = np.asarray(view.depth) <= p["depth"]
                model = colorize(view, "phong", slam.config)
                model_img = colorize(view, "rgb", slam.config)
                model[~cut] = 0
                model_img[~cut] = 0
                viewer.update(rgb, depth_mm, out,
                              model=model, model_img=model_img, frame=i,
                              surfels=int(out.surfel_count),
                              fps=round(fps, 2),
                              conf=p["conf"], depth_cutoff=p["depth"],
                              loop_closures=len(slam.loop_closures))
            if args.viz:
                from staticfusion_tpu.viz.offline import save_frame_panels

                os.makedirs(args.viz, exist_ok=True)
                save_frame_panels(os.path.join(args.viz, f"frame_{i:05d}.png"),
                                  rgb, depth_mm, out)


if __name__ == "__main__":
    main()
