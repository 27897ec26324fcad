"""Segmentation diagnostic: precision/recall/IoU breakdown of the dynamic
mask on the adversarial walk suite, plus per-cluster stats — the tool behind
the round-4 IoU push (VERDICT round 3, item 8).

  python scripts/seg_diag.py [--frames 40] [--seed 0] [--kb 1.5] [--kz 1.5]
      [--lambda-reg 0.35] [--rescue 0.017] [--json out.json]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--kb", type=float, default=None)
    ap.add_argument("--kz", type=float, default=None)
    ap.add_argument("--lambda-reg", type=float, default=None)
    ap.add_argument("--lambda-prior", type=float, default=None)
    ap.add_argument("--rescue", type=float, default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--save-probs", default=None,
                    help="npz path for per-frame static_prob + gt masks "
                         "(offline error-geography analysis)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from staticfusion_tpu.config import (CameraConfig, FusionConfig, SFConfig,
                                         SolverConfig)
    from staticfusion_tpu.io import adversarial as adv
    from staticfusion_tpu.pipeline.system import SlamSystem

    skw = {}
    if args.kb is not None:
        skw["kb"] = args.kb
    if args.kz is not None:
        skw["kz"] = args.kz
    if args.lambda_reg is not None:
        skw["lambda_reg"] = args.lambda_reg
    if args.lambda_prior is not None:
        skw["lambda_prior"] = args.lambda_prior
    ckw = {}
    if args.rescue is not None:
        ckw["rescue_residual_threshold"] = args.rescue
    config = SFConfig(camera=CameraConfig(width=320, height=240),
                      solver=SolverConfig(**skw),
                      fusion=FusionConfig(capacity=1 << 18,
                                          index_factor=args.factor),
                      **ckw)
    frames, gt = adv.make_adversarial_sequence(
        config, args.frames, "walk_xyz", seed=args.seed,
        cache_dir=os.environ.get("SF_ADV_CACHE", "/tmp/sf_adv_cache"))
    slam = SlamSystem(config)
    rgbs = [f[0] for f in frames]
    depths = [f[1] for f in frames]
    dyns = [f[2] for f in frames]
    ts = [i / 30.0 for i in range(args.frames)]
    probs = slam.process_batch(rgbs, depths, ts, collect_prob=True)
    slam.block()
    probs = np.asarray(probs)

    rows = []
    for i in range(1, args.frames):
        if i < config.buffer_length or dyns[i].sum() <= 50:
            continue
        valid = depths[i] > 0
        pred = (probs[i - 1] < args.threshold) & valid
        gtm = dyns[i] & valid
        tp = float((pred & gtm).sum())
        fp = float((pred & ~gtm).sum())
        fn = float((~pred & gtm).sum())
        rows.append({
            "frame": i,
            "iou": tp / max(tp + fp + fn, 1.0),
            "precision": tp / max(tp + fp, 1.0),
            "recall": tp / max(tp + fn, 1.0),
            "gt_px": int(gtm.sum()),
        })

    times = np.arange(args.frames) / 30.0
    ate = slam.ate(times, gt)
    agg = {
        "kb": config.solver.kb, "kz": config.solver.kz,
        "lambda_reg": config.solver.lambda_reg,
        "lambda_prior": config.solver.lambda_prior,
        "rescue": config.rescue_residual_threshold,
        "seed": args.seed, "frames": args.frames,
        "ate_rmse_m": round(ate, 5),
        "iou": round(float(np.mean([r["iou"] for r in rows])), 4),
        "precision": round(float(np.mean([r["precision"] for r in rows])), 4),
        "recall": round(float(np.mean([r["recall"] for r in rows])), 4),
    }
    print(json.dumps(agg))
    if args.save_probs:
        np.savez_compressed(args.save_probs, probs=probs,
                            dyn=np.stack(dyns), depth=np.stack(depths))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"aggregate": agg, "frames": rows}, f, indent=2)


if __name__ == "__main__":
    main()
