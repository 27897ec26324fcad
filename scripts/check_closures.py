"""Validate accepted loop closures in an ACC json against ground truth.

For each closure event (which records the measured constraint T_rel =
kf_T_cur), compare against the true relative pose from the cached
sequence's ground-truth trajectory.  A genuine closure's translation error
is centimeters; a z-aliased false closure is off by meters.  Emits one
line per closure plus a summary the evidence tables cite.

  python scripts/check_closures.py ACC_r5_corridor_on_s0.json [...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(path: str) -> dict:
    from staticfusion_tpu.config import CameraConfig, SFConfig
    from staticfusion_tpu.io import adversarial as adv

    rows = json.load(open(path))
    out = []
    for r in rows:
        rf = r.get("res_factor", 2)
        cfg = SFConfig(camera=CameraConfig(width=640 // rf,
                                           height=480 // rf))
        _, gt = adv.make_adversarial_sequence(
            cfg, r["frames"], r["profile"], seed=r.get("seed", 0),
            cache_dir=os.environ.get("SF_ADV_CACHE", "/tmp/sf_adv_cache"))
        errs = []
        for c in r.get("closure_events", []):
            i_kf, i_cur = c["keyframe"], c["frame"]
            gt_rel = np.linalg.inv(gt[i_kf]) @ gt[i_cur]
            err = float(np.linalg.norm(
                np.asarray(c["T_rel"])[:3, 3] - gt_rel[:3, 3]))
            errs.append(err)
            print(f"{os.path.basename(path)}: kf {i_kf} -> frame {i_cur}: "
                  f"|T - T_gt| = {err * 100:.1f} cm "
                  f"(residual {c['residual']:.4f})")
        summary = {
            "file": os.path.basename(path),
            "closures": len(errs),
            "max_T_err_m": round(max(errs), 4) if errs else None,
            "median_T_err_m": round(float(np.median(errs)), 4) if errs
            else None,
            "false_closures_gt_0p5m": int(sum(e > 0.5 for e in errs)),
        }
        print(json.dumps(summary))
        out.append(summary)
    return out


if __name__ == "__main__":
    for p in sys.argv[1:]:
        check(p)
