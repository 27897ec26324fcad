"""Export a synthetic RGB-D sequence as a TUM-format dataset on disk
(rgb/*.png 8-bit, depth/*.png 16-bit @5000/m, rgbd_assoc.txt,
groundtruth.txt) so the dataset apps can be driven without TUM data.

  python scripts/make_synthetic_dataset.py /tmp/sfdata --frames 20
  python apps/run_tum.py /tmp/sfdata

With --dynamic, a moving sphere crosses the scene (segmentation demo).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--res-factor", type=int, default=1,
                    help="1 writes sensor-native 640x480 (apps downsample)")
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--depth-noise", type=float, default=0.0)
    args = ap.parse_args()

    from staticfusion_tpu.config import CameraConfig, SFConfig
    from staticfusion_tpu.io import synthetic
    from staticfusion_tpu.io.png import write_png


    rf = args.res_factor
    config = SFConfig(camera=CameraConfig(width=640 // rf, height=480 // rf))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    sphere = synthetic.default_world()[1] if args.dynamic else None
    frames, poses = synthetic.make_sequence(
        config, args.frames, twist, sphere=sphere,
        depth_noise=args.depth_noise)

    os.makedirs(os.path.join(args.out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "depth"), exist_ok=True)
    assoc, gt = [], []
    for i, (rgb, depth_mm, _) in enumerate(frames):
        t = 1000.0 + i / 30.0
        rgb_p = f"rgb/{t:.6f}.png"
        dep_p = f"depth/{t:.6f}.png"
        write_png(os.path.join(args.out_dir, rgb_p),
                  np.clip(rgb * 255.0, 0, 255).astype(np.uint8))
        # TUM convention: 5000 units per meter, 16-bit.
        write_png(os.path.join(args.out_dir, dep_p),
                  np.clip(depth_mm * 5.0, 0, 65535).astype(np.uint16))
        # Loader convention (FrontEnd.cpp:196-210): color first, then depth.
        assoc.append(f"{t:.6f} {rgb_p} {t:.6f} {dep_p}")
        q = _quat_from_R(poses[i][:3, :3])
        tx, ty, tz = poses[i][:3, 3]
        gt.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
                  f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")

    with open(os.path.join(args.out_dir, "rgbd_assoc.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")
    with open(os.path.join(args.out_dir, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        f.write("\n".join(gt) + "\n")
    print(f"wrote {len(frames)} frames to {args.out_dir} "
          f"({config.cols}x{config.rows})")


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) from a rotation matrix (TUM order)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


if __name__ == "__main__":
    main()
