"""TUM RGB-D evaluation run (the reference's StaticFusion-datasets.cpp,
headless): TUM PNG sequence + groundtruth anchor + trajectory export +
built-in ATE.

  python apps/run_tum.py <dataset_dir> [--assoc rgbd_assoc.txt] ...

This is run_sequence with TUM conventions pre-set: depth_scale 5000,
GT-anchored initial pose, results under ./odometry_results/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    os.makedirs("odometry_results", exist_ok=True)
    n = 0
    while os.path.exists(f"odometry_results/experiment_{n:03d}.txt"):
        n += 1
    defaults = ["--depth-scale", "5000",
                "--out", f"odometry_results/experiment_{n:03d}.txt"]
    from apps.run_sequence import main as run

    run(argv + [d for d in defaults
                if d.split()[0] not in " ".join(argv)])


if __name__ == "__main__":
    main()
