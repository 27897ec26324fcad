"""Live-camera entry point (the reference's StaticFusion-camera.cpp).

The reference captures from an OpenNI2 RGB-D sensor
(Utils/RGBD_Camera.{h,cpp}); TPU hosts have no such sensor, so this app
accepts any callable frame source with the same contract
(get() -> (rgb [H,W,3] float, depth_mm [H,W] float) or None at end) and
runs the identical steady-state loop.  A V4L2/OpenNI bridge can plug in by
implementing `FrameSource`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class FrameSource:
    """Override get() to supply frames; return None to stop."""

    def get(self):
        raise NotImplementedError


class SyntheticSource(FrameSource):
    """Built-in demo source: the analytic test world with a moving camera."""

    def __init__(self, config, n_frames=100):
        import numpy as np

        from staticfusion_tpu.io import synthetic

        twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                         np.float32)
        self.frames, _ = synthetic.make_sequence(config, n_frames, twist)
        self.i = 0

    def get(self):
        if self.i >= len(self.frames):
            return None
        rgb, depth_mm, _ = self.frames[self.i]
        self.i += 1
        return rgb, depth_mm


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="live_trajectory.txt")
    args = ap.parse_args()

    from staticfusion_tpu.config import SFConfig
    from staticfusion_tpu.pipeline.system import SlamSystem

    config = SFConfig()
    source = SyntheticSource(config, args.frames)
    slam = SlamSystem(config)

    i = 0
    while True:
        frame = source.get()
        if frame is None:
            break
        out = slam.process(frame[0], frame[1], timestamp=i / 30.0)
        if out is not None and i % 10 == 0:
            print(f"frame {i}: surfels={int(out.surfel_count)} "
                  f"fps={1.0 / max(slam.frame_seconds[-1], 1e-9):.1f}")
        i += 1
    slam.write_trajectory(args.out)
    print(f"wrote {len(slam.poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
