"""Live-camera entry point (the reference's StaticFusion-camera.cpp).

The reference captures from an OpenNI2 RGB-D sensor
(Utils/RGBD_Camera.{h,cpp}); TPU hosts have no sensor bus, so the live
path consumes an RGB-D byte stream (socket / FIFO / recorded file —
staticfusion_tpu/io/stream.py defines the wire format) with the same
sensor semantics: 3 m depth truncation, drop-to-latest delivery, and
per-frame capture->pose latency accounting.  `--source synthetic` runs
the built-in analytic world instead; any object with the `FrameSource`
contract (get() -> (rgb, depth_mm[, timestamp]) or None) also plugs in.

  python apps/run_camera.py --source synthetic --frames 60
  python apps/run_camera.py --source listen://7070      # capture daemon
  python apps/run_camera.py --source tcp://cam-host:7070
  python apps/run_camera.py --source fifo:///tmp/rgbd.fifo
  python apps/run_camera.py --source recorded.sfrd --replay
"""

import argparse
import os
import sys
import time

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


def run_loop(slam, source, max_frames=None, log_every=10):
    """The steady-state capture loop (StaticFusion-camera.cpp:118-150).
    Returns per-frame wall latencies (capture->pose, when the source
    timestamps its frames)."""
    i = 0
    latencies = []
    while max_frames is None or i < max_frames:
        frame = source.get()
        if frame is None:
            break
        rgb, depth_mm = frame[0], frame[1]
        ts = frame[2] if len(frame) > 2 else i / 30.0
        out = slam.process(rgb, depth_mm, timestamp=ts)
        if len(frame) > 2:
            latencies.append(time.time() - ts)
        if out is not None and i % log_every == 0:
            lat = f" latency={latencies[-1]*1e3:.0f}ms" if latencies else ""
            drop = (f" dropped={source.dropped}"
                    if hasattr(source, "dropped") else "")
            print(f"frame {i}: surfels={int(out.surfel_count)} "
                  f"fps={1.0 / max(slam.frame_seconds[-1], 1e-9):.1f}"
                  f"{lat}{drop}", flush=True)
        i += 1
    return latencies


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default="synthetic",
                    help="synthetic | tcp://h:p | listen://p | fifo://path "
                         "| recorded stream file")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--replay", action="store_true",
                    help="deliver every stream frame (deterministic replay) "
                         "instead of drop-to-latest live semantics")
    ap.add_argument("--mirror", action="store_true",
                    help="horizontal mirror (the reference's OpenNI "
                         "mirroring, RGBD_Camera.cpp:87-93)")
    ap.add_argument("--out", default="live_trajectory.txt")
    args = ap.parse_args()

    from staticfusion_tpu.config import SFConfig
    from staticfusion_tpu.pipeline.system import SlamSystem

    config = SFConfig()
    if args.source == "synthetic":
        source = SyntheticSource(config, args.frames)
        max_frames = None
    else:
        from staticfusion_tpu.io.stream import StreamSource

        source = StreamSource(args.source, mirror=args.mirror,
                              latest_only=not args.replay)
        max_frames = args.frames if args.frames > 0 else None
    slam = SlamSystem(config)

    latencies = run_loop(slam, source, max_frames)
    slam.write_trajectory(args.out)
    print(f"wrote {len(slam.poses)} poses to {args.out}")
    if latencies:
        import numpy as np

        print(f"capture->pose latency: median "
              f"{np.median(latencies)*1e3:.0f} ms, p90 "
              f"{np.quantile(latencies, 0.9)*1e3:.0f} ms")
    if hasattr(source, "dropped"):
        print(f"stream: {source.received} received, "
              f"{source.dropped} dropped (drop-to-latest)")


if __name__ == "__main__":
    main()
