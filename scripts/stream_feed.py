"""RGB-D stream producer: feeds apps/run_camera.py over the SFRD wire
format (staticfusion_tpu/io/stream.py) at a paced sensor rate.

This is the capture-daemon template: on a sensor machine, replace
`frames()` with the real camera read loop and point it at the SLAM host.

  python scripts/stream_feed.py --to tcp://slam-host:7070 --fps 30
  python scripts/stream_feed.py --to listen://7070 --frames 120
  python scripts/stream_feed.py --to /tmp/seq.sfrd        # record a file
"""

import argparse
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def open_sink(spec: str, retry_s: float = 30.0):
    if spec.startswith("tcp://"):
        host, port = spec[6:].rsplit(":", 1)
        deadline = time.time() + retry_s
        while True:
            try:
                s = socket.create_connection((host, int(port)), timeout=5.0)
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.5)   # the SLAM host may still be starting up
        return s.makefile("wb")
    if spec.startswith("listen://"):
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("0.0.0.0", int(spec[9:])))
        srv.listen(1)
        conn, _ = srv.accept()
        srv.close()
        return conn.makefile("wb")
    if spec.startswith("fifo://"):
        return open(spec[7:], "wb")
    return open(spec, "wb")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--to", required=True)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--fps", type=float, default=30.0,
                    help="0 = unpaced (as fast as the sink accepts)")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    args = ap.parse_args()

    from staticfusion_tpu.config import CameraConfig, SFConfig
    from staticfusion_tpu.io import stream, synthetic

    config = SFConfig(camera=CameraConfig(width=args.width,
                                          height=args.height))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, _ = synthetic.make_sequence(config, args.frames, twist)

    f = open_sink(args.to)
    stream.write_stream_header(f, args.width, args.height)
    t0 = time.time()
    for i, (rgb, depth_mm, _) in enumerate(frames):
        if args.fps > 0:
            target = t0 + i / args.fps
            dt = target - time.time()
            if dt > 0:
                time.sleep(dt)
        stream.write_frame(f, rgb, depth_mm, time.time())
        f.flush()
    stream.write_stream_end(f)
    f.close()
    print(f"streamed {len(frames)} frames to {args.to}")


if __name__ == "__main__":
    main()
