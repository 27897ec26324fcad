"""Multi-host SLAM launcher / worker.

Worker mode (one per host/process; on TPU pods use --auto):

  python scripts/run_multihost.py --coordinator host:port \
      --num-processes N --process-id I --devices-per-process K \
      --n-pix A --n-map B --frames M

Spawn mode (local CPU rig; starts N workers on this machine):

  python scripts/run_multihost.py --spawn N [--devices-per-process K] ...

Every process feeds the same synthetic frame stream (SPMD); the sharded
step divides image rows over `pix` and surfel blocks over `map`, with
cross-process collectives (Gloo on CPU, ICI/DCN on TPU).  Each process
prints the final pose and per-frame poses for cross-process consistency
checks (tests/test_multihost.py).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_pytest")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    if not args.auto:
        # MUST precede any jax import: with JAX_PLATFORMS=axon inherited
        # from the sandbox, the TPU plugin initializes the backend at
        # import time, and jax.distributed.initialize would then refuse.
        os.environ["JAX_PLATFORMS"] = "cpu"
        # FORCE the per-process device count, replacing any inherited value
        # (a pytest parent exports =8, which would give every worker all 8
        # devices and leave other processes without addressable shards).
        import re as _re

        flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                        os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.devices_per_process}").strip()
    from staticfusion_tpu.parallel import distributed as dist

    if args.auto:
        dist.initialize()
    else:
        dist.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id,
                        cpu_devices_per_process=args.devices_per_process)

    import jax
    import numpy as np

    from staticfusion_tpu.config import (CameraConfig, FusionConfig,
                                         SFConfig)
    from staticfusion_tpu.io import synthetic

    pid = jax.process_index()
    print(f"proc {pid}/{jax.process_count()}: "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices", flush=True)

    config = SFConfig(camera=CameraConfig(width=args.width,
                                          height=args.height),
                      fusion=FusionConfig(capacity=args.capacity))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, gt = synthetic.make_sequence(config, args.frames, twist)

    slam = dist.DistributedSlam(config, args.n_pix, args.n_map)
    for i, (rgb, depth_mm, _) in enumerate(frames):
        pose = slam.process(rgb, depth_mm)
        if pose is not None:
            print(f"POSE {i} " + " ".join(f"{v:.6f}" for v in pose.ravel()),
                  flush=True)
    err = np.linalg.norm(slam.poses[-1][:3, 3] - gt[-1][:3, 3])
    print(f"FINAL err_vs_gt={err:.6f}", flush=True)


def spawn(args):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    procs = []
    base = [sys.executable, os.path.abspath(__file__),
            "--coordinator", coord,
            "--num-processes", str(args.spawn),
            "--devices-per-process", str(args.devices_per_process),
            "--n-pix", str(args.n_pix), "--n-map", str(args.n_map),
            "--frames", str(args.frames),
            "--width", str(args.width), "--height", str(args.height),
            "--capacity", str(args.capacity)]
    for i in range(args.spawn):
        procs.append(subprocess.Popen(
            base + ["--process-id", str(i)],
            stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL))
    rc = max(p.wait() for p in procs)
    sys.exit(rc)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spawn", type=int, default=0,
                    help="spawn N local worker processes (CPU rig)")
    ap.add_argument("--auto", action="store_true",
                    help="TPU pod auto-detection (jax.distributed no-args)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--n-pix", type=int, default=2)
    ap.add_argument("--n-map", type=int, default=4)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--width", type=int, default=80)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=1 << 14)
    args = ap.parse_args()
    if args.spawn:
        spawn(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
