"""Benchmark harness: steady-state SLAM fps at QVGA on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's real-time intent of 30 Hz at QVGA on a desktop
CPU+GPU (BASELINE.md — no published numbers exist; README.md:60,97).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from staticfusion_tpu.config import SFConfig, FusionConfig
    from staticfusion_tpu.io import synthetic
    from staticfusion_tpu.pipeline.state import init_state
    from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step

    n_warmup = int(os.environ.get("SF_BENCH_WARMUP", "3"))
    # Enough frames that the one dispatch round-trip + result sync (~20-30 ms
    # through the axon tunnel) amortizes below the per-frame noise floor.
    n_iters = int(os.environ.get("SF_BENCH_ITERS", "60"))
    # 2 -> QVGA (the headline config; README.md:97), 1 -> VGA.
    rf = int(os.environ.get("SF_BENCH_RES_FACTOR", "2"))
    capacity = int(os.environ.get("SF_BENCH_CAPACITY",
                                  str(1 << (18 if rf >= 2 else 20))))

    from staticfusion_tpu.config import CameraConfig

    # Index-map super-resolution factor; defaults to the shipped config
    # default (4 = reference FACTOR, IndexMap.cpp:21 — the accuracy-best
    # config) so the headline bench measures what apps actually run.
    # SF_BENCH_FACTOR=1 benches the fast preset.
    factor = int(os.environ.get("SF_BENCH_FACTOR",
                                str(FusionConfig.index_factor)))
    fkw = dict(capacity=capacity, index_factor=factor)
    if "SF_BENCH_POST_FACTOR" in os.environ:   # else the config default (2)
        fkw["post_factor"] = int(os.environ["SF_BENCH_POST_FACTOR"])
    skw = {}
    if "SF_BENCH_LAMBDA_REG" in os.environ:  # preset comparisons (PERF.md)
        skw["lambda_reg"] = float(os.environ["SF_BENCH_LAMBDA_REG"])
    from staticfusion_tpu.config import SolverConfig

    config = SFConfig(camera=CameraConfig(width=640 // rf, height=480 // rf),
                      solver=SolverConfig(**skw),
                      fusion=FusionConfig(**fkw))

    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    # A real forward sequence (n_iters steady frames): benchmarking repeated
    # back-jumps between 3 frames would exercise the solver's while-loops on
    # motions no tracker sees in practice.
    frames, _ = synthetic.make_sequence(config, n_iters + 2, twist)

    def to_frame(i):
        rgb, depth_mm, _ = frames[i % len(frames)]
        return Frame(rgb=jax.numpy.asarray(rgb),
                     depth_mm=jax.numpy.asarray(depth_mm))

    state, _ = bootstrap_step(to_frame(0), to_frame(1),
                              jax.numpy.eye(4), config)

    # Repack the map into the live-count tier (what SlamSystem does every
    # few frames); the scan below then measures steady-state cost at the
    # honest map size, with headroom for the run's insertions.
    from staticfusion_tpu.fusion.surfels import compact_map, next_tier

    count = int(state.smap.count())
    # Headroom sized to observed steady-state insert rates (hundreds/frame
    # at QVGA); the watermark check below catches any overflow, which would
    # silently turn insertions into map-full drops and skew the measurement.
    tier = min(capacity, max(4096, next_tier(count + count // 8 + 2048)))
    state = state._replace(smap=compact_map(state.smap, tier))

    # Device-resident frame loop: scan over a preloaded frame batch so the
    # measurement contains zero host round-trips (the tunnel's host<->device
    # latency would otherwise dominate).
    import jax.numpy as jnp
    from functools import partial

    batch = Frame(
        rgb=jnp.stack([to_frame(2 + i).rgb for i in range(n_iters)]),
        depth_mm=jnp.stack([to_frame(2 + i).depth_mm
                            for i in range(n_iters)]))

    @jax.jit
    def run_batch(state, batch):
        def body(st, fr):
            st, out = slam_step(st, fr, config)
            return st, out.surfel_count

        return jax.lax.scan(body, state, batch)

    # Warm up and time from the SAME start state: chaining runs would replay
    # the sequence against an already-advanced map (a giant pose back-jump at
    # the seam no tracker sees).  scan fixes the carry avals, so one compile.
    for _ in range(max(1, n_warmup - 1)):
        _, counts = run_batch(state, batch)
        np.asarray(counts[-1])  # sync (block_until_ready lies on axon)

    t0 = time.perf_counter()
    end_state, counts = run_batch(state, batch)
    np.asarray(counts[-1])
    dt = time.perf_counter() - t0
    if int(end_state.smap.used) >= tier:
        print(f"WARNING: insert watermark hit the {tier}-slot tier; "
              "fps reflects map-full behavior", file=sys.stderr)

    fps = n_iters / dt
    row = {
        "metric": "slam_fps_qvga_1chip" if rf == 2 else
                  f"slam_fps_{640 // rf}x{480 // rf}_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }
    if os.environ.get("SF_BENCH_ROOFLINE", "1") == "1":
        # Three-leg machine-ceiling accounting (utils/perf.py): XLA flops
        # + essential bytes (inputs+outputs once — a true lower bound; XLA
        # bytes-accessed overcounts fusion-elided intermediates and is
        # reported as a diagnostic only) + HLO-parsed indexed-element
        # counts, against peaks measured on this chip.  MFU is reported
        # for honesty — a dense-SLAM frame is tens of MFLOPs, so the
        # indexed leg is the binding ceiling, captured by roofline_frac.
        from staticfusion_tpu.utils import perf

        step1 = lambda st, fr: slam_step(st, fr, config)
        rep = perf.roofline_report(step1, (state, to_frame(2)), dt / n_iters)
        row.update({
            "mfu": round(rep["mfu"], 5),
            "roofline_frac": round(rep["roofline_frac"], 3),
            "roofline_ms": round(rep["roofline_ms"], 3),
            "bound_by": max(
                (("flops", rep["t_flops_ms"]), ("bytes", rep["t_bytes_ms"]),
                 ("indexed", rep["t_indexed_ms"])), key=lambda kv: kv[1])[0],
        })
    print(json.dumps(row))


if __name__ == "__main__":
    main()
