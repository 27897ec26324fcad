"""The repo's perf record: primitive costs + per-frame roofline model.

Consolidates the round-1/2 scratch microbenches (microbench*.py,
proto_pallas_zbuf*.py — retired in round 3) into one reproducible script.
Their load-bearing findings, reproduced by `--primitives`:

* XLA dynamic scatter/gather on TPU costs a per-index serial loop:
  ~25-50 ns/index on v5e at pipeline sizes (65k-1M), nearly independent of
  row WIDTH (a 14-wide row gather ~ a 1-wide gather per index; a 16-wide
  row scatter ~ a narrow one) and of index coherence.  Consequence: pack
  many fields into ONE wide indexed op (surfels.py, texelmap.py do).
* A Pallas scalar-RMW z-buffer measured 16-20 ms per QVGA render in
  round 1 (proto_pallas_zbuf3) — Mosaic has no vectorized arbitrary
  gather/scatter, so the XLA scatter IS the fast path; the per-index wall
  is a hardware-model limit, not a tuning gap.  The structural answer is
  fewer indexed elements (the F>1 surfel-major sparse path).
* lax.fori_loop carries a per-iteration dispatch floor; hot fixed-trip
  loops are unrolled in-graph instead (solver levels, window offsets).

Usage (on the TPU):
  python scripts/perf_model.py                 # primitives + rooflines
  python scripts/perf_model.py --json out.json
  python scripts/perf_model.py --factors 1,4 --frames 30
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def primitive_table():
    from staticfusion_tpu.utils import perf

    rows = []
    for n in (1 << 16, 1 << 17, 1 << 18, 1 << 20):
        r = perf.measure_indexed_ns(n=n)
        rows.append({"n": n, **{k: round(v, 2) for k, v in r.items()}})
        print(f"  n={n:>8}: scatter {r['scatter_ns_per_index']:5.1f} ns/idx"
              f"   gather {r['gather_ns_per_index']:5.1f} ns/idx",
              flush=True)
    mm_bf16 = perf.measure_matmul_tflops("bfloat16")
    mm_f32 = perf.measure_matmul_tflops("float32", m=2048, k=2048, n=2048)
    bw = perf.measure_hbm_gbps()
    print(f"  matmul bf16 {mm_bf16:.1f} TFLOP/s (spec {perf.V5E_PEAK_BF16_TFLOPS})"
          f"   f32 {mm_f32:.1f} TFLOP/s", flush=True)
    print(f"  hbm saxpy {bw:.0f} GB/s (spec {perf.V5E_HBM_GBPS})", flush=True)
    return {"indexed": rows, "matmul_bf16_tflops": round(mm_bf16, 1),
            "matmul_f32_tflops": round(mm_f32, 1),
            "hbm_gbps": round(bw, 1)}


def step_roofline(factor: int, n_frames: int, peaks):
    """Measure the steady-state frame time at the bench config and compare
    with the three-leg ceiling of the jitted step (utils/perf.py)."""
    import jax
    import jax.numpy as jnp

    from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
    from staticfusion_tpu.io import synthetic
    from staticfusion_tpu.fusion.surfels import compact_map, next_tier
    from staticfusion_tpu.pipeline.step import (Frame, bootstrap_step,
                                                slam_step)
    from staticfusion_tpu.utils import perf

    config = SFConfig(camera=CameraConfig(width=320, height=240),
                      fusion=FusionConfig(capacity=1 << 18,
                                          index_factor=factor))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, _ = synthetic.make_sequence(config, n_frames + 2, twist)

    def to_frame(i):
        rgb, depth_mm, _ = frames[i % len(frames)]
        return Frame(rgb=jnp.asarray(rgb), depth_mm=jnp.asarray(depth_mm))

    state, _ = bootstrap_step(to_frame(0), to_frame(1), jnp.eye(4), config)
    count = int(state.smap.count())
    tier = max(4096, next_tier(count + count // 8 + 2048))
    state = state._replace(smap=compact_map(state.smap, tier))

    batch = Frame(
        rgb=jnp.stack([to_frame(2 + i).rgb for i in range(n_frames)]),
        depth_mm=jnp.stack([to_frame(2 + i).depth_mm
                            for i in range(n_frames)]))

    @jax.jit
    def run_batch(state, batch):
        def body(st, fr):
            st, out = slam_step(st, fr, config)
            return st, out.surfel_count
        return jax.lax.scan(body, state, batch)

    for _ in range(2):
        _, c = run_batch(state, batch)
        np.asarray(c[-1])
    t0 = time.perf_counter()
    _, c = run_batch(state, batch)
    np.asarray(c[-1])
    per_frame = (time.perf_counter() - t0) / n_frames

    step1 = lambda st, fr: slam_step(st, fr, config)
    rep = perf.roofline_report(step1, (state, to_frame(2)), per_frame,
                               peaks=peaks)
    print(f"  F={factor}: measured {rep['measured_ms']:.2f} ms/frame | "
          f"legs flops {rep['t_flops_ms']:.2f} / bytes {rep['t_bytes_ms']:.2f}"
          f" / indexed {rep['t_indexed_ms']:.2f} ms | roofline "
          f"{rep['roofline_ms']:.2f} ms -> frac {rep['roofline_frac']:.2f} | "
          f"mfu {rep['mfu']:.4f}", flush=True)
    print(f"        model: {rep['flops']/1e6:.0f} MFLOP, "
          f"{rep['essential_bytes']/1e6:.0f} MB essential "
          f"({rep['xla_bytes_accessed']/1e6:.0f} MB XLA-accessed), "
          f"{rep['scatter_rows']/1e3:.0f}k scatter rows + "
          f"{rep['gather_rows']/1e3:.0f}k gather rows in "
          f"{rep['indexed_ops']:.0f} indexed ops", flush=True)
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in rep.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factors", default="1,4")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--primitives-only", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    print("primitive peaks (this chip):", flush=True)
    prim = primitive_table()
    out = {"primitives": prim}
    if not args.primitives_only:
        peaks = {
            "matmul_tflops": prim["matmul_bf16_tflops"],
            "hbm_gbps": prim["hbm_gbps"],
            "scatter_ns_per_index": prim["indexed"][1][
                "scatter_ns_per_index"],
            "gather_ns_per_index": prim["indexed"][1]["gather_ns_per_index"],
        }
        print("per-frame roofline (QVGA bench config):", flush=True)
        for f in (int(x) for x in args.factors.split(",")):
            out[f"step_f{f}"] = step_roofline(f, args.frames, peaks)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
