"""Multi-chip communication model from the compiled sharded-step HLO.

Real multi-chip hardware is unavailable in this environment, so this is
the honest substitute for a measured scaling curve (VERDICT round 2 #9):
compile the FULL sharded SLAM step for each candidate (pix, map) mesh on
virtual devices, parse every collective out of the optimized HLO, convert
to per-device wire bytes with the standard ring-cost factors
(all-reduce 2(N-1)/N * S, all-gather / reduce-scatter (N-1)/N * S,
collective-permute S), and combine with the measured single-chip frame
time to predict scaling efficiency:

    eff(N) = t_compute / (t_compute + t_comm)
    t_compute = t_1chip / N          (the pipeline is pixel/surfel-sharded)
    t_comm    = bytes_per_device / BW_eff

BW_eff is the effective per-chip ICI bandwidth.  The v5e spec sheet lists
1600 Gbps (=200 GB/s) aggregate ICI per chip; the model reports, for each
mesh, BOTH the predicted efficiency at a conservative default and the
BREAK-EVEN bandwidth at which eff = 0.8 — so the conclusion does not hinge
on one assumed constant.

  python scripts/comm_model.py [--devices 8] [--json COMM_MODEL.json]
          [--t1chip-ms 9.2] [--bw-gbps 100]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
               "bf16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

_COLL_RE = re.compile(
    r"= ([a-z0-9]+)\[([\d,]*)\][^ ]* (all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)(-start)?\(")


def collective_bytes(hlo: str, n_devices: int):
    """Per-device wire bytes of one execution, by ring cost factors."""
    per_op = []
    total = 0.0
    for line in hlo.splitlines():
        m = _COLL_RE.search(line)
        if m is None:
            continue
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        size = DTYPE_BYTES.get(dt, 4)
        for d in dims.split(","):
            if d:
                size *= int(d)
        n = n_devices
        if kind == "all-reduce":
            wire = 2.0 * size * (n - 1) / n
        elif kind in ("all-gather", "reduce-scatter"):
            wire = size * (n - 1) / n
        else:  # collective-permute / all-to-all
            wire = float(size)
        per_op.append({"kind": kind, "bytes": size,
                       "wire_bytes": round(wire)})
        total += wire
    return total, per_op


def compile_mesh(n_pix: int, n_map: int, qvga: bool = True):
    import jax

    from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
    from staticfusion_tpu.parallel import mesh as mesh_lib
    from staticfusion_tpu.parallel.sharded import make_sharded_step
    from staticfusion_tpu.pipeline.state import init_state
    from staticfusion_tpu.pipeline.step import Frame
    import jax.numpy as jnp
    import numpy as np

    if qvga:
        config = SFConfig(camera=CameraConfig(width=320, height=240),
                          fusion=FusionConfig(capacity=1 << 17))
    else:
        config = SFConfig(camera=CameraConfig(width=80, height=64),
                          fusion=FusionConfig(capacity=1 << 14))
    mesh = mesh_lib.make_mesh(n_pix, n_map)
    state = init_state(config)
    state = state._replace(tick=jnp.asarray(2, jnp.int32),
                           im_count=jnp.asarray(1, jnp.int32))
    frame = Frame(rgb=jnp.zeros((config.rows, config.cols, 3)),
                  depth_mm=jnp.full((config.rows, config.cols), 1500.0))
    state = mesh_lib.place_state(state, mesh)
    frame = jax.device_put(frame, mesh_lib.frame_shardings(mesh))
    step = make_sharded_step(config, mesh)
    compiled = step.lower(state, frame).compile()
    return compiled.as_text()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--t1chip-ms", type=float, default=9.2,
                    help="measured single-chip QVGA frame time (bench.py)")
    ap.add_argument("--bw-gbps", type=float, default=100.0,
                    help="assumed effective per-chip ICI GB/s (v5e spec "
                         "aggregate: 200 GB/s)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    shapes = []
    n = args.devices
    for n_pix in (1, 2, 4, 8):
        if n % n_pix == 0 and n_pix <= n:
            shapes.append((n_pix, n // n_pix))

    out = {"devices": n, "t1chip_ms": args.t1chip_ms,
           "bw_gbps_assumed": args.bw_gbps, "meshes": []}
    for n_pix, n_map in shapes:
        hlo = compile_mesh(n_pix, n_map)
        total, per_op = collective_bytes(hlo, n)
        t_comp = args.t1chip_ms / n
        t_comm = total / (args.bw_gbps * 1e9) * 1e3
        eff = t_comp / (t_comp + t_comm)
        # eff = 0.8  <=>  t_comm = 0.25 * t_comp
        be_bw = total / (0.25 * t_comp * 1e-3) / 1e9
        row = {
            "mesh": f"pix{n_pix}xmap{n_map}",
            "collectives": len(per_op),
            "wire_bytes_per_device": round(total),
            "t_comm_ms": round(t_comm, 4),
            "pred_efficiency": round(eff, 3),
            "breakeven_bw_gbps_for_0.8": round(be_bw, 1),
            "by_kind": {},
        }
        for op in per_op:
            row["by_kind"].setdefault(op["kind"], 0)
            row["by_kind"][op["kind"]] += op["wire_bytes"]
        # The dominating individual transfers, for targeted byte cuts.
        row["top_ops"] = sorted(per_op, key=lambda o: -o["wire_bytes"])[:12]
        out["meshes"].append(row)
        print(f"mesh pix{n_pix}xmap{n_map}: {len(per_op)} collectives, "
              f"{total/1e6:.2f} MB/device/frame -> t_comm "
              f"{t_comm:.3f} ms vs t_comp {t_comp:.3f} ms -> eff "
              f"{eff:.3f} (0.8 needs >= {be_bw:.1f} GB/s)", flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
