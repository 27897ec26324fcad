"""Reference-capacity scale benchmark: fps vs total surfel count.

The reference allocates 3072^2 ~ 9.4M surfels x 48 B (GlobalModel.cpp:21-22)
and streams the live count through GL transform feedback each frame.  On
TPU an indexed op costs per ROW whether or not the row is culled (measured
63 ms for one 8.4M-row scatter on v5e), so the framework bounds per-frame
cost with the active/archive split (pipeline/system.py): surfels outside
the `time_delta` freshness window — permanently invisible to every indexed
pass by the reference's own index-map cull — live in an archive the jitted
step never touches.

This bench measures steady-state fps at QVGA with 1M/4M/8M TOTAL surfels
(active working set + synthetic archive), plus the naive no-archive
configuration for comparison, and reports the HBM bytes of map residency.

  python scripts/scale_bench.py [--sizes 1,4,8] [--json SCALE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_archive(n, rng):
    """A plausible n-surfel archive: an explored room volume."""
    import jax.numpy as jnp

    from staticfusion_tpu.fusion.surfels import SurfelMap

    pos = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-9
    return SurfelMap(
        pos=pos, conf=jnp.full((n,), 5.0),
        color=jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        hist=jnp.full((n,), 10.0), init_time=jnp.ones((n,)),
        last_time=jnp.ones((n,)),       # stale since tick 1
        normal=jnp.asarray(nrm), radius=jnp.full((n,), 0.01),
        valid=jnp.ones((n,), bool), used=jnp.asarray(n, np.int32))


def run_steady(n_total, naive, n_iters=30):
    import jax
    import jax.numpy as jnp

    from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
    from staticfusion_tpu.fusion.surfels import (compact_map, concat_maps,
                                                 next_tier)
    from staticfusion_tpu.io import synthetic
    from staticfusion_tpu.pipeline.step import (Frame, bootstrap_step,
                                                slam_step)

    config = SFConfig(camera=CameraConfig(width=320, height=240),
                      fusion=FusionConfig(capacity=1 << 24))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, _ = synthetic.make_sequence(config, n_iters + 2, twist)

    def to_frame(i):
        rgb, depth_mm, _ = frames[i % len(frames)]
        return Frame(rgb=jnp.asarray(rgb), depth_mm=jnp.asarray(depth_mm))

    state, _ = bootstrap_step(to_frame(0), to_frame(1), jnp.eye(4), config)
    live = int(state.smap.count())
    n_arch = max(0, n_total - live)
    rng = np.random.RandomState(7)
    archive = build_archive(n_arch, rng) if n_arch else None

    if naive and archive is not None:
        # Everything in the working map: the per-frame indexed ops now
        # carry every archived row too (they cull, but rows still cost).
        tier = next_tier(n_total + n_total // 8 + 4096)
        smap = compact_map(concat_maps(state.smap, archive), tier)
        state = state._replace(smap=smap)
    else:
        tier = next_tier(live + live // 8 + 2048)
        state = state._replace(smap=compact_map(state.smap, tier))

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

    for _ in range(2):
        _, c = run_batch(state, batch)
        np.asarray(c[-1])
    t0 = time.perf_counter()
    _, c = run_batch(state, batch)
    np.asarray(c[-1])
    dt = (time.perf_counter() - t0) / n_iters

    map_bytes = (state.smap.capacity
                 + (0 if naive or archive is None
                    else archive.capacity)) * 15 * 4
    return {
        "total_surfels": n_total,
        "mode": "naive" if naive else "archived",
        "active_tier": int(state.smap.capacity),
        "fps": round(1.0 / dt, 2),
        "ms_per_frame": round(dt * 1e3, 2),
        "map_hbm_mb": round(map_bytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", default="1,4,8", help="millions of surfels")
    ap.add_argument("--naive-sizes", default="1",
                    help="millions for the no-archive comparison")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for m in (float(x) for x in args.sizes.split(",") if x):
        r = run_steady(int(m * 1e6), naive=False)
        rows.append(r)
        print(r, flush=True)
    for m in (float(x) for x in args.naive_sizes.split(",") if x):
        r = run_steady(int(m * 1e6), naive=True,
                       n_iters=8 if m >= 4 else 20)
        rows.append(r)
        print(r, flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
