"""Marginal in-context cost of each pipeline stage: monkeypatch one stage
to a cheap stub, re-jit the FULL slam_step, and compare wall time.

Standalone stage timings (profile_stages.py) overlap under XLA's scheduler;
this measures what each stage actually costs inside the fused program."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig, FusionConfig
from staticfusion_tpu.io import synthetic

N = int(os.environ.get("SF_ABLATE_ITERS", "30"))


def build(config):
    from staticfusion_tpu.pipeline.step import Frame, bootstrap_step, slam_step
    from staticfusion_tpu.fusion.surfels import compact_map, next_tier

    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, _ = synthetic.make_sequence(config, N + 2, twist)

    def to_frame(i):
        rgb, depth_mm, _ = frames[i % len(frames)]
        return Frame(rgb=jnp.asarray(rgb), depth_mm=jnp.asarray(depth_mm))

    state, _ = bootstrap_step(to_frame(0), to_frame(1), jnp.eye(4), config)
    count = int(state.smap.count())
    tier = max(4096, next_tier(count + count // 4 + 4096))
    state = state._replace(smap=compact_map(state.smap, tier))
    batch = Frame(
        rgb=jnp.stack([to_frame(2 + i).rgb for i in range(N)]),
        depth_mm=jnp.stack([to_frame(2 + i).depth_mm for i in range(N)]))

    def run_batch(state, batch):
        def body(st, fr):
            st, out = slam_step(st, fr, config)
            return st, out.surfel_count
        return jax.lax.scan(body, state, batch)

    return jax.jit(run_batch), state, batch


def timeit(label, config):
    jax.clear_caches()  # force a fresh trace so patched stages take effect
    fn, state, batch = build(config)
    for _ in range(2):
        _, c = fn(state, batch)
        np.asarray(c[-1])
    t0 = time.perf_counter()
    _, c = fn(state, batch)
    np.asarray(c[-1])
    dt = (time.perf_counter() - t0) / N
    print(f"{label:28s} {dt*1000:7.2f} ms/frame", flush=True)
    return dt


def main():
    factor = int(os.environ.get("SF_ABLATE_FACTOR", "1"))
    rf = int(os.environ.get("SF_ABLATE_RES_FACTOR", "2"))  # 2=QVGA, 1=VGA
    from staticfusion_tpu.config import CameraConfig
    config = SFConfig(
        camera=CameraConfig(width=640 // rf, height=480 // rf),
        fusion=FusionConfig(capacity=1 << (18 if rf >= 2 else 20),
                            index_factor=factor))
    base = timeit("full step", config)

    import staticfusion_tpu.pipeline.temporal as temporal
    import staticfusion_tpu.fusion.clean as clean
    import staticfusion_tpu.fusion.backend as backend
    import staticfusion_tpu.fusion.predict as predict
    import staticfusion_tpu.ops.bilateral as bilateral
    import staticfusion_tpu.pipeline.step as step_mod

    orig_temporal = temporal.compute_temporal_residuals
    def no_temporal(*a, **k):
        out = orig_temporal(*a, **k)
        return jax.tree_util.tree_map(jnp.zeros_like, out)

    orig_kill = clean.window_kill_tex
    def no_kill(merged, tick, config):
        return jnp.zeros_like(orig_kill(merged, tick, config))

    orig_splat = predict.splat_from_texels
    def no_splat(tex, config):
        out = orig_splat(tex, config)
        return jax.tree_util.tree_map(jnp.zeros_like, out)

    import staticfusion_tpu.fusion.update as update_mod
    import staticfusion_tpu.solver.runsolver as runsolver
    import staticfusion_tpu.solver.irls as irls
    import staticfusion_tpu.solver.clustering as clustering_mod
    import staticfusion_tpu.fusion.indexmap as indexmap
    import staticfusion_tpu.fusion.association as association
    import staticfusion_tpu.fusion.sparse as sparse_mod
    import staticfusion_tpu.ops.warp as warp_mod

    def zeroed(orig):
        def stub(*a, **k):
            return jax.tree_util.tree_map(jnp.zeros_like, orig(*a, **k))
        return stub

    from staticfusion_tpu.ops.warp import WarpedImages

    def no_warp(pred, cur_depth, T, fovh):
        return WarpedImages(depth=pred.depth, intensity=pred.intensity,
                            xx=pred.xx, yy=pred.yy)

    # (name, stub, [modules holding a direct reference])
    ablations = [
        ("compute_temporal_residuals", no_temporal, [temporal, step_mod]),
        ("window_kill_tex", no_kill, [clean, backend]),
        ("splat_from_texels", no_splat, [predict]),
        ("bilateral_filter_mm", lambda d, m: d, [bilateral]),
        ("solve_irls", zeroed(irls.solve_irls), [irls, runsolver]),
        ("warp_images_gather", no_warp, [warp_mod, runsolver]),
        ("cluster_frame", zeroed(clustering_mod.cluster_frame),
         [clustering_mod, runsolver]),
        # The next three are a drill-down WITHIN cluster_frame (sub-stages of
        # it): their marginals overlap cluster_frame's and must not be summed
        # with it.
        ("  cluster_frame/initialize_centers",
         zeroed(clustering_mod.initialize_centers), [clustering_mod]),
        ("  cluster_frame/lloyd_iterate",
         zeroed(clustering_mod.lloyd_iterate), [clustering_mod]),
        ("  cluster_frame/compute_connectivity",
         zeroed(clustering_mod.compute_connectivity), [clustering_mod]),
        ("predict_indices", zeroed(indexmap.predict_indices),
         [indexmap, backend]),
        ("merge_texels", lambda tex, upd, tick, config: tex,
         [update_mod, backend]),
        ("writeback_and_insert",
         lambda smap, merged, upd_has, kill_tex, local, new, pose, tick,
         config: smap,
         [clean, backend]),
        ("associate_texels", zeroed(association.associate_texels),
         [association, backend]),
        # Sparse (F>1) path stages.
        ("associate_sparse", zeroed(sparse_mod.associate_sparse),
         [sparse_mod, backend]),
        ("zbuffer_winners", zeroed(sparse_mod.zbuffer_winners),
         [sparse_mod]),
        ("lifecycle_and_insert",
         lambda smap, killed, new, tick, config: smap,
         [sparse_mod, backend]),
        ("materialize_from_winners",
         zeroed(sparse_mod.materialize_from_winners),
         [sparse_mod, backend]),
    ]

    only = os.environ.get("SF_ABLATE_ONLY")
    if only:
        wanted = set(only.split(","))
        ablations = [a for a in ablations
                     if a[0].strip().split("/")[-1] in wanted]

    for label, stub, mods in ablations:
        name = label.strip().split("/")[-1]  # attr name (label may be
                                             # indented/grouped for display)
        saved = [(m, getattr(m, name)) for m in mods if hasattr(m, name)]
        for m, _ in saved:
            setattr(m, name, stub)
        try:
            dt = timeit(f"- {label}", config)
            print(f"    marginal: {(base-dt)*1000:6.2f} ms", flush=True)
        finally:
            for m, f in saved:
                setattr(m, name, f)


if __name__ == "__main__":
    main()
