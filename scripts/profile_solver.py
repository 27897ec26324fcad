"""Floor-corrected internal profiling of run_solver's components.

Each candidate runs K times inside one jit chained through a salt; with
K=32 the ~24 ms axon dispatch floor adds <1 ms per measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.ops.derivatives import (calculate_coords,
                                              calculate_derivatives,
                                              compute_weights)
from staticfusion_tpu.ops.pyramid import build_pyramid
from staticfusion_tpu.ops.warp import WarpedImages, warp_images_gather
from staticfusion_tpu.solver.clustering import cluster_frame
from staticfusion_tpu.solver.irls import build_jacobian, cluster_onehot, solve_irls
from staticfusion_tpu.solver.runsolver import run_solver
from staticfusion_tpu.solver.segmentation import (compute_seg_prior,
                                                  reg_normal_matrix)

K = int(os.environ.get("SF_PROF_K", "32"))


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return x


def timeit(name, fn, *args, n=3):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, acc)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    sync(loop(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(loop(*args))
    print(f"{name:46s} {(time.perf_counter()-t0)/(n*K)*1000:9.3f} ms",
          flush=True)


def main():
    config = SFConfig()
    print("backend:", jax.devices()[0].platform,
          "levels:", config.ctf_levels, flush=True)

    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    frames, _ = synthetic.make_sequence(config, 2, twist)
    intens = lambda rgb: (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                          + 0.114 * rgb[..., 2])
    d0 = jnp.asarray(frames[0][1]) / 1000.0
    i0 = intens(jnp.asarray(frames[0][0]))
    d1 = jnp.asarray(frames[1][1]) / 1000.0
    i1 = intens(jnp.asarray(frames[1][0]))
    pred_pyr = build_pyramid(d0, i0, config)
    cur_pyr = build_pyramid(d1, i1, config)
    twist_old = jnp.zeros((6,))

    timeit("run_solver(total)",
           lambda c, p, t, s: run_solver(c, p, t + s, config),
           cur_pyr, pred_pyr, twist_old)

    timeit("cluster_frame",
           lambda p, s: cluster_frame(
               tuple(lv._replace(depth=lv.depth + s * 0) for lv in p),
               config),
           cur_pyr)

    clustering = cluster_frame(cur_pyr, config)
    reg_ata = reg_normal_matrix(clustering.connectivity,
                                config.solver.lambda_reg)
    fovh = config.camera.fovh
    n_levels = config.ctf_levels

    for level_idx in (0, n_levels - 1):
        image_level = n_levels - 1 - level_idx
        cur = cur_pyr[image_level]
        pred = pred_pyr[image_level]
        labels = clustering.labels[image_level]
        onehot = cluster_onehot(labels)
        rows = cur.depth.shape[0]

        timeit(f"warp_gather L{image_level} ({rows}r)",
               lambda p, c, s: warp_images_gather(
                   p, c.depth + s, jnp.eye(4), fovh), pred, cur)

        warped = warp_images_gather(pred, cur.depth, jnp.eye(4), fovh)

        def one_iter(c, w, oh, s):
            inter = calculate_coords(c, w._replace(depth=w.depth + s * 0))
            deriv = calculate_derivatives(inter, c, w)
            pw = compute_weights(deriv, inter.valid)
            prior = compute_seg_prior(oh, inter.null, deriv.ddt, config)
            sys_ = build_jacobian(inter, deriv, pw, labels, oh, config)
            res = solve_irls(sys_, prior.b_prior, prior, reg_ata, config)
            return res.twist

        timeit(f"full iter (deriv+jac+irls) L{image_level}",
               one_iter, cur, warped, onehot)

        def deriv_only(c, w, oh, s):
            inter = calculate_coords(c, w._replace(depth=w.depth + s * 0))
            deriv = calculate_derivatives(inter, c, w)
            pw = compute_weights(deriv, inter.valid)
            prior = compute_seg_prior(oh, inter.null, deriv.ddt, config)
            sys_ = build_jacobian(inter, deriv, pw, labels, oh, config)
            return sys_.A_cT

        timeit(f"deriv+jac only L{image_level}",
               deriv_only, cur, warped, onehot)

        inter = calculate_coords(cur, warped)
        deriv = calculate_derivatives(inter, cur, warped)
        pw = compute_weights(deriv, inter.valid)
        prior = compute_seg_prior(onehot, inter.null, deriv.ddt, config)
        sys_ = build_jacobian(inter, deriv, pw, labels, onehot, config)

        timeit(f"solve_irls only L{image_level}",
               lambda sy, s: solve_irls(
                   sy._replace(B_c=sy.B_c + s), prior.b_prior, prior,
                   reg_ata, config), sys_)


if __name__ == "__main__":
    main()
