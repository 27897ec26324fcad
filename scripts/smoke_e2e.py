"""End-to-end smoke: synthetic sequence through the full pipeline on CPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pytest")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

# The env var alone cannot override the site-registered accelerator backend;
# the config API can (before any backend initializes).
jax.config.update("jax_platforms", "cpu")

import numpy as np

from staticfusion_tpu.config import SFConfig, CameraConfig, FusionConfig
from staticfusion_tpu.io import synthetic
from staticfusion_tpu.pipeline.system import SlamSystem

def main(n_frames=8, dynamic=False):
    config = SFConfig(
        camera=CameraConfig(width=160, height=120),
        fusion=FusionConfig(capacity=1 << 16),
    )
    print("ctf_levels:", config.ctf_levels)
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002], np.float32)
    sphere = None
    if dynamic:
        sphere = synthetic.Sphere(center=np.array([0.3, 0.0, 1.8]),
                                  radius=0.35,
                                  velocity=np.array([-0.03, 0.0, 0.0]))
    frames, gt = synthetic.make_sequence(config, n_frames, twist, sphere=sphere)

    sys_ = SlamSystem(config)
    for i, (rgb, depth_mm, dyn) in enumerate(frames):
        t0 = time.time()
        out = sys_.process(rgb, depth_mm, timestamp=float(i) / 30.0)
        if out is not None:
            sys_.block()
            T = np.asarray(out.T_odometry)
            print(f"frame {i}: {time.time()-t0:.1f}s "
                  f"surfels={int(out.surfel_count)} dense={bool(out.dense)} "
                  f"T_err={np.abs(T - np.asarray(synthetic.se3_exp_np(twist))).max():.5f}"
                  if hasattr(synthetic, 'se3_exp_np') else
                  f"frame {i}: {time.time()-t0:.1f}s surfels={int(out.surfel_count)} dense={bool(out.dense)}")
            if dynamic and i >= 2:
                sp = np.asarray(out.static_prob)
                print(f"   static_prob: dyn={sp[dyn].mean():.3f} stat={sp[~dyn].mean():.3f}")

    ate = sys_.ate(np.arange(n_frames) / 30.0, gt)
    print("ATE RMSE:", ate)
    # per-frame odometry vs gt twist
    from staticfusion_tpu.geometry.se3 import se3_exp
    import jax.numpy as jnp
    dT_gt = np.asarray(se3_exp(jnp.asarray(twist)))
    print("gt dT translation:", dT_gt[:3, 3])
    for i in range(1, min(4, len(sys_.poses))):
        rel = np.linalg.inv(sys_.poses[i - 1]) @ sys_.poses[i]
        print(f"rel {i}: t={rel[:3,3]} (gt {dT_gt[:3,3]})")
    return ate


if __name__ == "__main__":
    dynamic = "--dynamic" in sys.argv
    main(dynamic=dynamic)
