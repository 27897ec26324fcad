"""Pre-render adversarial sequences into the npz cache (host NumPy only).

Rendering costs ~3 s/frame at QVGA (4x that at VGA); accuracy sweeps hit
the cache, so measurement runs pay only chip time.  Usage:

  python scripts/render_cache.py profile:frames:seed[:res_factor] ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from staticfusion_tpu.config import CameraConfig, SFConfig
    from staticfusion_tpu.io import adversarial as adv

    cache = os.environ.get("SF_ADV_CACHE", "/tmp/sf_adv_cache")
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        profile, n, seed = parts[0], int(parts[1]), int(parts[2])
        rf = int(parts[3]) if len(parts) > 3 else 2
        cfg = SFConfig(camera=CameraConfig(width=640 // rf, height=480 // rf))
        t0 = time.time()
        adv.make_adversarial_sequence(cfg, n, profile, seed=seed,
                                      cache_dir=cache)
        print(f"{spec}: {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
