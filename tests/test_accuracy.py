"""Adversarial accuracy gates at QVGA — the committed evidence behind the
north-star claim (BASELINE.md): tracking and segmentation must survive
TUM-walking-grade conditions, not just the friendly synthetic world.

Profiles (io/adversarial.py): Kinect-style axial depth noise + u16-mm
quantization, occlusion shadows, speckle dropout, 10% exposure drift, a
low-texture wall patch, and for walk_xyz an articulated walker covering
30-45% of the frame.  Thresholds are set from the measured distribution
across seeds/factors (scripts/accuracy_bench.py, ACCURACY.md): walk-grade
ATE lands at 0.015-0.105 m over 40 frames; the paper's reference system
reports ~0.09-0.13 m on the real fr3_walking sequences.

Full QVGA resolution (the reference's operating point, README.md:97); one
compiled program serves all three profiles.
"""

import numpy as np
import pytest

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.io import adversarial as adv
from staticfusion_tpu.pipeline.system import SlamSystem

CONFIG = SFConfig(camera=CameraConfig(width=320, height=240),
                  fusion=FusionConfig(capacity=1 << 18))
N_FRAMES = 30


def _run(profile: str, seed: int = 0):
    frames, gt = adv.make_adversarial_sequence(CONFIG, N_FRAMES, profile,
                                               seed=seed)
    slam = SlamSystem(CONFIG)
    ious = []
    for i, (rgb, depth_mm, dyn) in enumerate(frames):
        out = slam.process(rgb, depth_mm, i / 30.0)
        if (out is not None and i >= CONFIG.buffer_length
                and dyn.sum() > 50):
            ious.append(adv.dynamic_iou(np.asarray(out.static_prob), dyn,
                                        depth_mm))
    ate = slam.ate(np.arange(N_FRAMES) / 30.0, gt)
    return ate, (float(np.mean(ious)) if ious else None)


def test_walk_xyz_ate_and_iou():
    """30-45% articulated dynamic coverage + sensor noise: tracking must
    hold within the walking-grade band and segmentation must find the
    walker."""
    ate, iou = _run("walk_xyz")
    assert ate < 0.15, f"walk_xyz ATE {ate:.4f} beyond the walking band"
    assert iou is not None and iou > 0.25, f"segmentation IoU {iou}"


def test_fast_rotation_ate():
    """~1.7 deg/frame yaw with sensor noise: the regime where
    large-inter-frame-motion warp error shows up first."""
    ate, _ = _run("fast_rot")
    assert ate < 0.02, f"fast_rot ATE {ate:.4f}"


def test_static_noisy_ate():
    """No dynamics, full sensor model: quantization/noise floor."""
    ate, _ = _run("static")
    assert ate < 0.02, f"static ATE {ate:.4f}"
