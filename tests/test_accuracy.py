"""Adversarial accuracy gates at QVGA — the committed evidence behind the
north-star claim (BASELINE.md): tracking and segmentation must survive
TUM-walking-grade conditions, not just the friendly synthetic world.

Profiles (io/adversarial.py): Kinect-style axial depth noise + u16-mm
quantization, occlusion shadows, speckle dropout, 10% exposure drift, a
low-texture wall patch, and for walk_xyz an articulated walker covering
30-45% of the frame.  Thresholds come from the measured seed distribution
(scripts/accuracy_bench.py, ACCURACY.md): at 40 frames the F=4 default
config lands at 0.016-0.054 m walk ATE across seeds, F=1 at 0.08-0.11 m;
the paper's reference system reports ~0.09-0.13 m on the real
fr3_walking sequences — the F=4 gate pins the DEFAULT dynamics config
inside the paper band, the F=1 gate pins the fast config at its own
measured band.

Full QVGA resolution (the reference's operating point, README.md:97).
Runs through SlamSystem.process_batch (the production batch path).
"""

import numpy as np
import pytest

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.io import adversarial as adv
from staticfusion_tpu.pipeline.system import SlamSystem

N_FRAMES = 30


def _config(factor):
    return SFConfig(camera=CameraConfig(width=320, height=240),
                    fusion=FusionConfig(capacity=1 << 18,
                                        index_factor=factor))


def _run(profile: str, factor: int = 1, seed: int = 0):
    config = _config(factor)
    frames, gt = adv.make_adversarial_sequence(config, N_FRAMES, profile,
                                               seed=seed)
    slam = SlamSystem(config)
    rgbs = [f[0] for f in frames]
    depths = [f[1] for f in frames]
    dyns = [f[2] for f in frames]
    ts = [i / 30.0 for i in range(N_FRAMES)]
    probs = np.asarray(slam.process_batch(rgbs, depths, ts,
                                          collect_prob=True))
    ious = []
    for i in range(1, N_FRAMES):
        if i >= config.buffer_length and dyns[i].sum() > 50:
            ious.append(adv.dynamic_iou(probs[i - 1], dyns[i], depths[i]))
    ate = slam.ate(np.arange(N_FRAMES) / 30.0, gt)
    return ate, (float(np.mean(ious)) if ious else None)


def test_walk_xyz_ate_and_iou_f1():
    """30-45% articulated dynamic coverage + sensor noise at the fast F=1
    config: tracking must hold within its measured band and segmentation
    must find the walker."""
    ate, iou = _run("walk_xyz", factor=1)
    assert ate < 0.15, f"walk_xyz F=1 ATE {ate:.4f} beyond the band"
    assert iou is not None and iou > 0.25, f"segmentation IoU {iou}"


def test_walk_xyz_ate_and_iou_f4_default():
    """The DEFAULT config (index_factor=4, post_factor=2, lambda_reg=1.2):
    the strongest accuracy claim in the repo.  Round-4 bands (chip, 3
    seeds): 40-frame ATE 0.012-0.013, 30-frame IoU 0.70-0.72; gates carry
    ~4x/0.15 margin for CPU-compile variance.  The paper's fr3_walking
    band is ~0.09-0.13 m — the gate now sits 2.6x inside it."""
    ate, iou = _run("walk_xyz", factor=4)
    assert ate < 0.05, f"walk_xyz F=4 ATE {ate:.4f} beyond the round-4 band"
    assert iou is not None and iou > 0.55, f"segmentation IoU {iou}"


def test_vga_routed_fusion_adversarial():
    """The VGA headline config (res_factor=1, F=1, route auto->2): routed
    fusion — native-VGA solver over a QVGA-grid map fuse — must hold its
    measured band on the adversarial walker world.  Round-5 chip A/B
    (ACC_r5_vga_*.json, 100 frames, 3 seeds): routed ATE 0.016-0.022 /
    IoU 0.72-0.77 vs full-VGA-grid ATE 0.21-0.23 / IoU 0.29-0.33 — the
    routed default is both 1.9x faster AND ~10x more accurate, so this
    gate pins the shipped mode (generous margins for CPU compile
    variance and the short window)."""
    config = SFConfig(camera=CameraConfig(width=640, height=480),
                      fusion=FusionConfig(capacity=1 << 20, index_factor=1))
    n = 16
    frames, gt = adv.make_adversarial_sequence(config, n, "walk_xyz",
                                               seed=0)
    slam = SlamSystem(config)
    rgbs = [f[0] for f in frames]
    depths = [f[1] for f in frames]
    dyns = [f[2] for f in frames]
    ts = [i / 30.0 for i in range(n)]
    probs = np.asarray(slam.process_batch(rgbs, depths, ts,
                                          collect_prob=True))
    ious = []
    for i in range(1, n):
        if i >= config.buffer_length and dyns[i].sum() > 50:
            ious.append(adv.dynamic_iou(probs[i - 1], dyns[i], depths[i]))
    ate = slam.ate(np.arange(n) / 30.0, gt)
    assert config.fusion.route_factor == 0  # auto: QVGA-capped fuse grid
    assert ate < 0.1, f"VGA routed ATE {ate:.4f} beyond the measured band"
    assert ious and float(np.mean(ious)) > 0.35, \
        f"VGA routed IoU {np.mean(ious) if ious else None}"


def test_fast_rotation_ate():
    """~1.7 deg/frame yaw with sensor noise: the regime where
    large-inter-frame-motion warp error shows up first."""
    ate, _ = _run("fast_rot")
    assert ate < 0.02, f"fast_rot ATE {ate:.4f}"


def test_static_noisy_ate():
    """No dynamics, full sensor model: quantization/noise floor."""
    ate, _ = _run("static")
    assert ate < 0.02, f"static ATE {ate:.4f}"
