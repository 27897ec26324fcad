"""End-to-end CLI app test: synthetic dataset export -> run_sequence ->
trajectory/PLY/metrics artifacts.

Pins the user-facing surface the reference exposes through its three mains
(StaticFusion-datasets.cpp etc.): dataset ingest, per-frame loop, trajectory
export, map export. Shapes (160x120 via --res-factor 4) match the rest of
the suite so the persistent compile cache is shared.
"""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfdata"))
    argv = sys.argv
    sys.argv = ["make_synthetic_dataset.py", out, "--frames", "8"]
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scripts.make_synthetic_dataset import main
        main()
    finally:
        sys.argv = argv
    return out


def test_run_sequence_end_to_end(dataset_dir, tmp_path):
    from apps.run_sequence import main

    traj = str(tmp_path / "traj.txt")
    ply = str(tmp_path / "map.ply")
    html = str(tmp_path / "map.html")
    metrics = str(tmp_path / "metrics.jsonl")
    # --conf-threshold 0: a 6-frame run hasn't accumulated enough log-odds
    # merges to cross the 0.25 default (the reference exposes the same cut
    # as a GUI slider and saves empty-ish maps early in a scan too).
    main([dataset_dir, "--res-factor", "4", "--max-frames", "6",
          "--depth-scale", "5000",  # the exporter writes TUM-convention PNGs
          "--out", traj, "--ply", ply, "--html", html, "--metrics", metrics,
          "--gt", "groundtruth.txt", "--conf-threshold", "0"])

    lines = [l for l in open(traj).read().splitlines() if l.strip()]
    assert len(lines) >= 4  # poses for frames 1..5 (frame 0 seeds bootstrap)
    assert all(len(l.split()) == 8 for l in lines)  # t tx ty tz qx qy qz qw

    assert os.path.getsize(ply) > 1000
    head = open(ply, "rb").read(64)
    assert head.startswith(b"ply")

    # Web viewer: one self-contained page with embedded map + both
    # trajectory polylines (estimated + GT).
    page = open(html).read()
    assert "<canvas" in page and '"trajs": [{' in page
    assert page.count('"pts"') == 2

    rows = [json.loads(l) for l in open(metrics).read().splitlines()]
    assert any("surfels" in r for r in rows)
    ate_rows = [r for r in rows if "ate_rmse" in r]
    assert ate_rows and ate_rows[-1]["ate_rmse"] < 0.05


def test_run_sequence_loop_closure_flag(dataset_dir, tmp_path):
    """--loop-closure must run the same sequence without error (too short
    to close a loop; the keyframe machinery just engages)."""
    from apps.run_sequence import main

    traj = str(tmp_path / "traj_lc.txt")
    main([dataset_dir, "--res-factor", "4", "--max-frames", "4",
          "--depth-scale", "5000", "--out", traj, "--loop-closure"])
    assert os.path.exists(traj)


def test_run_sequence_rawlog_end_to_end(tmp_path):
    """run_sequence consumes an MRPT-style rawlog: the 180-degree stored
    orientation, rotateByZ GT anchoring, and the rotateByZ export
    post-multiplication must cancel so ATE against RAW TUM ground truth is
    small (Utils/Datasets.cpp:58-60,176-193,225,257)."""
    import jax.numpy as jnp

    from apps.run_sequence import main
    from staticfusion_tpu.config import CameraConfig, SFConfig
    from staticfusion_tpu.io import rawlog, synthetic

    # Render at sensor-native VGA; the app's --res-factor 4 downsamples to
    # the 160x120 the rest of the suite compiles for (FOV-derived
    # intrinsics scale consistently with resolution).
    cfg = SFConfig(camera=CameraConfig(width=640, height=480))
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, gt = synthetic.make_sequence(cfg, 8, twist)
    ts = [1341840000.0 + i / 30.0 for i in range(8)]
    path = str(tmp_path / "seq.rawlog")
    rawlog.write_rawlog(path, [(r, d / 1000.0) for r, d, _ in frames], ts)
    with open(tmp_path / "groundtruth.txt", "w") as f:
        from staticfusion_tpu.io.trajectory import pose_to_tum_line

        f.write("# fixture\n")
        for t, p in zip(ts, gt):
            f.write(pose_to_tum_line(t, p) + "\n")

    traj = str(tmp_path / "traj.txt")
    main([path, "--res-factor", "4", "--out", traj])
    from staticfusion_tpu.io.trajectory import (ate_rmse,
                                                read_tum_trajectory)

    t_est, p_est = read_tum_trajectory(traj)
    ate = ate_rmse(t_est, p_est, np.asarray(ts), gt)
    assert ate < 0.02, f"rawlog-run ATE {ate} vs raw GT"


def test_run_sequence_live_view(dataset_dir, tmp_path, capsys):
    """--live serves the reference's GUI panels during the run
    (Utils/GUI.h:87-99); the view stays up with the final frame after the
    run ends."""
    import re
    import urllib.request

    from apps.run_sequence import main

    traj = str(tmp_path / "traj_live.txt")
    main([dataset_dir, "--res-factor", "4", "--max-frames", "4",
          "--depth-scale", "5000", "--out", traj,
          "--live", "0", "--live-every", "1"])
    m = re.search(r"live view: (http://[\d.:]+)/",
                  capsys.readouterr().out)
    assert m, "app must print the live-view URL"
    met = json.loads(urllib.request.urlopen(
        m.group(1) + "/metrics.json", timeout=5).read())
    assert met.get("frame", -1) >= 1 and "surfels" in met
    png = urllib.request.urlopen(m.group(1) + "/frame.png",
                                 timeout=5).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
