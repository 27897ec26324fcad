"""Multi-process (multi-host) integration: the GSPMD-sharded step must run
SPMD across real process boundaries — collectives over Gloo, per-process
addressable shards — and agree with the single-process run.

The reference is single-process by construction (SURVEY.md section 2.5); this is
the net-new runtime layer (parallel/distributed.py).  The test spawns real
worker subprocesses (2 procs x 4 CPU devices vs 1 proc x 8 devices, same
(2, 4) mesh) via scripts/run_multihost.py.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multihost.py")
FRAMES = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse_poses(text: str):
    poses = {}
    for line in text.splitlines():
        m = re.match(r"POSE (\d+) (.*)", line)
        if m:
            poses[int(m.group(1))] = np.asarray(
                [float(v) for v in m.group(2).split()]).reshape(4, 4)
    return poses


def _run_workers(num_processes: int, devices_per_process: int):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets cpu itself
    base = [sys.executable, SCRIPT, "--coordinator", coord,
            "--num-processes", str(num_processes),
            "--devices-per-process", str(devices_per_process),
            "--n-pix", "2", "--n-map", "4", "--frames", str(FRAMES)]
    procs = [subprocess.Popen(base + ["--process-id", str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(num_processes)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs



def test_two_process_spmd_matches_single_process():
    two = _run_workers(2, 4)
    one = _run_workers(1, 8)

    p0, p1 = _parse_poses(two[0]), _parse_poses(two[1])
    ref = _parse_poses(one[0])
    assert len(p0) == FRAMES - 1 and len(ref) == FRAMES - 1

    for k in ref:
        # Both processes of the 2-proc run fetch the same replicated
        # output arrays -> identical.
        np.testing.assert_allclose(p0[k], p1[k], atol=1e-6)
        # Cross-process (Gloo) vs single-process collectives may reduce in
        # different order -> tiny fp differences only.
        np.testing.assert_allclose(p0[k], ref[k], atol=1e-4)

    assert "global devices" in two[0]
    assert "8 global" in two[0] and "4 local" in two[0]
