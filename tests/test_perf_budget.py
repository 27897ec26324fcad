"""CPU-runnable perf-regression gate on the compiled SLAM step.

Round 3 shipped an unbenched refactor of the warp splat + fuse paths that
cut the real-chip default config from 125 fps to 27 fps while every
functional test stayed green.  This gate makes that class of failure
unshippable without touching a TPU: it pins XLA's post-optimization cost
metrics of the jitted `slam_step` — flops, bytes accessed, scatter/gather
index-space rows, and indexed-op count (utils/perf.py) — against budgets
committed alongside the code.  The metrics are computed on the CPU backend
(same HLO-level accounting the roofline in bench.py uses).  The indexed
metrics are the discriminating ones: the TPU's per-index serial scatter/
gather cost is the step's binding roofline leg (utils/perf.py docstring),
and the regression that motivated this gate blew them 5-7x on CPU HLO
while bytes barely moved:

  config  metric        budgeted-good   regressed(f48627e)
  F=1     scatter_rows      358k            1.70M
  F=1     gather_rows       525k            3.49M
  F=1     indexed_ops       19              112
  F=4     gather_rows       1.34M           8.04M
  F=4     indexed_ops       28              135

Budgets carry ~30-35% headroom over the measured-good baseline so
legitimate small changes pass.  If this test fails, DO NOT raise the
budget to make it pass: run `python bench.py` (and SF_BENCH_FACTOR=4) on
the real chip first, and only re-baseline here together with a re-measured
PERF.md entry at the same commit.
"""

import json

import jax
import jax.numpy as jnp
import pytest

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.pipeline.state import init_state
from staticfusion_tpu.pipeline.step import Frame, slam_step
from staticfusion_tpu.utils import perf

# Measured on the CPU backend, re-baselined after the round-4
# surfel-major writeback (129.0 fps F=1 / 44.7 fps F=4 / 48.8 fps VGA
# routed on the real chip the same session): F=1 flops 1.77e9, bytes
# 4.27e9, scatter 281k, gather 787k, ops 20 (the writeback trades 77k
# scatter rows for 262k cheaper gather rows — scatter rows pay a
# tile-RMW, measured 3x a gather row); F=4 flops 3.72e9, bytes 5.42e9,
# scatter 1.13M, gather 1.34M, ops 28.  Keys must stay within budget;
# re-baseline only with a fresh real-chip bench.
BUDGETS = {
    1: {"bytes_accessed": 5.6e9, "scatter_rows": 370_000,
        "gather_rows": 1_050_000, "indexed_ops": 26, "flops": 2.3e9},
    4: {"bytes_accessed": 7.1e9, "scatter_rows": 1_500_000,
        "gather_rows": 1_800_000, "indexed_ops": 36, "flops": 4.9e9},
}


def _step_costs(factor: int):
    cfg = SFConfig(camera=CameraConfig(width=320, height=240),
                   fusion=FusionConfig(capacity=1 << 18,
                                       index_factor=factor))
    state = init_state(cfg)
    frame = Frame(rgb=jnp.zeros((240, 320, 3), jnp.uint8),
                  depth_mm=jnp.zeros((240, 320), jnp.uint16))
    return perf.xla_costs(lambda st, fr: slam_step(st, fr, cfg),
                          state, frame)


@pytest.mark.parametrize("factor", [1, 4])
def test_step_cost_within_budget(factor):
    costs = _step_costs(factor)
    budget = BUDGETS[factor]
    over = {k: (costs[k], budget[k]) for k in budget
            if costs[k] > budget[k]}
    assert not over, (
        f"compiled slam_step (QVGA, index_factor={factor}) exceeds its "
        f"committed cost budget: "
        + ", ".join(f"{k}={got:.4g} > budget {b:.4g}"
                    for k, (got, b) in over.items())
        + f". Full costs: {json.dumps(costs)}. Do NOT raise the budget "
        "without re-benching on the real chip (see module docstring).")
