"""Round-5 evidence suite, grouped so one process amortizes compiles.

The axon (remote-TPU) backend cannot serialize its compile cache, so every
fresh process pays the full multi-minute compile set again.  This runner
keeps each config GROUP in one process: all seeds/modes that share jit
shapes reuse the in-memory executables, so the compile set is paid once
per group instead of once per run.

  python scripts/r5_suite.py corridor   # ON/OFF x 3 seeds (+1500f long run)
  python scripts/r5_suite.py corrlam    # corridor at reference lambda 0.35
  python scripts/r5_suite.py vga        # VGA routed vs full, walk + corridor
  python scripts/r5_suite.py walkvar    # lambda sweep on the walk_var world
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accuracy_bench_import import run_one  # noqa: E402  (shim below)


def emit(path, row):
    print(json.dumps(row), flush=True)
    with open(path, "w") as f:
        json.dump([row], f, indent=2)


def corridor():
    for s in (0, 1, 2):
        on = f"ACC_r5_corridor_on_s{s}.json"
        if not os.path.exists(on):
            emit(on, run_one("corridor_loop", 4, 300, seed=s, loop=True, capacity=1 << 18))
        off = f"ACC_r5_corridor_off_s{s}.json"
        if not os.path.exists(off):
            emit(off, run_one("corridor_loop", 4, 300, seed=s, loop=False, capacity=1 << 18))
    long = "ACC_r5_corridor1500_on_s0.json"
    if not os.path.exists(long):
        emit(long, run_one("corridor_loop", 4, 1500, seed=0, loop=True, capacity=1 << 18))
    longoff = "ACC_r5_corridor1500_off_s0.json"
    if not os.path.exists(longoff):
        emit(longoff, run_one("corridor_loop", 4, 1500, seed=0, loop=False, capacity=1 << 18))


def corrlam():
    for s in (0, 1, 2):
        emit(f"SEG_r5_corr_lr0.35_s{s}.json",
             run_one("corridor_loop", 4, 300, seed=s, lambda_reg=0.35, capacity=1 << 18))


def vga():
    for s in (0, 1, 2):
        emit(f"ACC_r5_vga_auto_s{s}.json",
             run_one("walk_xyz", 1, 100, res_factor=1, seed=s))
    for s in (0, 1, 2):
        emit(f"ACC_r5_vga_full_s{s}.json",
             run_one("walk_xyz", 1, 100, res_factor=1, seed=s,
                     route_factor=1))
    emit("ACC_r5_vga_corridor_auto.json",
         run_one("corridor_loop", 1, 200, res_factor=1, seed=0))
    emit("ACC_r5_vga_corridor_full.json",
         run_one("corridor_loop", 1, 200, res_factor=1, seed=0,
                 route_factor=1))


def walkvar():
    # One process per lambda would still recompile (lambda is baked into
    # the jitted step); group by lambda inside this one process and let
    # the small adaptive walk tiers keep each set cheap (round-4 sweep
    # behavior).
    for lam in (0.35, 0.9, 1.2, 1.6):
        for s in (0, 1, 2):
            emit(f"SEG_r5_var_lr{lam}_s{s}.json",
                 run_one("walk_var", 4, 40, seed=s, lambda_reg=lam,
                         fixed_tiers=False))


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    {"corridor": corridor, "corrlam": corrlam, "vga": vga,
     "walkvar": walkvar}[sys.argv[1]]()
    print(f"GROUP {sys.argv[1]} DONE", flush=True)
