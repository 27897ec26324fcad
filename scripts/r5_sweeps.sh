#!/bin/bash
# Round-5 measurement batches (run sequentially on the one chip):
#   A/B: VGA routed-fusion accuracy A/B (VERDICT r4 #4)
#   C:   lambda_reg robustness sweep on walk_var (VERDICT r4 #5)
#   D:   corridor segmentation at reference lambda (VERDICT r4 #5)
#   E:   1500-frame corridor with loop closure (VERDICT r4 #2 long-horizon)
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_axon \
       JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0 \
       JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
cd /root/repo
AB="stdbuf -oL python scripts/accuracy_bench.py"
run() { echo "=== $* ==="; $AB "$@" 2>&1 | grep -v Platform | tail -2; }

for s in 0 1 2; do
  run --profiles walk_xyz --factors 1 --frames 100 --res-factor 1 --seed $s --json ACC_r5_vga_auto_s$s.json
  run --profiles walk_xyz --factors 1 --frames 100 --res-factor 1 --seed $s --route-factor 1 --json ACC_r5_vga_full_s$s.json
done
run --profiles corridor_loop --factors 1 --frames 200 --res-factor 1 --seed 0 --json ACC_r5_vga_corridor_auto.json
run --profiles corridor_loop --factors 1 --frames 200 --res-factor 1 --seed 0 --route-factor 1 --json ACC_r5_vga_corridor_full.json
for l in 0.35 0.9 1.2 1.6; do
  for s in 0 1 2; do
    run --profiles walk_var --factors 4 --frames 40 --seed $s --lambda-reg $l --json SEG_r5_var_lr${l}_s$s.json
  done
done
for s in 0 1 2; do
  run --profiles corridor_loop --factors 4 --frames 300 --seed $s --lambda-reg 0.35 --json SEG_r5_corr_lr0.35_s$s.json
done
run --profiles corridor_loop --factors 4 --frames 1500 --seed 0 --loop --json ACC_r5_corridor1500_on_s0.json
echo "ALL SWEEPS DONE"
