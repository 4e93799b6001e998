#!/bin/bash
# K-sweep for the per-voice farm update (VERDICT r4 #2): one K per
# PROCESS — retracing a second K next to the live V=128 state OOMs the
# chip (the r04 exp_update_f32.log traceback).  Each process also times
# the full rebuild, so the "Nx cheaper" ratio is same-window.
# Usage: bash benchmarks/run_update_sweep.sh [results_dir]
set -u
out=${1:-benchmarks/results/r05}
mkdir -p "$out"
for dt in f32 bf16; do
  flag=""
  [ "$dt" = bf16 ] && flag="--bf16"
  for k in 1 8 32 128; do
    log="$out/exp_update_${dt}_k${k}.log"
    echo "=== V=128 dtype=$dt K=$k -> $log ==="
    timeout 3000 python -m benchmarks.exp_update --voices 128 --k "$k" $flag \
      2>&1 | tee "$log" | tail -4
    sleep 20
  done
done
