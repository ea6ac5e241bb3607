#!/bin/bash
# TPU measurement queue 4 (one TPU process at a time — run alone):
#   1. corr-slab cost attribution (slices vs kernels)
#   2. hardware CI lane re-run (validates the recursion-limit / GTOL /
#      retry fixes from commit 020a881)
#   3. physics-engine survey re-run (validates the per-rep input fix for
#      the negative elastic fwd slope)
cd "$(dirname "$0")/.."
LOG=runs/tpu_queue4
mkdir -p "$LOG"

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
}

step merged_prec_default 2400 env TPUFWI_3D_MXU_PRECISION=default \
  python scripts/exp_3d_lap.py merged full
step corr_attrib 4000 python scripts/exp_3d_corr.py
step tpu_ci 7200 bash scripts/tpu_ci.sh
step bench_engines 5400 python scripts/bench_physics_engines.py

echo "queue4 done ($(date -u +%H:%M:%S))" | tee -a "$LOG/queue.log"
