#!/bin/bash
# Round-3 TPU measurement queue 6 (after the tape/ring layout fixes).
# Run ALONE on the chip (the relay serializes every jax-importing
# process — see .claude/skills/verify). Logs to runs/tpu_queue6/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_queue6
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue6/queue.log
  timeout 5400 "$@" > "runs/tpu_queue6/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue6/queue.log
}

# R4: full-scale 3D gradient, fixed x-slab transpose + delay-line tape
run fullscale3d      python scripts/bench_3d_fullscale.py
# R7: elastic3d TPU row at the resized grid, then the original scale
# (the RingSpec layout fix removes the 64x padding that OOM'd it)
run elastic3d_bench  python scripts/bench_elastic3d.py
run elastic3d_96     env TPUFWI_BENCHE3D_NY=96 TPUFWI_BENCHE3D_NZ=96 TPUFWI_BENCHE3D_NX=192 TPUFWI_BENCHE3D_NT=200 python scripts/bench_elastic3d.py
# R3: confirm/refute the P1_strips_default 9.2 us/step anomaly (run b
# measured P1_default FASTER than P0-leapfrog-only, outside any noise
# band; one more independent capture decides)
run exp_2d_scanres   python scripts/exp_2d_scanres.py
# R3: second capture of the default-precision full engine number
run scanres_prec     python scripts/exp_scanres_prec.py
echo "QUEUE6 DONE $(date -u)" | tee -a runs/tpu_queue6/queue.log
