#!/bin/bash
# Round-3 TPU queue 7b: elastic3d full-scale retry (after the RingSpec
# 1D-flatten fix) + the P1 32-shot spec run on the snapshot engine.
# Run ALONE on the chip. Logs to runs/tpu_queue7/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_queue7
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue7/queue.log
  timeout 5400 "$@" > "runs/tpu_queue7/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue7/queue.log
}

run elastic3d_96   env TPUFWI_BENCHE3D_NY=96 TPUFWI_BENCHE3D_NZ=96 TPUFWI_BENCHE3D_NX=192 TPUFWI_BENCHE3D_NT=200 python scripts/bench_elastic3d.py
run p1_32shot_snap python scripts/marmousi_32shot.py pallas_scansnap runs/marmousi_32shot_snap
echo "QUEUE7B DONE $(date -u)" | tee -a runs/tpu_queue7/queue.log
