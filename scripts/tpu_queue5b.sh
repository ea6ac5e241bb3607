#!/bin/bash
# Follow-up after tpu_queue5: re-run the precision probes with the
# Mosaic-supported precision set (HIGH does not lower).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_queue5
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue5/queue.log
  timeout 5400 "$@" > "runs/tpu_queue5/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue5/queue.log
}
run exp_2d_scanres_b python scripts/exp_2d_scanres.py
run scanres_prec_b   python scripts/exp_scanres_prec.py
echo "QUEUE5B DONE $(date -u)" | tee -a runs/tpu_queue5/queue.log
