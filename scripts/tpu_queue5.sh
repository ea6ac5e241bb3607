#!/bin/bash
# Round-3 TPU measurement queue. Run ALONE on the chip (the relay
# serializes every jax-importing process — see .claude/skills/verify).
# Each job logs to runs/tpu_queue5/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_queue5
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue5/queue.log
  timeout 5400 "$@" > "runs/tpu_queue5/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a runs/tpu_queue5/queue.log
}

run exp_2d_scanres   python scripts/exp_2d_scanres.py
run scanres_prec     python scripts/exp_scanres_prec.py
run bench_official   python bench.py
run bench_pml20      python -c "from tpufwi.bench.bench_fwi import bench_fwd_adjoint; import json; print(json.dumps(bench_fwd_adjoint(pml=20)))"
run sharded3d_hw     python scripts/check_sharded3d_hw.py
run elastic3d_bench  python scripts/bench_elastic3d.py
run fullscale3d      python scripts/bench_3d_fullscale.py
echo "QUEUE DONE $(date -u)" | tee -a runs/tpu_queue5/queue.log
