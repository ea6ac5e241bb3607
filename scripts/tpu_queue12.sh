#!/bin/bash
# Round-4 queue v4: elastic grad re-bench (VMEM-diet kernel, cadb4b8)
# promoted ahead of the seed sweep; swapped in for queue11's tail at the
# fullscale_resume boundary.
cd /root/repo || exit 1
mkdir -p runs/tpu_queue12
L=runs/tpu_queue12

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[q12] relay wedged; attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[q12] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[q12] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[q12] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

step elastic_scan 3600 python scripts/bench_elastic_scan.py \
  --engines pallas_scan pallas

step seed13 3000 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --seed 13 --wall-budget 2300 --run-dir runs/overthrust_medium_seed13

step seed29 3000 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --seed 29 --wall-budget 2300 --run-dir runs/overthrust_medium_seed29

step warm32 4500 python scripts/marmousi_32shot.py auto runs/marmousi_32shot_warm

step bench 2400 python bench.py

echo "[q12] DONE $(date +%T)" >> $L/queue.log
