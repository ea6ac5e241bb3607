#!/bin/bash
# Round-5 queue v3: fullscale gate chase — extend the full-band stage by
# 12 iterations (--iters 24 resumes stage 2 at it0=12), then the
# elastic CH sweep + bench warm-up from queue14.
cd /root/repo || exit 1
mkdir -p runs/tpu_r5
L=runs/tpu_r5

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[q15] relay wedged; attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[q15] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[q15] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[q15] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

step fullscale_ext 5400 python scripts/overthrust_fullscale_ms.py \
  --resume --iters 24 --wall-budget 4500 --rcv-dy 12 --rcv-dx 8 \
  --run-dir runs/overthrust_fullscale_ms

step elastic_ch16 2400 env TPUFWI_ESCAN_CH=16 \
  python scripts/bench_elastic_scan.py --engines pallas_scan
step elastic_ch4 2400 env TPUFWI_ESCAN_CH=4 \
  python scripts/bench_elastic_scan.py --engines pallas_scan --skip-grad

step bench 2400 python bench.py

echo "[q15] DONE $(date +%T)" >> $L/queue.log
