#!/bin/bash
# Round-5 queue: fullscale Overthrust resume to the 0.85 gate (VERDICT
# r4 item 2), then the displaced round-4 items — seed sweep at medium
# scale (item 5) and the warm-cache 32-shot setup measurement (item 6).
# The elastic bench (item 1) already ran this round
# (runs/tpu_r5/elastic_scan_official.log).
cd /root/repo || exit 1
mkdir -p runs/tpu_r5
L=runs/tpu_r5

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[q13] relay wedged; attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[q13] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[q13] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[q13] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

step fullscale_resume 10800 python scripts/overthrust_fullscale_ms.py \
  --resume --wall-budget 9000 --rcv-dy 12 --rcv-dx 8 \
  --run-dir runs/overthrust_fullscale_ms

step seed13 3000 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --seed 13 --wall-budget 2300 --run-dir runs/overthrust_medium_seed13

step seed29 3000 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --seed 29 --wall-budget 2300 --run-dir runs/overthrust_medium_seed29

step warm32 4500 python scripts/marmousi_32shot.py auto runs/marmousi_32shot_warm

echo "[q13] DONE $(date +%T)" >> $L/queue.log
