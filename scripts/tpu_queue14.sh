#!/bin/bash
# Round-5 queue v2 (after tpu_queue13): elastic whole-scan chunk-size
# sweep (TPUFWI_ESCAN_CH — the official row used the default CH=8) and
# a bench.py warm-up so the driver's end-of-round bench hits a hot
# .jax_cache.
cd /root/repo || exit 1
mkdir -p runs/tpu_r5
L=runs/tpu_r5

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[q14] relay wedged; attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[q14] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[q14] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[q14] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

# bash keeps a VAR=x function-call assignment set after the call —
# use env(1) so each step's CH is scoped to its own process
step elastic_ch16 2400 env TPUFWI_ESCAN_CH=16 \
  python scripts/bench_elastic_scan.py --engines pallas_scan
step elastic_ch4 2400 env TPUFWI_ESCAN_CH=4 \
  python scripts/bench_elastic_scan.py --engines pallas_scan --skip-grad

step bench 2400 python bench.py

echo "[q14] DONE $(date +%T)" >> $L/queue.log
