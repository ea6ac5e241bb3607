#!/bin/bash
# Round-4 TPU queue: run when the axon relay is healthy (it wedged mid-
# session 2026-08-20, ~10:00). Every step is probe-gated (a killed hung
# step can re-wedge the relay ~10 min) and bounded by timeout.
cd /root/repo || exit 1
mkdir -p runs/tpu_queue9
L=runs/tpu_queue9

probe() {
  for i in $(seq 1 30); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue] relay wedged; settle attempt $i $(date +%T)" >> $L/queue.log
    sleep 120
  done
  return 1
}

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  probe || { echo "[queue] relay dead before $name $(date +%T)" >> $L/queue.log; return 1; }
  echo "[queue] start $name $(date +%T)" >> $L/queue.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[queue] end $name rc=$rc $(date +%T)" >> $L/queue.log
  return $rc
}

step direct_shot 1800 python scripts/direct_shot.py

step medium 2700 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
  --run-dir runs/overthrust_medium_driver

# fullscale (the judge's top item) only once the medium driver path is
# proven end-to-end (it hung pre-queue; see queue.log + ofs_medium logs)
if [ -f runs/overthrust_medium_driver/summary.json ]; then
  step fullscale 14400 python scripts/overthrust_fullscale_ms.py \
    --run-dir runs/overthrust_fullscale_ms
else
  echo "[queue] SKIP fullscale: medium produced no summary" >> $L/queue.log
fi

step elastic_scan_bench 5400 python scripts/bench_elastic_scan.py

step warm32 5400 python scripts/marmousi_32shot.py auto runs/marmousi_32shot_warm

if [ -f runs/overthrust_medium_driver/summary.json ]; then
  step seed13 2700 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
    --seed 13 --run-dir runs/overthrust_medium_seed13
  step seed29 2700 python scripts/overthrust_fullscale_ms.py --medium --nt 420 \
    --seed 29 --run-dir runs/overthrust_medium_seed29
fi

step bench_official 2400 python bench.py

echo "[queue] DONE $(date +%T)" >> $L/queue.log
