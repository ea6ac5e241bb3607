#!/bin/bash
# Phase-2 TPU measurement queue (runs after tpu_queue.sh drains):
#   1. 3D fused2 attribution (sys.path fix landed)
#   2. official bench at CH=4-unrolled vs the CH=16 default (the 06:01 run
#      measured 3.205 at CH=16 vs 3.56 recorded at CH=4 — decide the
#      shipped default on data, noise band is +-10-20% so use both)
#   3. physics-engine throughput survey (fused-kernel triage, ROADMAP 17)
# Usage: bash scripts/tpu_queue2.sh [logdir]   (default runs/tpu_queue2)
cd "$(dirname "$0")/.."
LOG=${1:-runs/tpu_queue2}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "== $name ($(date -u +%H:%M:%S)) =="
  if timeout "$to" "$@" >"$LOG/$name.log" 2>&1; then
    echo "   ok: $(tail -1 "$LOG/$name.log")"
  else
    echo "   FAILED rc=$? (see $LOG/$name.log)"
  fi
}

if ! timeout 600 python - <<'EOF' >"$LOG/probe.log" 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print("probe ok", float((x @ x)[0, 0]), jax.devices())
EOF
then
  echo "probe FAILED — relay down, aborting"; exit 1
fi
echo "probe ok"

step attrib_3d 5400 python scripts/attrib_3d_fused2.py
step bench_ch4 5400 env TPUFWI_SCANRES_CH=4 TPUFWI_SCANRES_UNROLL=1 python bench.py
step bench_ch16_again 5400 python bench.py
step bench_engines 7200 python scripts/bench_physics_engines.py

echo "queue2 done ($(date -u +%H:%M:%S)); logs in $LOG/"
