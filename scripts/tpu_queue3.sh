#!/bin/bash
# Phase-3 TPU queue: 3D merged-kernel pipeline experiments + hardware CI
# re-run with the Mosaic x64 index-map fix.
cd "$(dirname "$0")/.."
LOG=${1:-runs/tpu_queue3}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

step() {
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

step exp_3d_merged 7200 python scripts/exp_3d_merged.py
step tpu_ci 5400 bash scripts/tpu_ci.sh

echo "queue3 done ($(date -u +%H:%M:%S)); logs in $LOG/"
