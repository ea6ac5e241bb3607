#!/bin/bash
# Serialized TPU measurement queue — run the pending hardware measurements
# back to back the moment the axon relay is healthy again. One TPU process
# at a time (the relay serializes; concurrent clients can wedge it —
# docs/VERIFY notes), each step bounded by a timeout, failures logged but
# non-fatal so later steps still run.
#
# Usage: bash scripts/tpu_queue.sh [logdir]   (default runs/tpu_queue)
cd "$(dirname "$0")/.."
LOG=${1:-runs/tpu_queue}
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

# 0. probe: is the relay alive at all? abort the queue if not.
if ! timeout 600 python - <<'EOF' >"$LOG/probe.log" 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print("probe ok", float((x @ x)[0, 0]), jax.devices())
EOF
then
  echo "probe FAILED — relay still down, aborting queue"; exit 1
fi
echo "probe ok"

# 1. CH=16 scanres on hardware + the official graded benchmark
step bench_ch16 5400 python bench.py

# 2. 3D fused2 attribution (merged-only / corr-only / by=24 full step)
step attrib_3d 5400 python scripts/attrib_3d_fused2.py

# 3. fused 3D forward+backward throughput
step bench_3d_bwd 5400 python scripts/bench_3d_bwd.py

# 4. Overthrust FWI on the fused 3D engine -> runs/overthrust_demo_fused
step overthrust_fused 7200 python scripts/overthrust_demo.py --fused

# 5. hardware CI lane (compiled-kernel test subset)
step tpu_ci 5400 bash scripts/tpu_ci.sh -x

echo "queue done ($(date -u +%H:%M:%S)); logs in $LOG/"
