#!/bin/bash
# Poll the axon relay; when it answers, run the measurement queue once.
# Probe is a separate short-lived process (timeout 150 s) — when the relay
# is down it hangs at interpreter init and gets killed, which is safe (no
# compile in flight). Poll period 600 s.
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_queue
for i in $(seq 1 120); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)); print('probe ok', float((x@x)[0,0]))" \
      >runs/tpu_queue/watch_probe.log 2>&1; then
    echo "relay up at $(date -u) — running queue" | tee runs/tpu_queue/watch.log
    bash scripts/tpu_queue.sh 2>&1 | tee -a runs/tpu_queue/watch.log
    exit 0
  fi
  echo "probe $i down $(date -u +%H:%M:%S)"
  sleep 600
done
echo "gave up after 60 probes"
exit 1
