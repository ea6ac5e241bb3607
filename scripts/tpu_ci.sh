#!/bin/bash
# Hardware CI lane (docs/ROADMAP.md item 11): the compiled-kernel test
# subset on the real TPU. test_kstep / test_scanres self-select compiled
# mode when the backend is not CPU; test_tpu_smoke runs only under
# TPUFWI_TEST_PLATFORM=axon and covers the fused elastic / fused-3D
# engines whose CPU coverage is interpret-mode only.
#
# One TPU process at a time (the relay serializes) — run this alone.
cd "$(dirname "$0")/.."
export TPUFWI_TEST_PLATFORM=axon
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
exec python -m pytest tests/test_tpu_smoke.py tests/test_kstep.py \
  tests/test_scanres.py -q "$@"
