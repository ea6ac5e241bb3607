#!/bin/bash
# Nightly (full) test suite, chunked into fresh interpreter processes.
#
# Why chunked: running all 268 tests in ONE process segfaults this
# sandbox's XLA:CPU compiler at a reproducible suite position (~item
# 200, inside backend_compile_and_load; /tmp/full_suite{2,3,4}.log,
# round 5) — with 124 GB free RAM, cache writes disabled, and every
# individual chunk green in a fresh process. The fast lane
# (`pytest -m "not slow"`, 168 tests) is unaffected. Until the
# accumulation bug in the toolchain is found, the nightly contract is
# per-chunk process isolation — same tests, same assertions.
set -u
cd "$(dirname "$0")/.." || exit 1
rc=0
for pat in 'tests/test_[a-e]*.py' 'tests/test_[f-r]*.py' \
           'tests/test_[s-z]*.py'; do
  files=$(ls $pat 2>/dev/null)
  [ -z "$files" ] && continue
  echo "=== chunk: $pat ==="
  python -m pytest $files -q "$@" || rc=1
done
exit $rc
