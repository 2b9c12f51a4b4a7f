#!/bin/bash
# Run the test suite with per-file process isolation.
#
# A single long pytest process accumulates hundreds of XLA CPU compilations
# and sporadically segfaults inside backend_compile_and_load (observed on
# jax 0.8.x CPU after ~250 compiles; each affected test passes standalone).
# One process per test file keeps every process well under the threshold and
# bounds the blast radius of any crash.
set -u
FAILED=0
declare -a BAD=()
for f in tests/test_*.py; do
  echo "=== $f"
  timeout 2400 python -m pytest "$f" -q --no-header 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    FAILED=1
    BAD+=("$f (rc=$rc)")
  fi
done
if [ "$FAILED" -ne 0 ]; then
  echo "FAILED FILES:"; printf ' %s\n' "${BAD[@]}"
  exit 1
fi
echo "ALL FILES GREEN"
