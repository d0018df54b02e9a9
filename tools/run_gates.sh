#!/usr/bin/env bash
# Full local validation: unit specs, t1 smoke, t2 oracle gate, bench.
# Usage: tools/run_gates.sh   (from /root/repo)
set -euo pipefail

echo "== 1/4 unit + behavioral specs"
sbt -batch test 2>&1 | grep -E '\*\*\*|Tests:' | tail -2

echo "== 2/4 t1 smoke (flagship entry, sf0.001)"
sbt -batch "runMain graft.tools.Smoke" 2>&1 | grep -E 'rows=' | tail -1

echo "== 3/4 t2 correctness (sf0.01 vs DuckDB oracle)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft-gates" \
  2>&1 | grep -E '\[verify\].*failed' || true
python3 tools/check_oracle.py /tmp/graft-gates /root/testdata/sf0.01 | tail -1

echo "== 4/4 bench (sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>&1 | grep -oE '"value":[0-9.]+' | tail -1
