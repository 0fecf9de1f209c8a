#!/usr/bin/env bash
# Round close-out gate — run this BEFORE any snapshot/close-out commit.
# (Round 7 died on a snapshot commit made without running any gate: a
# compile error shipped and the driver's whole correctness/bench row
# went red. This script makes the CLAUDE.md gate list one command.)
#
# Usage: scripts/gate.sh [prev-round-tip-ref]
#   prev-round-tip-ref: git ref whose bench.json is the regression
#   baseline (default: the most recent "round N: verdict" commit).
set -euo pipefail
cd "$(dirname "$0")/.."

# `|| true` keeps set -e/pipefail from silently aborting when no commit
# subject contains ': verdict' (first round, shallow/rebased history) or
# when grep -m1 SIGPIPEs a long git log.
PREV_REF="${1:-$(git log --format='%H %s' | grep -m1 ': verdict' | cut -d' ' -f1 || true)}"
if [ -z "$PREV_REF" ]; then
  echo "gate: no previous ': verdict' commit found — pass the baseline ref explicitly: scripts/gate.sh <ref>" >&2
  exit 1
fi
echo "== gate: compile =="
sbt -batch compile

echo "== gate: test =="
sbt -batch test

echo "== gate: verify + oracle (sf0.01) =="
rm -rf /tmp/verify_out
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

echo "== gate: bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench"

echo "== gate: bench regression vs $PREV_REF =="
git show "$PREV_REF:bench.json" > /tmp/bench_prev.json
python3 scripts/bench_compare.py /tmp/bench_prev.json bench.json

echo "== gate: ALL GREEN — safe to commit the snapshot =="
