#!/usr/bin/env bash
# Pre-snapshot gate: refuse an end-of-round commit unless the tree compiles
# (main + test). Run from the repo root before ANY snapshot commit:
#
#   tools/preflight.sh            # compile gate only (~60 s)
#   tools/preflight.sh --full     # + full ScalaTest suite (~25 min)
#
# Motivation: round 10 committed a tree whose single compile error zeroed the
# round's entire oracle evidence (CORRECTNESS_r10 = {}). The close discipline
# ("full suite + Verify green at the final commit") is now mechanical, not a
# convention: exit non-zero here means DO NOT COMMIT the snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile (main + test sources)..."
sbt -batch "Test/compile" >/tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] FAIL: tree does not compile — do not snapshot."
  grep -E "^\[error\]" /tmp/preflight_compile.log | head -20
  exit 1
}
echo "[preflight] compile OK"

if [[ "${1:-}" == "--full" ]]; then
  echo "[preflight] full ScalaTest suite..."
  sbt -batch test >/tmp/preflight_test.log 2>&1 || {
    echo "[preflight] FAIL: test suite red — do not snapshot."
    grep -E "\*\*\* FAILED|^\[error\]" /tmp/preflight_test.log | head -20
    exit 1
  }
  tail -5 /tmp/preflight_test.log
  echo "[preflight] suite OK"

  echo "[preflight] scheduled-entry smoke (tools/monthly_etl.sh, spark-submit)..."
  sbt -batch package >/tmp/preflight_pkg.log 2>&1 || {
    echo "[preflight] FAIL: sbt package broke — do not snapshot."
    exit 1
  }
  RUN_MODE=test OUT=/tmp/graft_preflight_etl tools/monthly_etl.sh \
      >/tmp/preflight_etl.log 2>&1 || {
    echo "[preflight] FAIL: monthly_etl.sh smoke red — do not snapshot."
    tail -5 /tmp/preflight_etl.log
    exit 1
  }
  tail -1 /tmp/preflight_etl.log
  echo "[preflight] scheduled-entry smoke OK"
fi
echo "[preflight] PASS — safe to snapshot."
