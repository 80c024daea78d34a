#!/usr/bin/env bash
# Bench wrapper: run graft.Bench and emit the bare result JSON as the
# process's ONLY stdout line.
#
# Why: a direct `sbt runMain graft.Bench` prints the JSON blob and then
# sbt's "[success] Total time ..." trailer, and a caller that keeps only
# a bounded log tail both loses the head of the ~6 KB 227-query line and
# finds a non-JSON last line — the r11/r12 "parsed: null" failure mode.
# graft.Bench already writes its line durably (bench_last.json, or
# bench_subset.json for SPARK_GRAFT_ONLY runs); this wrapper routes all
# sbt/Spark chatter to stderr and cats that record as the final (sole)
# stdout line, so `tail -1 | json.loads` cannot miss.
#
# Usage: tools/bench.sh            (full sweep; env passes through:
#        SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ITERS, SPARK_GRAFT_ONLY, ...)
# Exit:  graft.Bench's code (nonzero on a budget breach — the JSON is
#        still printed first so the record survives the failure signal).
set -u
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench" 1>&2
rc=$?
record=bench_last.json
if [ -n "${SPARK_GRAFT_ONLY:-}" ]; then record=bench_subset.json; fi
if [ ! -s "$record" ]; then
  echo "{\"metric\":\"total\",\"value\":null,\"error\":\"$record missing\"}"
  exit 1
fi
cat "$record"
exit $rc
