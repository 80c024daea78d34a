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
# set-vs-non-empty must MATCH Bench.scala (sys.env.get): an empty-but-
# exported SPARK_GRAFT_ONLY makes Bench write bench_subset.json, so the
# wrapper must read the same file, not a stale bench_last.json
record=bench_last.json
if [ -n "${SPARK_GRAFT_ONLY+x}" ]; then record=bench_subset.json; fi
# remove the prior record BEFORE the run: bench_last.json is committed,
# so on a failed run the [ -s ] guard below would otherwise cat last
# round's timings as a fresh result with a clean stdout
rm -f "$record"
sbt -batch "runMain graft.Bench" 1>&2
rc=$?
if [ ! -s "$record" ]; then
  echo "{\"metric\":\"total\",\"value\":null,\"error\":\"$record missing\"}"
  exit 1
fi
cat "$record"
exit $rc
