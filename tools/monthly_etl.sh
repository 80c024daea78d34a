#!/usr/bin/env bash
# Scheduled monthly-ETL entry point — the spark-submit packaging of
# graft.EtlPipeline, mirroring the reference's scheduled workflow
# parameter surface (.github/workflows/monthly_etl.yml:4-35: monthly
# cron + manual dispatch with run_mode / location_filter / start_date /
# end_date). Every yml input maps to one env var here; the EtlPipeline
# CLI flags already mirror them 1:1.
#
# Schedule it like the reference's cron (1st of month, 08:00 UTC):
#
#   0 8 1 * *  RUN_MODE=production OUT=/data/sales /path/to/repo/tools/monthly_etl.sh
#
# or call it from any workflow runner that exports the same variables.
#
# Parameters (env, all optional — defaults match the yml):
#   RUN_MODE         production | test   (test caps input rows, the
#                    yml's TEST=true; default production)
#   LOCATION_FILTER  all | <square location id>   (default all)
#   START_DATE       YYYY-MM-DD (empty = previous Chicago month)
#   END_DATE         YYYY-MM-DD (empty = previous Chicago month)
#   ORDERS           input orders JSON glob
#                    (default: fixtures/orders_sample.jsonl smoke data)
#   LOCATIONS        locations parquet path, or "builtin" (default)
#   OUT              output directory (default /tmp/graft_monthly_etl)
#   SPARK_MASTER     master URL for spark-submit (default local[*];
#                    on a cluster: yarn / k8s:// / spark://...)
#
# On a real cluster this runs through spark-submit against the packaged
# jar (sbt package → target/scala-2.13/analyticsetlspark_2.13-*.jar).
# In a dev sandbox without spark-submit on PATH it falls back to
# `sbt runMain` with identical arguments — same main, same flags.
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_MODE="${RUN_MODE:-production}"
LOCATION_FILTER="${LOCATION_FILTER:-all}"
START_DATE="${START_DATE:-}"
END_DATE="${END_DATE:-}"
ORDERS="${ORDERS:-fixtures/orders_sample.jsonl}"
LOCATIONS="${LOCATIONS:-builtin}"
OUT="${OUT:-/tmp/graft_monthly_etl}"
SPARK_MASTER="${SPARK_MASTER:-local[*]}"

ARGS=(--orders "$ORDERS" --locations "$LOCATIONS" --out "$OUT")
[ -n "$START_DATE" ] && ARGS+=(--start "$START_DATE")
[ -n "$END_DATE" ] && ARGS+=(--end "$END_DATE")
[ "$LOCATION_FILTER" != "all" ] && ARGS+=(--location-filter "$LOCATION_FILTER")
# the yml's TEST=true run_mode: cap input like monthly_etl.py's test path
[ "$RUN_MODE" = "test" ] && ARGS+=(--test-limit 1000)

if command -v spark-submit >/dev/null 2>&1; then
  # `|| true`: under set -e a bare `ls` with no match would kill the
  # script HERE (exit 2 through the pipeline), making the sbt-package
  # fallback below unreachable — a fresh clone's scheduled run would
  # die silently
  JAR=$(ls target/scala-2.13/analyticsetlspark_2.13-*.jar 2>/dev/null \
    | head -1 || true)
  if [ -z "${JAR:-}" ]; then
    echo "[monthly-etl] no packaged jar — running sbt package" >&2
    sbt -batch package 1>&2
    JAR=$(ls target/scala-2.13/analyticsetlspark_2.13-*.jar | head -1)
  fi
  exec spark-submit --class graft.EtlPipeline --master "$SPARK_MASTER" \
    "$JAR" "${ARGS[@]}"
else
  # sbt's runMain takes ONE string it splits on whitespace itself —
  # shell quoting cannot pass a space-containing path through it.
  # Refuse loudly instead of silently truncating an output dir.
  for a in "${ARGS[@]}"; do
    case "$a" in *[[:space:]]*)
      echo "[monthly-etl] arg '$a' contains whitespace — the sbt" \
        "fallback cannot pass it; install spark-submit or rename" >&2
      exit 1 ;;
    esac
  done
  echo "[monthly-etl] spark-submit not on PATH — sbt runMain fallback" >&2
  exec sbt -batch "runMain graft.EtlPipeline ${ARGS[*]}"
fi
