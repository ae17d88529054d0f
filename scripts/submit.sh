#!/usr/bin/env bash
# Package the engine and submit the rollup job to a real cluster.
#
#   scripts/submit.sh <master-url> <input-path> <output-root> [extra spark-submit args...]
#
# For continuous ingestion instead of batch runs, submit
# scripts/run_stream_ingest.py with the same packaging (it streams the
# 1m tier into the same snapshot store, exactly-once).
#
# The same code runs unmodified: local tests use local[n]; this script
# adds Iceberg + AQE config for multi-executor runs. Scaling evidence
# for the north rule comes from running this at N and 4N executors
# (sandbox stand-in: bench/scaling.py at local[8]/local[32]).
set -euo pipefail

MASTER="${1:?master url}"
INPUT="${2:?input path}"
OUTPUT="${3:?output root}"
shift 3

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/engine.zip"
(cd "$REPO" && zip -qr "$ZIP" getml_community_spark)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.ansi.enabled=false \
  --conf spark.sql.shuffle.partitions=2000 \
  "$@" \
  "$REPO/scripts/run_rollup_job.py" "$INPUT" "$OUTPUT"
