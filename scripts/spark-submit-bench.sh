#!/usr/bin/env bash
# Run the benchmark via spark-submit. Env: SPARK_GRAFT_SF_DIR,
# SPARK_GRAFT_BENCH_DOCS, SPARK_GRAFT_SCALE_CORES (see graft.Bench).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --driver-memory "${SPARK_DRIVER_MEM:-28g}" \
  --conf spark.ui.enabled=false \
  --class graft.Bench \
  target/scala-2.13/opensearchingestionspark_2.13-0.1.0.jar
