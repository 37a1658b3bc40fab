#!/usr/bin/env bash
# Run the correctness dump via spark-submit (the north rule's deployment
# path). Usage: scripts/spark-submit-verify.sh <sfDir> <outDir> [master]
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
exec /opt/spark/bin/spark-submit \
  --master "${3:-local[32]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-28g}" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --class graft.Verify \
  target/scala-2.13/opensearchingestionspark_2.13-0.1.0.jar "$1" "$2"
