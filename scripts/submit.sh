#!/usr/bin/env bash
# Package the engine and run a job on a real cluster via spark-submit.
#
#   MASTER=spark://host:7077 scripts/submit.sh bench.py
#   MASTER=yarn scripts/submit.sh your_job.py --conf spark.executor.instances=64
#
# The engine is a plain python package — one zip shipped with --py-files
# is the whole deployment.  Add the Iceberg runtime for native Iceberg
# tables (sources/iceberg.py falls back to parquet without it).

set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:-$REPO/bench.py}"
shift || true

ZIP=/tmp/geomatics_geotk_spark.zip
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" geomatics_geotk_spark)

exec spark-submit \
  --master "${MASTER:-local[8]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=200000 \
  --conf spark.sql.session.timeZone=UTC \
  "$@" \
  "$JOB"
