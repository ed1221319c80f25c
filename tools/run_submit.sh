#!/usr/bin/env bash
# Package the engine and launch the flagship ingest via spark-submit
# --py-files (the BASELINE.json:14 launch posture). Usage:
#   tools/run_submit.sh <file.pbf> <table-dir> [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PBF="$1"; TABLE="$2"; shift 2
python "$REPO/tools/package_pyfiles.py"
exec "${SPARK_SUBMIT:-spark-submit}" \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files "$REPO/dist/osm_pbf_spark.zip" \
  "$@" \
  "$REPO/jobs/ingest_job.py" --pbf "$PBF" --table "$TABLE"
