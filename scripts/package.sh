#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission:
#   scripts/package.sh            -> dist/dlt_spark.zip
# Submit example (cluster):
#   spark-submit --py-files dist/dlt_spark.zip scripts/submit_job.py \
#       --log <events parquet root> --table <lakehouse root>
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dlt_spark.zip
zip -qr dist/dlt_spark.zip dlt_spark -x '*__pycache__*'
echo "dist/dlt_spark.zip"
