#!/usr/bin/env bash
# Build the spark-submit distribution: a zip of the rios_spark package.
# Usage:
#   tools/make_package.sh                      # -> dist/rios_spark.zip
#   spark-submit --py-files dist/rios_spark.zip examples/tile_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rios_spark.zip
zip -qr dist/rios_spark.zip rios_spark -x '*/__pycache__/*'
echo "dist/rios_spark.zip:"
unzip -l dist/rios_spark.zip | tail -3
