#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging surface).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/greenocr_spark.zip
zip -qr dist/greenocr_spark.zip greenocr_spark -x '*__pycache__*'
echo "dist/greenocr_spark.zip:"
unzip -l dist/greenocr_spark.zip | tail -3
