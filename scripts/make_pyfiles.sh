#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule: the pipeline ships
# as spark-submit --py-files zips runnable unchanged at N and 4N executors).
set -euo pipefail
cd "$(dirname "$0")/.."
out=dist/karta_spark.zip
mkdir -p dist
rm -f "$out"
zip -qr "$out" karta_spark -x '*__pycache__*'
echo "built $out"
echo "run:  spark-submit --py-files $out scripts/run_pipeline.py --help"
