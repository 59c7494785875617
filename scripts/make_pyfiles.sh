#!/usr/bin/env bash
# Package myaku_spark for spark-submit --py-files deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f myaku_spark.zip
zip -qr myaku_spark.zip myaku_spark -x '*__pycache__*'
echo "wrote $(pwd)/myaku_spark.zip"
echo "deploy: spark-submit --master <cluster> --py-files myaku_spark.zip scripts/run_build.py --pages <path> --out <index>"
