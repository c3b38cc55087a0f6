#!/bin/bash
# Package the engine and upload it for --py-files — counterpart of the
# reference's bootstrap/aws_emr/upload_conversion_script.sh:3 (which
# copied its single compacter script); here the whole package ships as
# one zip that submit_compacter.sh hands to spark-submit.
set -euo pipefail

BUCKET="${BUCKET:-your-bucket-name}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/aws_logs_to_parquet_converter_spark.zip"

(cd "${REPO}" && zip -qr "${ZIP}" aws_logs_to_parquet_converter_spark \
    -x '*__pycache__*' -x '*.pyc')
aws s3 cp "${ZIP}" "s3://${BUCKET}/${USER}/aws_logs_to_parquet_converter_spark.zip"
