#!/bin/bash
# spark-submit wrapper for the daily compaction run on a cluster —
# replaces the reference's upload_conversion_script.sh + SSH +
# hand-typed spark-submit (bootstrap/aws_emr/login_emr.sh,
# upload_conversion_script.sh): the engine ships as a wheel/zip, the
# CLI flags are identical to local runs, per-job sizing is explicit.
#
# Usage:
#   ./submit_compacter.sh 2019-03-01 2019-03-08 [extra cli flags...]
set -euo pipefail

MIN_DATE="$1"; MAX_DATE="$2"; shift 2

SRC_BUCKET='s3a://your-raw-log-bucket'
MONITORED='monitored-bucket'
DEST_BUCKET='s3a://your-warehouse-bucket'
PKG_ZIP="${PKG_ZIP:-aws_logs_to_parquet_converter_spark.zip}"  # zip of the package dir

# Executor sizing notes (SCALE.md): shuffle partitions ~2-3x total
# cores; maxPartitionBytes 128 MB keeps scan tasks balanced; AQE
# coalesces and splits skew at runtime on top.
spark-submit \
  --deploy-mode cluster \
  --py-files "${PKG_ZIP}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-400}" \
  --conf spark.sql.files.maxPartitionBytes=134217728 \
  --conf spark.dynamicAllocation.enabled=true \
  aws_logs_to_parquet_converter_spark/cli.py \
  --source-access-log-bucket "${SRC_BUCKET}" \
  --source-bucket "${MONITORED}" \
  --destination-log-bucket "${DEST_BUCKET}" \
  --min-date "${MIN_DATE}" --max-date "${MAX_DATE}" \
  "$@"

# Partition maintenance (small-file repair) runs the same way:
#   spark-submit ... aws_logs_to_parquet_converter_spark/cli.py maintain \
#     --dest "${DEST_BUCKET}/teams/metrics-data/s3_server_side_access_logs/${MONITORED}"
