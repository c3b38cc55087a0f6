#!/bin/bash
# Launch an EMR cluster sized for the compacter + analytics engine.
#
# Modernized equivalent of the reference's
# bootstrap/aws_emr/launch_emr_cluster.sh:16-41 (emr-5.23 / Spark 2.4 /
# m3.xlarge): current release label, instance types with local NVMe for
# shuffle spill, and the engine's session confs pushed down as cluster
# defaults so every job starts with the PERF_CONF posture
# (aws_logs_to_parquet_converter_spark/session.py).
#
# Fill the placeholders; everything else is ready to run.
set -euo pipefail

CLUSTER_NAME="${USER}_aws_logs_to_parquet_converter_spark"
BUCKET='your-bucket-name'
SUBNET='your-subnet-id'
KEYNAME='your-ec2-keypair'
INSTANCE_PROFILE='your-instance-profile'
SERVICE_ROLE='your-emr-service-role'
CORE_COUNT="${CORE_COUNT:-8}"   # scale out, not up: shuffle-heavy ops parallelize

aws emr create-cluster --applications Name=Spark \
  --ec2-attributes "{\"KeyName\":\"${KEYNAME}\",\"InstanceProfile\":\"${INSTANCE_PROFILE}\",\"SubnetId\":\"${SUBNET}\"}" \
  --service-role "${SERVICE_ROLE}" \
  --release-label emr-7.5.0 \
  --name "${CLUSTER_NAME}" \
  --instance-groups "[
    {\"InstanceCount\":1,\"InstanceGroupType\":\"MASTER\",\"InstanceType\":\"m6gd.xlarge\",\"Name\":\"master\"},
    {\"InstanceCount\":${CORE_COUNT},\"InstanceGroupType\":\"CORE\",\"InstanceType\":\"m6gd.2xlarge\",\"Name\":\"core\"}
  ]" \
  --configurations '[
    {
      "Classification": "spark-env",
      "Configurations": [
        {"Classification": "export",
         "Properties": {"PYSPARK_PYTHON": "/usr/bin/python3"}}
      ]
    },
    {
      "Classification": "spark-defaults",
      "Properties": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MILLIS",
        "spark.sql.session.timeZone": "UTC",
        "spark.speculation": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true"
      }
    }
  ]' \
  --region us-west-2 \
  --enable-debugging --log-uri "s3://${BUCKET}/${USER}/emr_logs"
