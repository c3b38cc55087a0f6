#!/bin/bash
# Upload the node bootstrap script to S3 so launch_emr_cluster.sh can
# reference it — counterpart of the reference's
# bootstrap/aws_emr/upload_bootstrap.sh:5.
set -euo pipefail

BUCKET="${BUCKET:-your-bucket-name}"
aws s3 cp "$(dirname "$0")/bootstrap_emr.sh" "s3://${BUCKET}/${USER}/bootstrap_emr.sh"
