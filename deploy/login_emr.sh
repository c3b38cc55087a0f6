#!/bin/bash
# SSH to the EMR master node — counterpart of the reference's
# bootstrap/aws_emr/login_emr.sh:4.  Rarely needed here:
# submit_compacter.sh submits with --deploy-mode cluster from anywhere
# (no master-node shell required); keep this for interactive debugging.
set -euo pipefail

CLUSTER_ID="${1:?usage: login_emr.sh <cluster-id> [key-file]}"
KEY_FILE="${2:-${KEY_FILE:-~/.ssh/your-ec2-keypair.pem}}"
aws emr ssh --cluster-id "${CLUSTER_ID}" --key-pair-file "${KEY_FILE}"
