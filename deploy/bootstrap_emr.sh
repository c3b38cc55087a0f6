#!/bin/bash
# EMR node bootstrap — counterpart of the reference's
# bootstrap/aws_emr/bootstrap_emr.sh (which pip-installs boto3 for its
# single-script compacter).  This engine needs NO per-node Python
# deps: listing, parse, and write all run through Spark/Hadoop (s3a),
# so the default bootstrap is a no-op.  Uncomment the pip line only if
# a deployment swaps real codec/model libraries into the sanctioned
# Arrow seams (operators/multimodal.py, operators/inference.py).
set -euo pipefail

# sudo python3 -m pip install pillow soundfile   # optional seam deps
echo "bootstrap: no per-node dependencies required"
