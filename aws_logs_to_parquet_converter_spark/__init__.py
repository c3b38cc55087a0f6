"""aws_logs_to_parquet_converter_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
Yelp/aws_logs_to_parquet_converter (reference at /root/reference/,
Apache-2.0): S3 server-access-log ingestion (regex parse -> typed,
date-partitioned Parquet) plus the full analysis-query surface the
reference delegates to Athena/Presto — expressed natively on the Spark
DataFrame/SQL stack so a single engine covers both halves.

Design notes (vs reference):
  * The reference parses with per-line Python inside an RDD flatMap
    (scripts/oss_s3_server_side_logging_compacter.py:154-218).  Here the
    whole parse is Catalyst-visible native column expressions — one
    regex pass per line, wholestage-codegen, zero Python workers.
  * The reference writes `dt=` partition paths by string formatting
    (compacter.py:246-251); here `partitionBy('dt')` makes dt a real
    partition column so Catalyst partition pruning works.
  * The Presto-dialect analysis SQL (example_queries/*.sql) runs via a
    small compat shim (functions/presto_compat.py) or as native
    DataFrame plans (plans/).
"""

__version__ = "0.1.0"

from aws_logs_to_parquet_converter_spark.session import get_spark  # noqa: F401
