"""Query plans: the engine's analysis-query surface.

Each entry pairs a Spark-native implementation with an ANSI-SQL oracle
(DuckDB dialect) over the same tables, so the driver's differential
harness (row-count + schema + order-insensitive value-hash) can grade
it.  Modules register into ``REGISTRY`` at import time.
"""

from aws_logs_to_parquet_converter_spark.plans.registry import REGISTRY, Query, query  # noqa: F401
import aws_logs_to_parquet_converter_spark.plans.core  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core2  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core3  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core4  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.core5  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.log_domain  # noqa: E402,F401
import aws_logs_to_parquet_converter_spark.plans.extensions  # noqa: E402,F401
