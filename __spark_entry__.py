"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over aws_logs_to_parquet_converter_spark.plans.REGISTRY —
every implemented operator from SURVEY.md §2 registers a (Spark
builder, DuckDB oracle) pair there; this module exposes them in the
driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from aws_logs_to_parquet_converter_spark.plans import REGISTRY  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's Days-Apart analysis (its Presto SQL run
    verbatim through the presto_compat shim) on sf0.001."""
    return REGISTRY["q_days_apart"].builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only:
    sketch/approximate operators, differential-tested in tests/)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
