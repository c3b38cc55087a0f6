"""Registry of (Spark builder, DuckDB oracle) query pairs."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.session import ensure_semantics

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        wrapped = _with_semantics(fn)
        REGISTRY[name] = Query(name, wrapped, oracle, headline, fn.__doc__ or "")
        return wrapped

    return deco


def _with_semantics(fn):
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_semantics(spark)  # UTC etc. even on a harness-built session
        return fn(spark, sf_dir)

    inner.__doc__ = fn.__doc__
    inner.__name__ = getattr(fn, "__name__", "query")
    return inner


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    ``events.ts`` normalization seam — the engine accepts every parquet
    timestamp flavor the wild produces and emits one canonical type
    (session-local TIMESTAMP, pinned UTC by ``ensure_semantics``):

      * TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read as
        raw nanos (legacy conf) and floor-convert to micros — exactly
        DuckDB's nanos->micros truncation, so oracle comparisons agree.
      * TIMESTAMP(MICROS) without timezone: Spark reads TIMESTAMP_NTZ;
        cast to TIMESTAMP — value-identical under the pinned UTC
        session, and DuckDB reads the same bytes as naive-UTC too.
      * TIMESTAMP with timezone: passes through unchanged.

    Downstream operators (windows, sessionization, as-of) can then rely
    on instant-typed ``ts`` (``unix_micros`` etc.) regardless of how the
    upstream writer encoded it.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _norm_ntz(df)
    return _norm_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _norm_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-local TIMESTAMP —
    applied to ALL tables so a testdata regeneration that flips any
    writer's timezone annotation (the r4 breakage class) cannot
    reintroduce instant-vs-wall type mismatches downstream."""
    ntz = [c for c, dt in df.dtypes if dt == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def register_views(spark: SparkSession, sf_dir: str, names: list[str] = TABLES) -> None:
    """Register the testdata tables as temp views for spark.sql plans."""
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)
