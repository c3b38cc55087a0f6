"""Column profiler: one-pass data-quality statistics for any DataFrame.

Pipelines over raw corpora gate on data quality before spending
compute; this is the cheap first look — per column: null rate, approx
distinct, min/max, and (for strings) length stats.  Everything is one
aggregation pass (a single scan, map-side combined), not per-column
jobs; output is long-form (column, metric, value) so it feeds a
monitoring sink directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    MapType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_SEP = "|"


def profile(df: DataFrame) -> DataFrame:
    """(column, metric, value:string) long-form profile of every column."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}{_SEP}nulls"))
        # map columns are not hashable for the HLL aggregate — one
        # such column would fail analysis and kill the WHOLE one-pass
        # profile (round-7 review finding); count distinct over the
        # JSON rendering instead
        distinct_src = (
            F.to_json(c) if isinstance(f.dataType, MapType) else c
        )
        aggs.append(
            F.approx_count_distinct(distinct_src).alias(
                f"{f.name}{_SEP}approx_distinct"
            )
        )
        if isinstance(
            f.dataType, (NumericType, TimestampType, TimestampNTZType, DateType)
        ):
            aggs.append(F.min(c).cast("string").alias(f"{f.name}{_SEP}min"))
            aggs.append(F.max(c).cast("string").alias(f"{f.name}{_SEP}max"))
        elif isinstance(f.dataType, StringType):
            aggs.append(F.min(F.length(c)).alias(f"{f.name}{_SEP}min_len"))
            aggs.append(F.max(F.length(c)).alias(f"{f.name}{_SEP}max_len"))
            aggs.append(F.round(F.avg(F.length(c)), 2).alias(f"{f.name}{_SEP}avg_len"))

    row = df.agg(*aggs).first()
    n = row["__n"]
    spark = df.sparkSession
    out = [("*", "row_count", str(n))]
    for k, v in row.asDict().items():
        if k == "__n":
            continue
        col_name, metric = k.rsplit(_SEP, 1)
        if metric == "nulls":
            # SUM over an empty table is NULL — report 0, not 'None'
            out.append((col_name, "null_count", str(v if v is not None else 0)))
            out.append((col_name, "null_rate", f"{(v / n if n else 0.0):.6f}"))
        else:
            out.append((col_name, metric, None if v is None else str(v)))
    return spark.createDataFrame(out, "column string, metric string, value string")
