"""Shared partitioning utilities for operator inputs.

The one-row-group trap: a small parquet file is a single split, so any
heavy map stage downstream (explode fan-out, per-row vector math,
Arrow-batched Python) runs as ONE task no matter how many cores the
cluster has.  Measured round 3: the whole sf0.1 minhash pipeline and
the embed-top-k corpus scan each serialized onto one core this way.

``fan_out`` is the conditional fix: spread the input by key when it
arrives with less than half the cluster's parallelism, and do nothing
otherwise — at 100 TB real inputs carry thousands of splits, and an
unconditional repartition would add a full shuffle for nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key: str) -> DataFrame:
    """Repartition ``df`` by ``key`` to the cluster's default
    parallelism iff it arrived under-partitioned (< half the target).
    ``getNumPartitions`` reads split metadata only — no job runs."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, key)
    return df
