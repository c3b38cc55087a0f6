#!/usr/bin/env python
"""mann_whitney_u skew measurement at the 50%-hot-group shape: the
segmented strictly-below cumulative (ours) vs the naive per-group
ordered-window restatement (the oracle's shape) — the funnel appears
when the hot group's DISTINCT value count is large (~10M distinct
values in one group, so the naive window's cumulative is ONE task
sorting 10M count rows).  The pair space (n_a·n_b ≈ 2.5e13 here) is
never materialized by either form — that is the operator's point.
Results land in SCALE.md.

Usage: python scripts/measure_mannwhitney.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    w = time.time() - t0
    print(f"{label}: {w:.2f}s {out if out is not None else ''}")
    return w


def naive_mw(df):
    """The oracle's shape: one ordered window per group over distinct
    values — the hot group's cumulative is a single task."""
    counts = (
        df.where(F.col("v").isNotNull() & F.col("s").isNotNull())
        .groupBy("g", "v")
        .agg(
            F.count(F.when(F.col("s"), 1)).alias("ca"),
            F.count(F.when(~F.col("s"), 1)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.select(
        "g",
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).alias("cumb_lt"),
    )
    t_ = F.col("ca") + F.col("cb")
    return cum.groupBy("g").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * (F.lit(2) * F.col("cumb_lt") + F.col("cb"))).alias("u2_a"),
        F.sum(t_ * t_ * t_ - t_).alias("tie_cubes"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    n = args.rows

    from aws_logs_to_parquet_converter_spark.operators.ranking import (
        mann_whitney_u,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="mw-skew", extra_conf={"spark.ui.enabled": "false"})
    import os

    print("loadavg:", tuple(round(x, 2) for x in os.getloadavg()))

    # 'hot' holds 50% of rows with ~n/2 near-unique values; side is a
    # deterministic 50/50 split with a planted shift (A = B + small
    # offset) so u2_a is a real, non-degenerate statistic
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 37).cast("string")))
        .alias("g"),
        (F.xxhash64("id") % 2 == 0).alias("s"),
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n // 2))
            + F.when(F.xxhash64("id") % 2 == 0, F.lit(5000)).otherwise(F.lit(0))
        ).cast("long").alias("v"),
    )

    ours = timed(
        "segmented mann_whitney_u",
        lambda: tuple(
            sorted(
                (r["g"], r["u2_a"])
                for r in mann_whitney_u(df, ["g"], "s", "v").collect()
            )
        )[:1],
    )
    naive = timed(
        "naive one-window-per-group",
        lambda: tuple(
            sorted((r["g"], r["u2_a"]) for r in naive_mw(df).collect())
        )[:1],
    )
    print(f"ratio: {naive / max(ours, 1e-9):.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
