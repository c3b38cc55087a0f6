#!/usr/bin/env python
"""Histogram-MV quantile measurement at the 50%-hot-group shape:
the point of the MV is that the data-sized pass happens ONCE
(hist_build: one map-side-combinable aggregate); every subsequent
quantile question — any group, any slice range — is answered from
segment counts whose size is bounded by slices x ~1,920 buckets.

Measured here against the two raw-rescan alternatives at 20M rows
with one group holding 50% and near-unique long-tailed values:

1. hist_build (the one-time segment build over raw);
2. hist_quantiles FROM SEGMENTS (the steady-state ask);
3. ranking.exact_quantiles_disc over raw (the exact re-scan);
4. approx_percentile over raw (Spark's built-in sketch re-scan).

Results land in SCALE.md.

Usage: python scripts/measure_histogram.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    w = time.time() - t0
    print(f"{label}: {w:.2f}s {out if out is not None else ''}")
    return w


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    n = args.rows

    from aws_logs_to_parquet_converter_spark.operators import histogram
    from aws_logs_to_parquet_converter_spark.operators.ranking import (
        exact_quantiles_disc,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(
        app_name="histogram-skew", extra_conf={"spark.ui.enabled": "false"}
    )

    # 50%-hot group; long-tailed near-unique values (squared hash ->
    # heavy right tail, ~n distinct) over 100 daily slices
    raw = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        (F.col("id") % 100).alias("slice"),
        (
            ((F.col("id") * 2654435761) % 3_000_000)
            * ((F.col("id") * 40503) % 1000)
        ).alias("v"),
    )
    raw.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm

    segs = None

    def build():
        nonlocal segs
        segs = histogram.hist_build(raw, ["g", "slice"], "v")
        segs.persist()
        return f"({segs.count()} segment rows)"

    timed("hist_build ONE-TIME segment build (raw-sized)", build)
    timed(
        "hist_quantiles FROM SEGMENTS p50/p95/p99 (steady-state)",
        lambda: histogram.hist_quantiles(segs, ["g"], [500, 950, 990])
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "hist_quantiles SLICE RANGE 10..30 from the same segments",
        lambda: histogram.hist_quantiles(
            segs.where(F.col("slice").between(10, 30)), ["g"], [500, 950, 990]
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "exact_quantiles_disc RAW RE-SCAN (exact alternative)",
        lambda: exact_quantiles_disc(raw, ["g"], "v", [500, 950, 990])
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "approx_percentile RAW RE-SCAN (sketch alternative)",
        lambda: raw.groupBy("g")
        .agg(
            F.percentile_approx("v", [0.5, 0.95, 0.99], 10000).alias("p")
        )
        .write.format("noop").mode("overwrite").save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
