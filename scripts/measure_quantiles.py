#!/usr/bin/env python
"""exact_quantiles_disc skew measurement at the 50%-hot-group shape:
the segmented cumulative (ours) vs the naive per-group ordered-window
cumulative over distinct values — the funnel appears when the hot
group's DISTINCT value count is large (here ~10M distinct cents in one
group).  Results land in SCALE.md.

Usage: python scripts/measure_quantiles.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    n = args.rows

    from aws_logs_to_parquet_converter_spark.operators.ranking import (
        exact_quantiles_disc,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="quantile-skew", extra_conf={"spark.ui.enabled": "false"})

    # 'hot' holds 50% of rows with ~n/2 distinct values (near-unique
    # cents) — the distinct-value funnel shape
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % (1 << 40)).alias("v"),
    )
    df.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm
    qs = [250, 500, 750, 950]

    def timed(label, fn):
        t0 = time.time()
        fn()
        print(f"{label}: {time.time() - t0:.2f}s")

    timed(
        "exact_quantiles_disc SEGMENTED (ours)",
        lambda: exact_quantiles_disc(df, ["g"], "v", qs)
        .write.format("noop").mode("overwrite").save(),
    )

    def naive():
        counts = df.groupBy("g", "v").agg(F.count("*").alias("c"))
        w = Window.partitionBy("g").orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
        wn = Window.partitionBy("g")
        cum = counts.select(
            "g", "v", "c",
            F.sum("c").over(w).alias("cum"),
            F.sum("c").over(wn).alias("n"),
        )
        qcol = F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
        rank = F.expr("(q * n + 999) div 1000")
        return (
            cum.select("g", "v", "c", "cum", "n", qcol)
            .where((rank > F.col("cum") - F.col("c")) & (rank <= F.col("cum")))
            .write.format("noop").mode("overwrite").save()
        )

    timed("naive per-group ordered-window cumulative", naive)

    # --- narrow-domain shape (r15, verdict item 2): the hot group's
    # values all fit in ONE old fixed-width bucket (cents < $10k ≈
    # 2^20), so the former bucket_width=1<<20 default collapsed it to
    # a single (group, bucket) window — the funnel, silently back.
    # The adaptive default must segment it; the fixed old default is
    # measured beside it as the regression witness.
    narrow = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % 1_000_000).alias("v"),  # < 2^20 span
    )
    narrow.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm
    timed(
        "NARROW domain, adaptive width (ours, default)",
        lambda: exact_quantiles_disc(narrow, ["g"], "v", qs)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "NARROW domain, fixed width 1<<20 (old default: one-bucket funnel)",
        lambda: exact_quantiles_disc(narrow, ["g"], "v", qs, bucket_width=1 << 20)
        .write.format("noop").mode("overwrite").save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
