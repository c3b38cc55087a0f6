#!/usr/bin/env python
"""Bitmap distinct-rollup measurement (operators/bitmap.py): at 20M
rows with ONE group holding 50% of them —

1. build + count vs Spark's native COUNT(DISTINCT) over the raw rows
   (the one-shot case: is the bitmap path competitive?);
2. the MV case the representation exists for: re-aggregating distinct
   counts for N different rollup groupings from pre-built daily
   segments vs re-scanning raw data N times;
3. (r14, the r13 verdict's item 7) the rest of the family at the same
   hot-group shape: bit_and retention and one-pass ROLLUP levels from
   segments vs their raw COUNT(DISTINCT)/self-join restatements, and
   rolling 7-day actives from segments vs the explode-pairs form.

Results land in SCALE.md.

Usage: python scripts/measure_bitmap.py [--rows 20000000] [--ids 1000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--ids", type=int, default=1_000_000)
    ap.add_argument("--days", type=int, default=30)
    args = ap.parse_args()

    from aws_logs_to_parquet_converter_spark.operators import bitmap
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="bitmap-skew", extra_conf={"spark.ui.enabled": "false"})
    n, nids, days = args.rows, args.ids, args.days

    # deterministic synthetic: group 'hot' holds 50% of rows; ids
    # uniform; one day column for segment rollups
    base = spark.range(n)
    df = base.select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % nids).alias("uid"),
        (F.col("id") % days).alias("day"),
    )

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        w = time.time() - t0
        print(f"{label}: {w:.2f}s {out}")
        return w

    # warm the scan shape
    df.groupBy("g").count().write.format("noop").mode("overwrite").save()

    timed(
        "native COUNT(DISTINCT) per group (raw scan)",
        lambda: df.groupBy("g").agg(F.count_distinct("uid").alias("d"))
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "bitmap build+count per group (raw scan)",
        lambda: bitmap.bitmap_cardinality(
            bitmap.bitmap_build(df, ["g"], "uid"), ["g"]
        ).write.format("noop").mode("overwrite").save(),
    )

    # the MV lifecycle: build daily segments ONCE, then answer rollups
    # from segments
    segs = bitmap.bitmap_build(df, ["g", "day"], "uid").persist()
    timed("daily segment build (once, persisted)", lambda: segs.count())
    timed(
        "rollup A per (g) from segments",
        lambda: bitmap.bitmap_cardinality(
            bitmap.bitmap_merge(segs, ["g"]), ["g"]
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "rollup B per (g, week) from segments",
        lambda: bitmap.bitmap_cardinality(
            bitmap.bitmap_merge(
                segs.withColumn("week", F.floor(F.col("day") / 7).cast("long")),
                ["g", "week"],
            ),
            ["g", "week"],
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "rollup C global from segments",
        lambda: bitmap.bitmap_cardinality(
            bitmap.bitmap_merge(segs.withColumn("all", F.lit(1)), ["all"]), ["all"]
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "same three rollups from raw (re-scan x3)",
        lambda: [
            df.groupBy("g").agg(F.count_distinct("uid")).write.format("noop").mode("overwrite").save(),
            df.withColumn("week", F.floor(F.col("day") / 7))
            .groupBy("g", "week").agg(F.count_distinct("uid"))
            .write.format("noop").mode("overwrite").save(),
            df.agg(F.count_distinct("uid")).write.format("noop").mode("overwrite").save(),
        ]
        and "",
    )
    # --- r14: retention / rollup-levels / rolling-window envelope ---
    timed(
        "bit_and retention per (g, day->day+1) from segments",
        lambda: bitmap.bitmap_retention(segs, ["g"], "day")
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "retention from raw (distinct pairs self-join)",
        lambda: (lambda ud: ud.alias("a").join(
            ud.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.uid") == F.col("b.uid"))
            & (F.col("b.day") == F.col("a.day") - 1),
        ).groupBy("a.g", "a.day").agg(F.count("*").alias("n")))(
            df.select("g", "day", "uid").distinct()
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "one-pass ROLLUP levels (g, day) from segments",
        lambda: bitmap.bitmap_rollup_cardinality(segs, ["g", "day"])
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "ROLLUP levels from raw (native count_distinct, rollup)",
        lambda: df.rollup("g", "day").agg(F.count_distinct("uid"))
        .write.format("noop").mode("overwrite").save(),
    )
    day_segs = bitmap.bitmap_build(df, ["day"], "uid").persist()
    day_segs.count()
    timed(
        "rolling 7-day actives from (day) segments",
        lambda: bitmap.bitmap_rolling_active(day_segs, [], "day", 7)
        .write.format("noop").mode("overwrite").save(),
    )
    from aws_logs_to_parquet_converter_spark.operators import timeseries

    timed(
        "rolling 7-day actives, explode-pairs form (raw scan)",
        lambda: timeseries.rolling_active_users(
            df.select(
                F.timestamp_seconds(F.col("day") * 86400).alias("ts"), "uid"
            ),
            "ts",
            "uid",
            7,
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "first-seen (new ids per day) from segments",
        lambda: bitmap.bitmap_first_seen(day_segs, [], "day")
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "first-seen from raw (min day per id, then count)",
        lambda: df.groupBy("uid").agg(F.min("day").alias("d"))
        .groupBy("d").agg(F.count("*").alias("n"))
        .write.format("noop").mode("overwrite").save(),
    )
    # --- r15: FULL growth decomposition from the MV vs raw re-scan ---
    timed(
        "growth accounting (new/ret/res/churned) from (day) segments",
        lambda: bitmap.bitmap_growth(day_segs, [], "day")
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "growth accounting from raw (array-classification re-scan)",
        lambda: timeseries.growth_accounting(df, "uid", "day")
        .write.format("noop").mode("overwrite").save(),
    )
    day_segs.unpersist()
    segs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
