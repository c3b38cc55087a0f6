#!/usr/bin/env python
"""Interval/growth-family skew measurement (operators/intervals.py,
timeseries.growth_accounting) at the 50%-hot-group shape:

1. peak_concurrency: the segmented sweep line (ours) vs the naive
   one-ordered-window-per-group sweep — the hot group is exactly the
   single-task funnel the segmented form exists to avoid;
2. growth_accounting: the per-id array classification (ours) vs the
   per-id LAG/LEAD window restatement (the oracle's shape) with a BOT
   id holding 50% of all rows — the hot-id window surface;
3. interval_join: wall + output pairs at a bounded hot-key shape
   (pair volume is the declared cost driver, like the LSH families).

Results land in SCALE.md.

Usage: python scripts/measure_intervals.py [--rows 20000000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    n = args.rows

    from aws_logs_to_parquet_converter_spark.operators import intervals
    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        growth_accounting,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="interval-skew", extra_conf={"spark.ui.enabled": "false"})

    # --- 1. peak_concurrency: 50%-hot group --------------------------
    # intervals over a 30-day span in MICROSECONDS (near-unique
    # timestamps — the shape where the hot group's delta stream cannot
    # be collapsed by (g, t) netting, so the naive per-group window
    # really does sort ~n rows in ONE task)
    span_us = 30 * 86_400 * 1_000_000
    iv = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % span_us).alias("s"),
    ).select("g", "s", (F.col("s") + 1 + (F.col("s") % 7_200_000_000)).alias("e"))
    iv.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm

    timed(
        "peak_concurrency SEGMENTED (ours, day buckets)",
        lambda: intervals.peak_concurrency(
            iv, ["g"], "s", "e", bucket_width=86_400 * 1_000_000
        )
        .write.format("noop").mode("overwrite").save(),
    )

    def naive_sweep():
        deltas = iv.select(
            "g",
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                    F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
                )
            ).alias("ev"),
        ).select("g", F.col("ev.t").alias("t"), F.col("ev.d").alias("d"))
        net = deltas.groupBy("g", "t").agg(F.sum("d").alias("nd"))
        w = Window.partitionBy("g").orderBy("t").rowsBetween(
            Window.unboundedPreceding, 0
        )
        run = net.select("g", "t", F.sum("nd").over(w).alias("c"))
        return (
            run.groupBy("g")
            .agg(F.max(F.struct(F.col("c"), (-F.col("t")).alias("nt"))).alias("b"))
            .select("g", F.col("b.c").alias("peak"))
            .write.format("noop").mode("overwrite").save()
        )

    timed("peak_concurrency NAIVE (one ordered window per group)", naive_sweep)

    # --- 2. growth_accounting: 50%-hot id ------------------------------
    ev = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % 1_000_000)
        .alias("uid"),
        (F.col("id") % 30).alias("day"),
    )
    ev.groupBy("day").count().write.format("noop").mode("overwrite").save()  # warm

    timed(
        "growth_accounting ARRAY form (ours)",
        lambda: growth_accounting(ev, "uid", "day")
        .write.format("noop").mode("overwrite").save(),
    )

    def window_form():
        ud = ev.select("uid", F.col("day").cast("long").alias("d")).distinct()
        w = Window.partitionBy("uid").orderBy("d")
        cls = ud.select(
            "uid", "d",
            F.lag("d").over(w).alias("prv"),
            F.lead("d").over(w).alias("nxt"),
        )
        act = cls.select(
            "d",
            F.when(F.col("prv").isNull(), F.lit("new"))
            .when(F.col("prv") == F.col("d") - 1, F.lit("returning"))
            .otherwise(F.lit("resurrected")).alias("k"),
        )
        chn = cls.where(
            F.col("nxt").isNull() | (F.col("nxt") != F.col("d") + 1)
        ).select((F.col("d") + 1).alias("d"), F.lit("churned").alias("k"))
        evs = act.unionByName(chn)
        return (
            evs.groupBy("d")
            .agg(
                F.count(F.when(F.col("k") == "new", 1)).alias("n_new"),
                F.count(F.when(F.col("k") == "returning", 1)).alias("n_ret"),
                F.count(F.when(F.col("k") == "resurrected", 1)).alias("n_res"),
                F.count(F.when(F.col("k") == "churned", 1)).alias("n_chn"),
            )
            .write.format("noop").mode("overwrite").save()
        )

    timed("growth_accounting LAG/LEAD window form (oracle shape)", window_form)

    # --- 3. interval_join: bounded hot-key shape ----------------------
    m = max(100_000, n // 20)
    left = spark.range(m).select(
        (F.col("id") % 10_000).alias("user_id"),
        ((F.col("id") * 48271) % (7 * 86400)).alias("l_s"),
    ).select("user_id", "l_s", (F.col("l_s") + 1 + (F.col("l_s") % 1800)).alias("l_e"))
    right = spark.range(m).select(
        (F.col("id") % 10_000).alias("user_id"),
        ((F.col("id") * 16807) % (7 * 86400)).alias("r_s"),
    ).select("user_id", "r_s", (F.col("r_s") + 1 + (F.col("r_s") % 1800)).alias("r_e"))
    joined = intervals.interval_join(
        left, right, "l_s", "l_e", "r_s", "r_e",
        keys=["user_id"], bucket_width=3600,
    )
    pairs = joined.count()
    timed(
        f"interval_join {m}x{m} on 10k keys (hour buckets; {pairs} pairs)",
        lambda: joined.write.format("noop").mode("overwrite").save(),
    )

    # --- 4. interval_join wide-row A/B (r15, verdict item 3) ----------
    # same join shape, but each span row drags ~0.5 KB of
    # INCOMPRESSIBLE payload (md5 chain — a constant literal compresses
    # to nothing in the shuffle and fakes a win for unslimmed); spans
    # are LONG (~12 hour-buckets each), so unslimmed replication pays
    # width x span-buckets through the join shuffle
    def pay(prefix: str) -> F.Column:
        return F.concat(
            *[
                F.md5(F.concat(F.lit(f"{prefix}{i}"), F.col("id").cast("string")))
                for i in range(16)
            ]
        )

    wleft = spark.range(m).select(
        (F.col("id") % 10_000).alias("user_id"),
        ((F.col("id") * 48271) % (7 * 86400)).alias("l_s"),
        pay("L").alias("l_pay"),
    ).select(
        "user_id", "l_s",
        (F.col("l_s") + 1 + (F.col("l_s") % 86400)).alias("l_e"), "l_pay",
    )
    wright = spark.range(m).select(
        (F.col("id") % 10_000).alias("user_id"),
        ((F.col("id") * 16807) % (7 * 86400)).alias("r_s"),
        pay("R").alias("r_pay"),
    ).select(
        "user_id", "r_s",
        (F.col("r_s") + 1 + (F.col("r_s") % 86400)).alias("r_e"), "r_pay",
    )
    wleft.write.format("noop").mode("overwrite").save()  # warm the md5 build
    for slim in (True, False):
        timed(
            f"interval_join WIDE payload (~0.5KB/row md5, ~12-bucket spans), slim={slim}",
            lambda slim=slim: intervals.interval_join(
                wleft, wright, "l_s", "l_e", "r_s", "r_e",
                keys=["user_id"], bucket_width=3600, slim_payload=slim,
            ).write.format("noop").mode("overwrite").save(),
        )

    # --- 5. point_in_interval at the hot-key shape (r15, item 4) ------
    # the shape where the theta restatement genuinely degrades: the hot
    # user holds 50% of POINTS *and* many SPANS — theta's work is
    # points x spans-per-user inside the hot key (AQE skew-split
    # spreads it across cores but cannot shrink it); the bucketed form
    # compares each point only against spans touching ITS hour bucket
    # (~1/168th of the hot user's spans).  Short spans keep the output
    # bounded so match volume doesn't mask the comparison asymmetry.
    np_ = max(2_000_000, n // 10)
    pts = spark.range(np_).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % 10_000)
        .alias("user_id"),
        ((F.col("id") * 1103515245) % (7 * 86400)).alias("t"),
    )
    spans = spark.range(220_000).select(
        F.when(F.col("id") < 20_000, F.lit(0))
        .otherwise((F.col("id") % 9_999) + 1)
        .alias("user_id"),
        ((F.col("id") * 48271) % (7 * 86400)).alias("s"),
    ).select(
        "user_id", "s",
        (F.col("s") + 1 + (F.col("s") % 60)).alias("e"),
        (F.col("s") % 97).alias("span_meta"),
    )
    pts.groupBy("user_id").count().write.format("noop").mode("overwrite").save()  # warm
    got = intervals.point_in_interval_join(
        pts, spans, "t", "s", "e", keys=["user_id"], bucket_width=3600
    )
    matches = got.count()
    timed(
        f"point_in_interval {np_} pts (hot user: 50% pts + 20k short spans; "
        f"{matches} matches)",
        lambda: got.write.format("noop").mode("overwrite").save(),
    )
    timed(
        "  vs theta restatement (equi user + range predicate)",
        lambda: pts.join(
            spans, on=[pts.user_id == spans.user_id,
                       pts.t >= spans.s, pts.t < spans.e],
        ).drop(spans.user_id).write.format("noop").mode("overwrite").save(),
    )

    # --- 6. merge_intervals at the 50%-hot-group shape (r15 birth) ----
    # near-unique micro timestamps so the hot group's islands can't be
    # collapsed early; the naive form sorts the hot group's n/2 rows in
    # ONE task
    mi = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % span_us).alias("s"),
    ).select("g", "s", (F.col("s") + 1 + (F.col("s") % 120_000_000)).alias("e"))
    mi.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm
    timed(
        "merge_intervals SEGMENTED (ours, hour buckets)",
        lambda: intervals.merge_intervals(
            mi, ["g"], "s", "e", bucket_width=3_600_000_000
        ).write.format("noop").mode("overwrite").save(),
    )

    def naive_merge():
        w_p = Window.partitionBy("g").orderBy("s", "e").rowsBetween(
            Window.unboundedPreceding, -1
        )
        w_c = Window.partitionBy("g").orderBy("s", "e").rowsBetween(
            Window.unboundedPreceding, 0
        )
        f = mi.select(
            "g", "s", "e",
            F.when(
                F.col("s") > F.coalesce(F.max("e").over(w_p), F.lit(-(1 << 63))),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("st"),
        )
        return (
            f.select("g", "s", "e", F.sum("st").over(w_c).alias("isl"))
            .groupBy("g", "isl")
            .agg(F.min("s").alias("island_s"), F.max("e").alias("island_e"),
                 F.count("*").alias("n_merged"))
            .write.format("noop").mode("overwrite").save()
        )

    timed("merge_intervals NAIVE (one ordered window per group)", naive_merge)

    # --- 7. interval_gaps / interval_intersect (r15 births) -----------
    # SPARSE hot shape: tiny (~1ms) spans spread over 20 years so the
    # hot group keeps ~n/2 distinct ISLANDS — the gap pairing is then a
    # real second pass, and the naive LEAD window orders all of them in
    # ONE task (the merge underneath is segmented for both forms)
    span20y = 20 * 365 * 86_400 * 1_000_000
    sp = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 40).cast("string")))
        .alias("g"),
        ((F.col("id") * 2654435761) % span20y).alias("s"),
    ).select("g", "s", (F.col("s") + 1 + (F.col("s") % 1000)).alias("e"))
    sp.groupBy("g").count().write.format("noop").mode("overwrite").save()  # warm
    timed(
        "interval_gaps SEGMENTED lead (ours, hour buckets)",
        lambda: intervals.interval_gaps(
            sp, ["g"], "s", "e", bucket_width=3_600_000_000
        ).write.format("noop").mode("overwrite").save(),
    )

    def naive_gaps():
        isl = intervals.merge_intervals(
            sp, ["g"], "s", "e", bucket_width=3_600_000_000
        )
        w = Window.partitionBy("g").orderBy("island_s")
        return (
            isl.select(
                "g",
                F.col("island_e").alias("gap_s"),
                F.lead("island_s").over(w).alias("gap_e"),
            )
            .where(F.col("gap_e").isNotNull())
            .write.format("noop").mode("overwrite").save()
        )

    timed("interval_gaps NAIVE (segmented merge + one LEAD window per group)", naive_gaps)

    # intersect: ours end-to-end at the same sparse hot shape (two
    # offset copies so ~half the islands overlap); the theta-join
    # restatement is the plan-sweep-banned BNLJ at this cardinality
    # (10M x 10M islands on one key) and is not runnable
    sp_b = sp.select("g", (F.col("s") + 500).alias("s"), (F.col("e") + 500).alias("e"))
    timed(
        "interval_intersect SEGMENTED merge x2 + bucketed join (ours, day buckets)",
        lambda: intervals.interval_intersect(
            sp, sp_b, ["g"], "s", "e", bucket_width=86_400_000_000
        ).write.format("noop").mode("overwrite").save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
