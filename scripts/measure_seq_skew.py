#!/usr/bin/env python
"""Hot-key skew measurement for the per-key-window sequence family
(markov_transitions, interarrival_regularity, session_attribution,
top_event_paths): 20M synthetic events, ONE bot user holding 50% of
all rows, 10k organic users — the shape where a per-key window sort
becomes a single-task straggler.

Measures exact mode vs the (lossless since r13) segment_col lever and
VERIFIES bit-identical results at a smaller differential scale.
Results land in SCALE.md.

Usage: python scripts/measure_seq_skew.py [--rows 20000000] [--segments 20]
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
    ap.add_argument("--segments", type=int, default=20)
    ap.add_argument("--ops", default="markov,interarrival,session,paths")
    args = ap.parse_args()

    from aws_logs_to_parquet_converter_spark.operators.anomaly import (
        interarrival_regularity,
    )
    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        markov_transitions,
        session_attribution,
        top_event_paths,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="seq-skew", extra_conf={"spark.ui.enabled": "false"})
    n, nseg = args.rows, args.segments

    # deterministic synthetic: event i -> user (0 = the bot holding
    # 50%), timestamp spread over `nseg` day segments, 5 states
    def synth(rows):
        base = spark.range(rows)
        return (
            base.select(
                F.col("id").alias("eid"),
                F.when(F.col("id") % 2 == 0, 0)
                .otherwise(1 + F.pmod(F.hash("id"), 10_000))
                .alias("u"),
                F.timestamp_micros(
                    # interleave users across the whole span; seconds-
                    # scale steps so sessions/gaps are nontrivial
                    (F.col("id") * 37_000_000) % (nseg * 86_400_000_000)
                    + (F.col("id") * 1_009) % 1_000_000
                ).alias("ts"),
                F.concat(F.lit("s"), F.pmod(F.hash("id", F.lit(7)), 5)).alias(
                    "state"
                ),
            )
            .withColumn("seg", F.date_trunc("day", "ts"))
        )

    # correctness differential at 200k rows first: segmented == exact
    small = synth(200_000).cache()
    small.count()
    checks = {
        "markov": (
            lambda d, s: markov_transitions(d, "u", ["ts", "eid"], "state", segment_col=s)
        ),
        "interarrival": (
            lambda d, s: interarrival_regularity(d, "u", "ts", "eid", segment_col=s)
        ),
        "session": (
            lambda d, s: session_attribution(
                d, "u", "ts", "eid", "state", "s0", gap_seconds=600, segment_col=s
            )
        ),
        "paths": (
            lambda d, s: top_event_paths(
                d, "u", ["ts", "eid"], "state", top_k=50, segment_col=s
            )
        ),
    }
    for name in args.ops.split(","):
        fn = checks[name]
        exact = sorted(map(tuple, fn(small, None).collect()))
        segd = sorted(map(tuple, fn(small, "seg").collect()))
        assert exact == segd, f"{name}: segmented != exact at 200k rows"
        print(f"differential ok: {name} (200k rows, {nseg} segments)")
    small.unpersist()

    big = synth(n)
    big.write.mode("overwrite").parquet("/tmp/seq_skew_events")
    big = spark.read.parquet("/tmp/seq_skew_events")
    print(f"rows={n} bot_share=0.5 users=10001 segments={nseg}")

    for name in args.ops.split(","):
        fn = checks[name]
        for mode, segcol in (("exact", None), ("segmented", "seg")):
            t0 = time.perf_counter()
            fn(big, segcol).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{name:14s} {mode:9s} {dt:7.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
