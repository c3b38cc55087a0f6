#!/usr/bin/env python
"""Repeated-measure bench for optimization A/B: bench.py's warmup, then
each named query executed --reps times to the noop sink, reps
interleaved across queries (noise bursts hit all queries evenly, not
one). Reports min/median per query plus a JSON line.

A 'control' query that is NOT being changed should always be included
so host drift between two invocations is visible (guide §1: measure,
and know when the measurement is the thing that moved).

Usage: python scripts/ab_bench.py q_bm25_topk q01_pricing_summary --reps 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aws_logs_to_parquet_converter_spark.plans import REGISTRY  # noqa: E402
from aws_logs_to_parquet_converter_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf

    spark = get_spark(app_name="ab_bench", extra_conf={"spark.ui.enabled": "false"})

    from pyspark.sql import functions as F  # noqa: N812

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from aws_logs_to_parquet_converter_spark.functions.presto_compat import (
        register_presto_compat,
    )
    from aws_logs_to_parquet_converter_spark.plans.registry import t as _t

    register_presto_compat(spark)
    _t(spark, sf_dir, "events").count()
    _t(spark, sf_dir, "documents").select(F.sum(F.length("text"))).collect()
    _t(spark, sf_dir, "embeddings").select(F.avg(F.element_at("embedding", 1))).collect()

    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR") or os.path.join(
        os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_sf):
        warm_sf = "/root/testdata/sf0.001"
    for name in args.names:
        try:
            REGISTRY[name].builder(spark, warm_sf).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    times = defaultdict(list)
    for rep in range(args.reps):
        for name in args.names:
            q = REGISTRY[name]
            t0 = time.perf_counter()
            q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()

    out = {}
    for name in args.names:
        ts = times[name]
        out[name] = {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "all": ts,
        }
        print(f"{name:36s} min={min(ts):7.3f} med={statistics.median(ts):7.3f} all={ts}")
    print(json.dumps({"ab": out, "load": os.getloadavg()}))
    spark.stop()


if __name__ == "__main__":
    main()
