#!/usr/bin/env python
"""sf1 envelope measurement for fuzzy_self_pairs at max_dist=2 under
the r12 budget (max_len defaults to 64 for d=2): the r12 verdict's
item 7 — show wall tracks output pairs at d=2, not the variant
explosion.

Input: the distinct sf1 customer names ("Customer#000000001",
18 chars) — the near-identical-record entity-resolution shape where
the d<=2 neighborhood is DENSE (every id has dozens of real digit-
substitution matches), so the wall is dominated by emitted pairs,
which is exactly the claim under test.

Usage: python scripts/measure_fuzzy_d2.py [--sf /tmp/sf1]
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
    ap.add_argument("--sf", default="/tmp/sf1")
    args = ap.parse_args()

    from aws_logs_to_parquet_converter_spark.operators.fuzzy import (
        fuzzy_self_pairs,
    )
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-d2", extra_conf={"spark.ui.enabled": "false"})
    cust = spark.read.parquet(f"{args.sf}/customer.parquet")
    words = cust.select(F.col("c_name").alias("w")).distinct().cache()
    n = words.count()
    for d in (1, 2):
        t0 = time.perf_counter()
        pairs = fuzzy_self_pairs(words, "w", "w", max_dist=d)
        npairs = pairs.count()
        print(
            f"d={d}: {n} distinct words -> {npairs} pairs "
            f"in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
