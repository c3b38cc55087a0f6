#!/usr/bin/env python
"""One-off sf1 generator for scale-validation benches (round-5 verdict
item 3): 10x the driver's sf0.1 tables by unioning key-shifted copies,
so the sf1 bench measures the ENGINE's scaling, not a new data
distribution.

Methodology (mirrors how TPC-H itself scales):
  * region/nation stay constant (fixed dimensions at every SF);
  * fact/dim keys shift by copy_index * stride per copy, preserving
    join fan-in (each order still has its customer, every lineitem its
    part/supplier) and group cardinalities scale linearly;
  * document text gets a per-copy suffix token so content-dedup
    workloads scale LINEARLY (verbatim replication would square the
    near-duplicate pair count — an artifact, not a workload);
  * events/embeddings shift ids only (timestamps and vectors are
    already iid across rows).

Usage: python scripts/make_sf1.py [dest_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 100_000_000  # far above any sf0.1 key

# per-table integer key columns to shift per copy
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
CONSTANT = ["region", "nation"]


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    # invalidate any prior build FIRST: a rerun that crashes mid-way
    # must not leave a stale sentinel blessing a half-rewritten mix
    try:
        os.remove(f"{dest}/_SF1_COMPLETE")
    except FileNotFoundError:
        pass
    spark = get_spark(app_name="make_sf1", extra_conf={"spark.ui.enabled": "false"})
    for name in CONSTANT:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{dest}/{name}.parquet"
        )
        print(f"{name}: copied")
    for name, keys in SHIFT_COLS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        keys = [k for k in keys if k in base.columns]
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if name == "documents" and i > 0:
                # keep dedup pair counts linear in SF (see module doc)
                c = c.withColumn("text", F.concat("text", F.lit(f" c{i}"))).withColumn(
                    "n_chars", F.col("n_chars") + F.lit(len(f" c{i}"))
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        print(f"{name}: {out.count()} rows ({COPIES}x)")
    # sentinel marks a COMPLETE build: the Makefile gates regeneration
    # on this file, so a crashed partial build is rebuilt, not reused
    with open(f"{dest}/_SF1_COMPLETE", "w") as fh:
        fh.write("ok\n")
    spark.stop()


if __name__ == "__main__":
    main()
