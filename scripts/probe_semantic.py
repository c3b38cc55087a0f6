#!/usr/bin/env python
"""Phase probe for q_semantic_dedup_clustered (r16 verdict item 4):
time each phase of similarity.semantic_dedup separately — (a) the
n_cells sizing count, (b) driver-side k-means training (sort+limit
collect + numpy iters), (c) the Arrow cell-assignment pass (persist +
eager count), (d) the blocked pair join + anti join to the noop sink —
so the optimization targets the measured phase, not a guess (guide §1).

Usage: python scripts/probe_semantic.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aws_logs_to_parquet_converter_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf

    spark = get_spark(app_name="probe_semantic", extra_conf={"spark.ui.enabled": "false"})
    from pyspark.sql import functions as F  # noqa: N812

    from aws_logs_to_parquet_converter_spark.operators import similarity
    from aws_logs_to_parquet_converter_spark.operators.partitioning import fan_out
    from aws_logs_to_parquet_converter_spark.plans.registry import t

    # bench.py-equivalent warmup (minus presto shim, unused here)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    emb = t(spark, sf_dir, "embeddings")
    emb.select(F.avg(F.element_at("embedding", 1))).collect()

    dim = emb.select(F.size("embedding")).first()[0]
    id_col, vec_col, threshold = "vec_id", "embedding", 0.4
    target_cell_size = 1000

    for rep in range(args.reps):
        spark.catalog.clearCache()
        times = {}

        t0 = time.monotonic()
        scorable = emb.where(F.col(vec_col).isNotNull())
        n = scorable.count()
        times["a_count"] = time.monotonic() - t0
        n_cells = max(1, -(-n // target_cell_size))
        sample_n = max(2048, 8 * n_cells)

        t0 = time.monotonic()
        cents = similarity.kmeans_cell_centroids(
            scorable, id_col, vec_col, n_cells, sample_n, iters=5, seed=42,
            hash_fn="xxhash64",
        )
        times["b_kmeans"] = time.monotonic() - t0

        t0 = time.monotonic()
        cell = F.element_at(similarity._cell_udf(cents, 1)(F.col(vec_col)), 1)
        base = fan_out(scorable, id_col).select(
            F.col(id_col).alias("_sid"),
            F.col(vec_col).alias("_v"),
            similarity._norm(F.col(vec_col), dim).alias("_nrm"),
            cell.alias("_cell"),
        ).persist()
        base.count()
        times["c_arrow_assign"] = time.monotonic() - t0

        t0 = time.monotonic()
        pairs = similarity.blocked_all_pairs(base, "_sid", 4, 42, key_cols=["_cell"])
        sim = F.coalesce(
            F.nanvl(
                F.try_divide(
                    similarity._dot(F.col("_v_l"), F.col("_v_r"), None),
                    F.col("_nrm_l") * F.col("_nrm_r"),
                ),
                F.lit(0.0),
            ),
            F.lit(0.0),
        )
        drops = (
            pairs.where(sim >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        kept = emb.join(drops, id_col, "left_anti").select("vec_id", "label")
        kept.write.format("noop").mode("overwrite").save()
        times["d_pairs_anti"] = time.monotonic() - t0

        base.unpersist()
        total = sum(times.values())
        print(
            f"rep {rep}: total {total:6.2f}s  "
            + "  ".join(f"{k}={v:6.2f}" for k, v in times.items()),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
