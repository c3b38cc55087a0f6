"""Streaming count-min-segment materialized view: maintain
``sketch.count_min_build_sliced`` segments incrementally from a
stream (``foreachBatch`` merge per micro-batch) — the FREQUENCY member
of the streaming-MV family beside ``bitmap_mv`` (exact distinct).

Crash-safety reuses the versioned-commit protocol
(``streaming/dimension.py``): every merge writes a NEW ``v-<ver>`` dir
and flips the single-row params pointer LAST.  One contract is
STRONGER here than in the bitmap case: CMS counters are ADDITIVE, not
idempotent — ``bit_or`` of replayed bits is a no-op, but SUMMING a
replayed batch double-counts silently.  The params row therefore
carries ``last_batch_id``, and ``apply_cms_batch`` SKIPS any batch id
at or below it: Structured Streaming's foreachBatch is at-least-once
with deterministic, monotonically increasing batch ids, so the guard
turns replay into a no-op and the MV is exactly-once.

Scale: each micro-batch shuffles only its OWN segments (batch-sized,
map-side combined on (slice, d, bucket)) plus the state read; state is
bounded by |slices| × depth × width rows regardless of stream volume
(the CMS contract).  The full-state rewrite per commit mirrors the
dimension case; partition the MV path by a slice hash to rewrite only
touched slices when |slices| is large (SCALE.md).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from aws_logs_to_parquet_converter_spark.operators.sketch import (
    count_min_build_sliced,
)
from aws_logs_to_parquet_converter_spark.operators.versioned import (
    write_params,
    prune_stale_versions,
)


def cms_mv_exists(spark: SparkSession, mv_path: str) -> bool:
    """True iff a committed MV lives at ``mv_path`` (the bitmap_mv
    bootstrap contract: transient read failures against an existing MV
    must abort, never reset)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{mv_path}/params")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_cms_mv(spark: SparkSession, mv_path: str) -> DataFrame:
    """Live segment table (slice…, d, bucket, cnt), pointer-resolved.
    Filter to a slice range and feed ``sketch.count_min_merge`` +
    ``count_min_estimate`` for frequency answers."""
    ver = spark.read.parquet(f"{mv_path}/params").first()["version"]
    return spark.read.parquet(f"{mv_path}/v-{ver}/data")


def _last_batch_id(spark: SparkSession, mv_path: str) -> int:
    return int(
        spark.read.parquet(f"{mv_path}/params").first()["last_batch_id"]
    )


def apply_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    mv_path: str,
    slice_cols: Sequence[str],
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    prune: bool = True,
) -> None:
    """Fold ONE batch of raw (slice…, key) rows into the segment MV:
    build the batch's own segments, SUM them with the live state,
    versioned commit carrying ``last_batch_id``.  A batch id at or
    below the committed one is a REPLAY and is skipped (additive
    counters double-count on re-apply; idempotency must come from the
    guard, not the algebra).  Bootstrap on first use."""
    slice_cols = list(slice_cols)
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    exists = cms_mv_exists(spark, mv_path)
    if exists and batch_id <= _last_batch_id(spark, mv_path):
        return
    segs = count_min_build_sliced(
        batch_df, slice_cols, key_col, depth=depth, width=width, seed=seed
    )
    if exists:
        segs = (
            read_cms_mv(spark, mv_path)
            .unionByName(segs)
            .groupBy(*slice_cols, "d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    ver = uuid.uuid4().hex[:12]
    segs.write.mode("overwrite").parquet(f"{mv_path}/v-{ver}/data")
    # the COMMIT: pointer + replay watermark last (a crash before this
    # line leaves readers on the previous complete version, and the
    # replayed batch re-applies against that same previous state)
    write_params(
        spark, f"{mv_path}/params", (ver, int(batch_id)),
        "version string, last_batch_id long",
    )
    if prune:
        prune_stale_versions(spark, mv_path, ver)


def stream_cms_segments(
    events: DataFrame,
    mv_path: str,
    slice_cols: Sequence[str],
    key_col: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    trigger: dict | None = None,
    prune: bool = True,
) -> StreamingQuery:
    """Maintain the sliced CMS segment MV at ``mv_path`` from a
    streaming frame of raw (slice…, key) rows.  Query the result with
    ``read_cms_mv`` + ``count_min_merge`` + ``count_min_estimate``."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_cms_batch(
            batch_df,
            batch_id,
            mv_path,
            slice_cols,
            key_col,
            depth=depth,
            width=width,
            seed=seed,
            prune=prune,
        )

    writer = events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
