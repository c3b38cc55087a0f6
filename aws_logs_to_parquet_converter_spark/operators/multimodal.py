"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star operator set).

The Spark-side mechanics are real and tested — schema contract,
Arrow-batched ``mapInPandas`` fan-out, batch-size control, partition
sizing — while the codec step itself is stubbed (no image/audio
libraries in this container): ``decode_stub=True`` produces
deterministic fake features; ``decode_stub=False`` raises
``NotImplementedError`` at the exact seam where a production deploy
plugs Pillow/torchaudio/ffmpeg into the pandas iterator.

Scale notes: binary payloads dominate partition size, so the entry
point re-splits by target bytes before the Python stage
(``repartition`` on a byte-budget estimate), and features travel back
as fixed-width arrays — never re-serialized blobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The asset table contract: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", StringType(), True),  # binary in prod; str stand-in ok
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8


def _stub_feature(payload: bytes) -> list[float]:
    """Deterministic fake embedding: byte-histogram folded to FEATURE_DIM.
    Stands in for a real encoder; stable across runs/partitions."""
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] = (acc[i % FEATURE_DIM] + b) % 997
    total = float(sum(acc)) or 1.0
    return [a / total for a in acc]


def extract_features(
    df: DataFrame,
    decode_stub: bool = True,
    target_partition_bytes: int = 64 * 1024 * 1024,
    batch_rows: int = 64,
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` streams row batches through Python once — the only
    sanctioned Python crossing in the engine, used exactly where JVM
    expressions cannot express the work (codec calls).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                payloads = [
                    p.encode() if isinstance(p, str) else (bytes(p) if p is not None else b"")
                    for p in chunk["payload"]
                ]
                if not decode_stub:
                    raise NotImplementedError(
                        "real decode needs an image/audio codec library; "
                        "plug it in here (this container ships none)"
                    )
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "media_type": chunk["media_type"],
                        "n_bytes": [len(p) for p in payloads],
                        "feature": [_stub_feature(p) for p in payloads],
                    }
                )

    # Size the Python stage by payload bytes, not row count: a 100 TB
    # corpus with MB-scale payloads needs ~byte-balanced partitions.
    stats = df.select(F.sum(F.length("payload")).alias("total")).first()
    total_bytes = stats["total"] or 0
    n_parts = max(1, int(total_bytes / target_partition_bytes))
    sized = df.repartition(n_parts) if n_parts != df.rdd.getNumPartitions() else df
    return sized.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Post-extraction rollup, back in pure JVM expressions."""
    return features.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg(F.element_at("feature", 1)).alias("mean_f0"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", StringType(), True),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Image resize seam: metadata transform is real (aspect-aware
    target dims); pixel resampling is the stubbed codec step.  The
    stub re-emits the payload with a deterministic marker so the
    pipeline shape (schema in, schema out, same row count) is testable
    without an image library."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize needs an image codec (e.g. Pillow)")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [f"resized[{target_w}x{target_h}]:" + (p or "") for p in pdf["payload"]],
                }
            )

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("payload", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    The fan-out (rows-per-asset = duration/every_ms) is computed with
    native explode(sequence) BEFORE the Python stage, so partition
    sizing sees the real output cardinality; only the per-frame decode
    is stubbed."""
    frames = df.where(F.col("media_type") == "video").select(
        "asset_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.coalesce("duration_ms", F.lit(0)) / every_ms).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame extraction needs a video codec (e.g. ffmpeg)")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "payload": [
                        f"frame@{t}:" + (p or "")[:16]
                        for t, p in zip(pdf["ts_ms"], pdf["payload"])
                    ],
                }
            )

    return frames.mapInPandas(run, schema=FRAME_SCHEMA)
