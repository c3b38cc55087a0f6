"""Exact distinct-count bitmaps: the BITMAP_UNION materialized-view
pattern (Doris/StarRocks/ClickHouse `groupBitmap`) expressed in pure
Catalyst — COUNT(DISTINCT id) made ADDITIVE so rollups re-aggregate
from tiny pre-built segments instead of re-scanning raw data.

Representation: a group's id set is sharded into 64-bit words —
``word = id >> 6`` and ``mask = bit_or(1 << (id & 63))`` — so one
(group, word) row covers 64 possible ids in 16 bytes.  The three
properties that make this a 100 TB lever:

* **Mergeable**: ``bit_or`` is associative/commutative, so daily
  segments roll up to weeks/months/arbitrary date ranges with a
  segment-sized (not data-sized) shuffle, and partial aggregation
  combines map-side.
* **Exact**: ``sum(bit_count(mask))`` is the true distinct count — no
  HLL error bar (the approximate sibling is
  ``plans/core*.q_hll_distinct_rollup``).
* **Bounded**: segment size is ``|distinct ids| / 64`` rows per group
  worst-case, and dense id spaces (the common dictionary-encoded
  user-id case) pack 64 ids per row.

Word/bit split uses arithmetic shift + bitwise AND (``id >> 6``,
``id & 63``) — exact for any non-negative 64-bit id.  Negative ids are
rejected up front (a negative id would alias another word under
arithmetic shift).

No reference counterpart — the reference (375 LoC,
s3_logs_to_parquet/compacter.py) has no distinct-count machinery;
this extends SURVEY §2.12's warehouse-ops family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def _check_integral(df: DataFrame, id_col: str) -> None:
    dt = df.schema[id_col].dataType
    if not isinstance(dt, _INTEGRAL):
        raise TypeError(
            f"bitmap ids must be integral (got {dt.simpleString()!r} for "
            f"{id_col!r}); hash or dictionary-encode non-integer ids first"
        )


def bitmap_build(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """Build bitmap segments: one row per (group..., word) with the
    64-id membership ``mask``.  This is the write-once MV pass — the
    only data-sized scan in the lifecycle; everything downstream
    touches segments only.

    The shuffle key is (group, word), so a hot group spreads across
    ``|ids|/64`` reducer keys instead of one — the build cannot
    single-key skew the way a naive ``collect_set`` would.
    """
    _check_integral(df, id_col)
    id_ = F.col(id_col).cast("long")
    return (
        df.where(id_.isNotNull())
        .where(
            F.assert_true(id_ >= 0, F.lit(f"bitmap_build: negative id in {id_col!r}")).isNull()
        )
        .groupBy(*group_cols, F.shiftright(id_, 6).alias("word"))
        .agg(
            # shiftleft's Python wrapper takes only a literal shift; the
            # SQL function accepts a column.
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(CAST(`{id_col}` AS BIGINT) & 63 AS INT))"
                )
            ).alias("mask")
        )
    )


def bitmap_merge(segments: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate segments to a coarser grouping (day→week, per-type
    →global, …): ``bit_or`` per (new group, word).  Segment-sized work
    regardless of how much raw data the segments summarize."""
    return segments.groupBy(*group_cols, "word").agg(F.bit_or("mask").alias("mask"))


def bitmap_cardinality(segments: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group from segments:
    ``sum(bit_count(mask))``.  ``bit_count`` counts set bits of the
    two's-complement pattern, so bit 63 (mask < 0) counts correctly."""
    return (
        segments.groupBy(*group_cols)
        .agg(F.sum(F.bit_count("mask")).cast("long").alias("distinct_ids"))
    )
