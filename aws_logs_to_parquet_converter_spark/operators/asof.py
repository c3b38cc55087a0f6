"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key (SURVEY §2.3 "as-of (nearest config snapshot <=
event time)").

Spark has no native ASOF JOIN.  A naive implementation is a range
self-join (quadratic blow-up) or a join + groupBy-max + re-join (three
shuffles).  This one is the single-shuffle union trick:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, tag)
      -> last(right payload, ignorenulls) over rows unbounded preceding
      -> keep tag=1 rows

One exchange on the key, linear state, no row explosion — the shape
that survives 100 TB.  Right rows sort before left rows at equal ts
(tag 0 < 1), so an exactly-simultaneous right row IS visible to the
left row (<= semantics, matching DuckDB/Pandas ASOF backward joins).

Tie caveat: two right rows with identical (key, ts) are ordered
arbitrarily; the later one in window order wins.  Use a unique
timestamp or pre-dedupe if that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str | Column,
    right_on: str | Column,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Return ``left`` plus, per row, the latest ``right_payload`` values
    from the right row with equal key and ``right_ts <= left_ts``
    (NULLs where no such row exists)."""
    lk = F.col(left_on) if isinstance(left_on, str) else left_on
    rk = F.col(right_on) if isinstance(right_on, str) else right_on

    l_tag = left.select(
        lk.alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_payload],
    )
    r_tag = right.select(
        rk.alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_tag",
        *[F.col(c) for c in left.columns],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return filled.where(F.col("_tag") == 1).drop("_tag")
