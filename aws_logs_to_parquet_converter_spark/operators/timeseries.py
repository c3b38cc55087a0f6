"""Time-series gap fill: dense per-bucket aggregates over a generated
time spine — the dashboard/alerting shape where a MISSING hour must
read 0, not vanish (a naive GROUP BY emits no row for an hour with no
events, and a downstream rate alert then sees nothing instead of a
zero).

Spine construction is one ``sequence()`` over the observed (or given)
bounds exploded into rows — |buckets| rows, data-independent — crossed
with the (small, distinct) key dimension and left-joined against the
real aggregate.  At 100 TB the aggregate is the only data-sized pass
(map-side partial combine); the spine join is a broadcast of
|buckets| x |keys| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"hour": "hours", "day": "days", "minute": "minutes"}


def time_spine(
    df: DataFrame,
    ts_col: str,
    unit: str = "hour",
) -> DataFrame:
    """One row per ``unit`` bucket between the frame's min and max
    timestamp (inclusive): column ``bucket`` (timestamp).  Bounds come
    from one 2-value aggregate; the spine itself is a ``sequence``
    explode — never a data-sized operation."""
    if unit not in _UNITS:
        raise ValueError(f"time_spine: unit must be one of {sorted(_UNITS)}, got {unit!r}")
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("_hi"),
    )
    if unit == "hour":
        interval = F.make_dt_interval(hours=F.lit(1))
    elif unit == "day":
        interval = F.make_dt_interval(days=F.lit(1))
    else:
        interval = F.make_dt_interval(mins=F.lit(1))
    return bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), interval)).alias("bucket")
    )


def gap_filled_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str] | None = None,
    unit: str = "hour",
    aggs: dict | None = None,
) -> DataFrame:
    """Dense per-bucket (x per-key) aggregates: every bucket in the
    observed span appears for every observed key combination, zero/NULL
    filled.  ``aggs`` maps output column -> (agg, fill): each ``agg``
    is any aggregate Column, ``fill`` the literal for absent buckets
    (default one ``n_events`` count filled with 0).

    The real aggregation runs FIRST (map-side combine on the data), the
    spine joins AFTER against |buckets| x |keys| rows — broadcast, so
    the dense frame never shuffles the fact table a second time.
    """
    key_cols = list(key_cols or [])
    if aggs is None:
        aggs = {"n_events": (F.count("*"), 0)}
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    agg_cols = [a.alias(name) for name, (a, _) in aggs.items()]
    real = df.groupBy(bucket, *key_cols).agg(*agg_cols)

    spine = time_spine(df, ts_col, unit)
    if key_cols:
        keys = df.select(*key_cols).distinct()
        spine = spine.crossJoin(F.broadcast(keys))
    # the LEFT side of a left-outer join cannot be the build side; the
    # aggregate (right) is the broadcastable one and AQE picks that up
    # (plan-verified: LeftOuter BuildRight over the spine stream)
    dense = spine.join(real, ["bucket", *key_cols], "left")
    return dense.select(
        "bucket",
        *key_cols,
        *[
            F.coalesce(F.col(name), F.lit(fill)).alias(name)
            for name, (_, fill) in aggs.items()
        ],
    )


def rolling_active_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day active users (WAU/MAU): for every day in the
    observed span, the count of DISTINCT users active in the trailing
    ``window_days`` window — the metric where sliding-SUM tricks break
    (distinct does not pre-aggregate across overlapping windows).

    Shape: events collapse to distinct (user, day) pairs FIRST (the
    only pass over the fact table), each pair then contributes to the
    ``window_days`` window-end days it falls in (a bounded explode of
    users x days x N rows — never raw events), and one
    count-distinct-per-day aggregate finishes.  Days with no activity
    in their whole trailing window read 0 via the day spine.
    """
    if window_days < 1:
        raise ValueError(f"rolling_active_users: window_days must be >= 1, got {window_days}")
    ud = df.select(
        F.date_trunc("day", F.col(ts_col)).alias("_day"),
        F.col(user_col).alias("_user"),
    ).distinct()
    contrib = ud.select(
        F.explode(
            F.sequence(
                F.col("_day"),
                F.col("_day") + F.make_dt_interval(days=F.lit(window_days - 1)),
                F.make_dt_interval(days=F.lit(1)),
            )
        ).alias("bucket"),
        "_user",
    )
    wau = contrib.groupBy("bucket").agg(
        F.countDistinct("_user").alias(f"active_{window_days}d")
    )
    spine = time_spine(df, ts_col, "day")
    return spine.join(wau, "bucket", "left").select(
        "bucket",
        F.coalesce(f"active_{window_days}d", F.lit(0)).alias(
            f"active_{window_days}d"
        ),
    )
