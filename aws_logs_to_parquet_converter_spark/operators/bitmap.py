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


def _check_integral_slice(segments: DataFrame, slice_col: str, op: str) -> None:
    """Slice columns get cast to long for anchor arithmetic — a
    fractional slice would silently TRUNCATE (402.857 -> 402) and
    mis-slice with no error, so reject it loudly (same contract as
    the id check above)."""
    dt = segments.schema[slice_col].dataType
    if not isinstance(dt, _INTEGRAL):
        raise TypeError(
            f"{op}: slice_col {slice_col!r} must be integral epoch "
            f"days/weeks (got {dt.simpleString()!r}); floor/cast upstream"
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


def bitmap_intersect_cardinality(
    segments: DataFrame,
    group_cols: list[str],
    slice_col: str,
    slice_a,
    slice_b,
) -> DataFrame:
    """Exact |A ∩ B| per group from segments alone: the set
    intersection of two slices (weeks, cohorts, variants) is
    ``bit_and`` of their masks word-by-word — the retention/overlap
    question (\"users active in BOTH weeks\") answered without touching
    raw data, the second half of the BITMAP_UNION pattern
    (BITMAP_AND_COUNT in Doris/StarRocks terms).

    ``segments`` must carry ``slice_col`` as a grouping column of its
    build (one segment family per slice).  Absent words on either side
    count zero automatically; |A ∪ B| and difference cardinalities
    follow from the same segments via inclusion–exclusion with
    :func:`bitmap_merge` + :func:`bitmap_cardinality`.

    Single-lineage and duplicate-safe: instead of filtering
    ``segments`` twice and self-joining (two upstream evaluations —
    Spark never reuses the subtree — plus a fan-out if (group, slice,
    word) rows are duplicated, e.g. a unioned un-merged segment
    table), one conditional ``bit_or`` per (group, word) collapses
    both slices' masks in a single pass, OR-ing duplicates instead of
    pairing them.

    Returns (group..., n_both) — segment-sized work throughout.
    """
    sc = F.col(slice_col)
    paired = (
        segments.where(sc.isin([slice_a, slice_b]))
        .groupBy(*group_cols, "word")
        .agg(
            F.bit_or(F.when(sc == slice_a, F.col("mask"))).alias("_ma"),
            F.bit_or(F.when(sc == slice_b, F.col("mask"))).alias("_mb"),
        )
    )
    return (
        paired.where(F.col("_ma").isNotNull() & F.col("_mb").isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.sum(F.bit_count(F.col("_ma").bitwiseAND(F.col("_mb"))))
            .cast("long")
            .alias("n_both")
        )
        # omit empty intersections (two slices can share a 64-id WORD
        # while sharing no id — emitting n_both=0 there would diverge
        # from a set-semantics restatement; same rule as
        # bitmap_retention's n_retained > 0)
        .where(F.col("n_both") > 0)
    )


def bitmap_retention(
    segments: DataFrame,
    group_cols: list[str],
    slice_col: str,
) -> DataFrame:
    """Consecutive-slice retention from segments: for every slice s,
    the EXACT count of ids present in BOTH s−1 and s per group —
    week-over-week retained users straight from the bitmap MV.

    Single-lineage on ``segments`` (which is usually derived from a
    raw-data build): a self-join on (group, word, s−1) would evaluate
    the upstream build twice (the acf_stats lesson — Spark does not
    reuse aggregate subtrees across self-join sides), so each segment
    row instead emits two messages — (anchor=s, current) and
    (anchor=s+1, previous) — and one (group, anchor, word) aggregate
    pairs them; ``bit_and`` + popcount does the rest.  ``slice_col``
    must be integral (epoch weeks/days).
    """
    _check_integral_slice(segments, slice_col, "bitmap_retention")
    sc = F.col(slice_col).cast("long")
    msgs = segments.select(
        *group_cols,
        F.explode(
            F.array(
                F.struct(
                    sc.alias("_anchor"), F.lit(0).alias("_role"),
                    F.col("word").alias("_w"), F.col("mask").alias("_m"),
                ),
                F.struct(
                    (sc + 1).alias("_anchor"), F.lit(1).alias("_role"),
                    F.col("word").alias("_w"), F.col("mask").alias("_m"),
                ),
            )
        ).alias("_msg"),
    ).select(
        *group_cols,
        F.col("_msg._anchor").alias("_anchor"),
        F.col("_msg._role").alias("_role"),
        F.col("_msg._w").alias("_w"),
        F.col("_msg._m").alias("_m"),
    )
    paired = msgs.groupBy(*group_cols, "_anchor", "_w").agg(
        # bit_or, not max: if the caller hands a segment table with
        # duplicate (group, slice, word) rows (a unioned, un-merged
        # MV), the masks OR together instead of one winning silently.
        F.bit_or(F.when(F.col("_role") == 0, F.col("_m"))).alias("_cur"),
        F.bit_or(F.when(F.col("_role") == 1, F.col("_m"))).alias("_prev"),
    )
    return (
        paired.where(F.col("_cur").isNotNull() & F.col("_prev").isNotNull())
        .groupBy(*group_cols, "_anchor")
        .agg(
            F.sum(F.bit_count(F.col("_cur").bitwiseAND(F.col("_prev"))))
            .cast("long")
            .alias("n_retained")
        )
        .where(F.col("n_retained") > 0)
        .select(*group_cols, F.col("_anchor").alias(slice_col), "n_retained")
    )


def bitmap_rollup_cardinality(
    segments: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Exact distinct counts for EVERY ROLLUP prefix level ((g1..gn),
    (g1..gn−1), …, ()) from one pass over segments: grouping sets keep
    ``word`` in every set (a bitmap can only merge word-aligned), one
    ``bit_or`` aggregate serves all levels, then popcount per level.
    The hierarchical-dashboard shape — daily/weekly/global uniques —
    answered from the MV with a single segment-sized shuffle instead
    of one raw COUNT(DISTINCT) scan per level.

    ``gid`` encodes the level exactly like SQL's GROUPING(g1, …, gn)
    (leftmost column = most-significant bit; 0 = finest level), so an
    oracle's ``GROUP BY ROLLUP`` reproduces it literally.
    """
    n = len(group_cols)
    if n == 0:
        raise ValueError("bitmap_rollup_cardinality: group_cols must be non-empty")
    sets = [[*group_cols[:i], "word"] for i in range(n, -1, -1)]
    gid = F.lit(0)
    for i, c in enumerate(group_cols):
        gid = gid + F.grouping(c).cast("long") * F.lit(2 ** (n - 1 - i))
    merged = segments.groupingSets(sets, *group_cols, "word").agg(
        F.bit_or("mask").alias("_m"), gid.cast("long").alias("gid")
    )
    return merged.groupBy(*group_cols, "gid").agg(
        F.sum(F.bit_count("_m")).cast("long").alias("distinct_ids")
    )


def bitmap_rolling_active(
    segments: DataFrame,
    group_cols: list[str],
    slice_col: str,
    window_n: int,
) -> DataFrame:
    """Rolling ``window_n``-slice EXACT distinct actives per window-end
    slice, straight from bitmap segments: for every anchor a, the
    popcount of ``bit_or`` over the trailing slices (a−window_n+1 .. a]
    — WAU/MAU from the MV, where sliding-SUM tricks break because
    distinct does not pre-aggregate across overlapping windows.

    Shape: each segment row emits ``window_n`` messages (anchor =
    slice .. slice+window_n−1), one (group, anchor, word) ``bit_or``
    merges the overlapping slices (duplicate-(group, slice, word) rows
    OR together — same contract as :func:`bitmap_retention`), and
    ``sum(bit_count)`` finishes.  All work is segment-sized ×
    ``window_n``: the raw scan happened ONCE at :func:`bitmap_build`,
    and every re-windowing (7-day, 28-day) reuses the same segments —
    vs the explode-form ``timeseries.rolling_active_users``, which
    re-explodes distinct (user, day) PAIRS (data-shaped, and a hot
    day's users all land on that day's shuffle keys; here a hot day
    spreads across |ids|/64 word keys).

    Anchors are emitted for every window end a segment serves —
    including up to ``window_n``−1 slices past the last observed slice
    (those are real trailing-window counts for ends after the data
    stops).  Callers wanting only the observed calendar (plus
    zero-activity slices) bound with a spine join, exactly as the
    explode form does.  ``slice_col`` must be integral (epoch
    days/weeks).
    """
    if window_n < 1:
        raise ValueError(
            f"bitmap_rolling_active: window_n must be >= 1, got {window_n}"
        )
    _check_integral_slice(segments, slice_col, "bitmap_rolling_active")
    sc = F.col(slice_col).cast("long")
    msgs = segments.select(
        *group_cols,
        F.explode(F.sequence(sc, sc + F.lit(window_n - 1))).alias("_anchor"),
        F.col("word").alias("_w"),
        F.col("mask").alias("_m"),
    )
    merged = msgs.groupBy(*group_cols, "_anchor", "_w").agg(
        F.bit_or("_m").alias("_mm")
    )
    return (
        merged.groupBy(*group_cols, "_anchor")
        .agg(F.sum(F.bit_count("_mm")).cast("long").alias("active_ids"))
        .select(*group_cols, F.col("_anchor").alias(slice_col), "active_ids")
    )


def bitmap_first_seen(
    segments: DataFrame,
    group_cols: list[str],
    slice_col: str,
) -> DataFrame:
    """EXACT count of ids seen for the FIRST time in each slice, per
    group, straight from bitmap segments: the daily/weekly "new users"
    series — growth accounting's n_new — without a raw re-scan or a
    per-id min() pass over events.

    Shape: per (group, word) the cumulative ``bit_or`` of all EARLIER
    slices' masks is one ordered-window aggregate — partitioned by
    (group, word), so the window keys are |ids|/64-grained (a hot
    group spreads exactly as in :func:`bitmap_build`; no single-task
    funnel) and each partition holds at most |slices| rows
    (calendar-bounded at any data size).  An id is new in slice s iff
    its bit is set in mask(s) AND clear in the cumulative-before:
    ``mask & ~cum_prev``; popcount + sum finishes.  Duplicate
    (group, slice, word) rows are pre-merged (same contract as
    :func:`bitmap_retention`).

    Returns (group…, slice, n_new).  ``slice_col`` must be integral.
    """
    from pyspark.sql import Window

    _check_integral_slice(segments, slice_col, "bitmap_first_seen")
    merged = segments.groupBy(
        *group_cols, F.col(slice_col).cast("long").alias("_s"), "word"
    ).agg(F.bit_or("mask").alias("_m"))
    w = (
        Window.partitionBy(*group_cols, "word")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    new_bits = merged.select(
        *group_cols,
        "_s",
        # bitwise_not, not ~ (Column.__invert__ is logical NOT)
        F.col("_m")
        .bitwiseAND(F.bitwise_not(F.coalesce(F.bit_or("_m").over(w), F.lit(0).cast("long"))))
        .alias("_new"),
    )
    return (
        new_bits.groupBy(*group_cols, "_s")
        .agg(F.sum(F.bit_count("_new")).cast("long").alias("n_new"))
        .select(*group_cols, F.col("_s").alias(slice_col), "n_new")
    )


def bitmap_growth(
    segments: DataFrame,
    group_cols: list[str],
    slice_col: str,
) -> DataFrame:
    """The FULL growth-accounting decomposition — new / returning /
    resurrected / churned per slice — straight from bitmap segments,
    with no raw re-scan (r15; completes :func:`bitmap_first_seen`,
    which answers only n_new).  Word-wise set algebra per (group,
    word, slice):

    * ``new         = cur & ~cum_prev``  (never seen before)
    * ``returning   = cur & prev``       (also active at s−1)
    * ``resurrected = cur & cum_prev & ~prev``  (back after a gap)
    * ``churned     = prev & ~cur``      (active at s−1, absent at s —
      the verdict-item identity ``bit_and(mask(s−1), ~mask(s))``,
      attributed to s)

    where ``prev`` is the word's mask at exactly s−1 and ``cum_prev``
    the ``bit_or`` of all earlier slices.  Since churn must also be
    counted at slices where the word has NO row (the whole word went
    quiet, including the horizon slice after the last activity), every
    merged row is unioned with a (slice+1)-shifted copy carrying its
    mask as ``prev`` — gap and horizon rows materialize exactly where
    growth events exist and nowhere else, matching
    ``timeseries.growth_accounting``'s output surface row for row.

    Shape: everything is segment-sized — one merge aggregate, the
    shifted union (2× segment rows), one (group, word)-keyed ordered
    window over ≤ 2·|slices| rows (calendar-bounded; a hot group
    spreads across |ids|/64 word keys exactly as in
    :func:`bitmap_build`), and the final (group, slice) popcount sum.
    Duplicate (group, slice, word) rows pre-merge via ``bit_or`` (same
    contract as :func:`bitmap_retention`).

    Returns (group…, slice, n_new, n_returning, n_resurrected,
    n_churned), all BIGINT.  ``slice_col`` must be integral.
    """
    from pyspark.sql import Window

    _check_integral_slice(segments, slice_col, "bitmap_growth")
    zero = F.lit(0).cast("long")
    merged = segments.groupBy(
        *group_cols, F.col(slice_col).cast("long").alias("_s"), "word"
    ).agg(F.bit_or("mask").alias("_m"))
    cur_rows = merged.select(
        *group_cols, "_s", "word", F.col("_m").alias("_cur"), zero.alias("_prev")
    )
    shifted = merged.select(
        *group_cols,
        (F.col("_s") + 1).alias("_s"),
        "word",
        zero.alias("_cur"),
        F.col("_m").alias("_prev"),
    )
    both = cur_rows.unionByName(shifted).groupBy(*group_cols, "_s", "word").agg(
        F.bit_or("_cur").alias("_cur"), F.bit_or("_prev").alias("_prev")
    )
    w = (
        Window.partitionBy(*group_cols, "word")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.bit_or("_cur").over(w), zero)
    cur, prev = F.col("_cur"), F.col("_prev")
    # bitwise_not, not ~ (Column.__invert__ is logical NOT)
    classified = both.select(
        *group_cols,
        "_s",
        cur.bitwiseAND(F.bitwise_not(cum_prev)).alias("_new"),
        cur.bitwiseAND(prev).alias("_ret"),
        cur.bitwiseAND(cum_prev).bitwiseAND(F.bitwise_not(prev)).alias("_res"),
        prev.bitwiseAND(F.bitwise_not(cur)).alias("_chn"),
    )
    return (
        classified.groupBy(*group_cols, "_s")
        .agg(
            F.sum(F.bit_count("_new")).cast("long").alias("n_new"),
            F.sum(F.bit_count("_ret")).cast("long").alias("n_returning"),
            F.sum(F.bit_count("_res")).cast("long").alias("n_resurrected"),
            F.sum(F.bit_count("_chn")).cast("long").alias("n_churned"),
        )
        .select(
            *group_cols,
            F.col("_s").alias(slice_col),
            "n_new", "n_returning", "n_resurrected", "n_churned",
        )
    )
