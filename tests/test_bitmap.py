"""Exact distinct-count bitmaps (operators/bitmap.py): the shard/
merge/count chain must equal a raw COUNT(DISTINCT) bit-for-bit, merge
must be associative (daily→weekly→total == direct total), and the
integral/non-negative id contracts must fail loudly."""

import pytest
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators import bitmap


def _counts(df, cols):
    return {tuple(r[c] for c in cols[:-1]): r[cols[-1]] for r in df.collect()}


def test_cardinality_matches_count_distinct(spark):
    rows = [(g, i) for g in ("a", "b") for i in (0, 1, 63, 64, 65, 127, 128, 4096)]
    # duplicates must not double-count
    df = spark.createDataFrame(rows + rows, "g string, id long")
    segs = bitmap.bitmap_build(df, ["g"], "id")
    got = _counts(bitmap.bitmap_cardinality(segs, ["g"]), ["g", "distinct_ids"])
    assert got == {("a",): 8, ("b",): 8}


def test_bit63_sets_sign_bit_and_still_counts(spark):
    # id % 64 == 63 -> mask has bit 63 set -> negative BIGINT; bit_count
    # must still count it (two's-complement popcount).
    df = spark.createDataFrame([("g", 63), ("g", 62)], "g string, id long")
    segs = bitmap.bitmap_build(df, ["g"], "id")
    (row,) = segs.collect()
    assert row["word"] == 0 and row["mask"] < 0
    (c,) = bitmap.bitmap_cardinality(segs, ["g"]).collect()
    assert c["distinct_ids"] == 2


def test_merge_associative_daily_weekly_total(spark):
    rows = [(d, d * 13 % 200) for d in range(21) for _ in range(3)]
    df = spark.createDataFrame(rows, "day long, id long")
    daily = bitmap.bitmap_build(df, ["day"], "id")
    weekly = bitmap.bitmap_merge(
        daily.withColumn("week", F.floor(F.col("day") / 7).cast("long")), ["week"]
    )
    total_via_weeks = bitmap.bitmap_cardinality(
        bitmap.bitmap_merge(weekly.withColumn("all", F.lit(1)), ["all"]), ["all"]
    )
    direct = df.select("id").distinct().count()
    (r,) = total_via_weeks.collect()
    assert r["distinct_ids"] == direct


def test_negative_id_raises(spark):
    df = spark.createDataFrame([("g", -1)], "g string, id long")
    with pytest.raises(Exception, match="negative id"):
        bitmap.bitmap_build(df, ["g"], "id").collect()


def test_non_integral_id_rejected(spark):
    df = spark.createDataFrame([("g", 1.5)], "g string, id double")
    with pytest.raises(TypeError, match="integral"):
        bitmap.bitmap_build(df, ["g"], "id")


def test_null_ids_dropped_not_counted(spark):
    df = spark.createDataFrame([("g", 1), ("g", None)], "g string, id long")
    segs = bitmap.bitmap_build(df, ["g"], "id")
    (c,) = bitmap.bitmap_cardinality(segs, ["g"]).collect()
    assert c["distinct_ids"] == 1


def test_intersect_cardinality_matches_sets(spark):
    rows = [("g", "w1", i) for i in (0, 1, 63, 64, 200)] + [
        ("g", "w2", i) for i in (1, 63, 65, 200, 300)
    ]
    df = spark.createDataFrame(rows, "g string, w string, id long")
    segs = bitmap.bitmap_build(df, ["g", "w"], "id")
    (r,) = bitmap.bitmap_intersect_cardinality(
        segs, ["g"], "w", "w1", "w2"
    ).collect()
    assert r["n_both"] == 3  # {1, 63, 200}


def test_retention_matches_bruteforce(spark):
    # weeks 10,11,12: overlaps 10∩11={5,64}, 11∩12={} (words overlap,
    # bits don't: 70 vs 69 share word 1) -> week 12 row must NOT appear
    rows = (
        [("g", 10, i) for i in (5, 64, 99)]
        + [("g", 11, i) for i in (5, 64, 70)]
        + [("g", 12, i) for i in (69,)]
    )
    df = spark.createDataFrame(rows, "g string, wk long, id long")
    segs = bitmap.bitmap_build(df, ["g", "wk"], "id")
    got = {
        (r["g"], r["wk"]): r["n_retained"]
        for r in bitmap.bitmap_retention(segs, ["g"], "wk").collect()
    }
    assert got == {("g", 11): 2}


def test_retention_groups_do_not_cross(spark):
    rows = [("a", 1, 7), ("b", 2, 7)]
    df = spark.createDataFrame(rows, "g string, wk long, id long")
    segs = bitmap.bitmap_build(df, ["g", "wk"], "id")
    assert bitmap.bitmap_retention(segs, ["g"], "wk").count() == 0


def test_rollup_levels_match_bruteforce(spark):
    rows = [("a", 1, 0), ("a", 1, 64), ("a", 2, 64), ("b", 1, 0), ("b", 2, 200)]
    df = spark.createDataFrame(rows, "t string, w long, id long")
    segs = bitmap.bitmap_build(df, ["t", "w"], "id")
    got = {
        (r["t"], r["w"], r["gid"]): r["distinct_ids"]
        for r in bitmap.bitmap_rollup_cardinality(segs, ["t", "w"]).collect()
    }
    assert got == {
        ("a", 1, 0): 2, ("a", 2, 0): 1, ("b", 1, 0): 1, ("b", 2, 0): 1,
        ("a", None, 1): 2,  # {0, 64}
        ("b", None, 1): 2,  # {0, 200}
        (None, None, 3): 3,  # {0, 64, 200}
    }


def test_rollup_empty_group_cols_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "t string, id long")
    segs = bitmap.bitmap_build(df, ["t"], "id")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        bitmap.bitmap_rollup_cardinality(segs, [])


def test_retention_duplicate_segment_rows_or_together(spark):
    """r13 advisory: a unioned, un-merged segment table (duplicate
    (group, slice, word) rows) must OR masks, not let F.max pick one
    — otherwise retention silently undercounts."""
    df1 = spark.createDataFrame(
        [("g", 10, 5), ("g", 11, 5)], "g string, wk long, id long"
    )
    df2 = spark.createDataFrame(
        [("g", 10, 64), ("g", 11, 64), ("g", 10, 7), ("g", 11, 7)],
        "g string, wk long, id long",
    )
    dup_segs = bitmap.bitmap_build(df1, ["g", "wk"], "id").unionByName(
        bitmap.bitmap_build(df2, ["g", "wk"], "id")
    )
    # word 0 appears twice per (g, wk): {5} from df1, {7} from df2
    got = {
        (r["g"], r["wk"]): r["n_retained"]
        for r in bitmap.bitmap_retention(dup_segs, ["g"], "wk").collect()
    }
    assert got == {("g", 11): 3}  # {5, 7, 64} all retained


def test_intersect_duplicate_segment_rows_or_together(spark):
    df1 = spark.createDataFrame(
        [("g", "w1", 5), ("g", "w2", 5)], "g string, w string, id long"
    )
    df2 = spark.createDataFrame(
        [("g", "w1", 7), ("g", "w2", 7)], "g string, w string, id long"
    )
    dup_segs = bitmap.bitmap_build(df1, ["g", "w"], "id").unionByName(
        bitmap.bitmap_build(df2, ["g", "w"], "id")
    )
    (r,) = bitmap.bitmap_intersect_cardinality(
        dup_segs, ["g"], "w", "w1", "w2"
    ).collect()
    assert r["n_both"] == 2  # {5, 7} — a fan-out join would pair wrong


def test_rolling_active_matches_bruteforce(spark):
    rows = [
        ("g", 0, 1), ("g", 0, 2),
        ("g", 2, 2), ("g", 2, 64),
        ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, "g string, day long, id long")
    segs = bitmap.bitmap_build(df, ["g", "day"], "id")
    got = {
        (r["g"], r["day"]): r["active_ids"]
        for r in bitmap.bitmap_rolling_active(segs, ["g"], "day", 3).collect()
    }
    # brute force trailing-3 windows (anchors 0..7: day+2 max)
    by_day = {0: {1, 2}, 2: {2, 64}, 5: {1}}
    want = {}
    for a in range(0, 8):
        s = set()
        for d in range(a - 2, a + 1):
            s |= by_day.get(d, set())
        if s:
            want[("g", a)] = len(s)
    assert got == want
    # window_n=1 degenerates to per-slice cardinality
    got1 = {
        (r["g"], r["day"]): r["active_ids"]
        for r in bitmap.bitmap_rolling_active(segs, ["g"], "day", 1).collect()
    }
    assert got1 == {("g", 0): 2, ("g", 2): 2, ("g", 5): 1}


def test_rolling_active_duplicate_rows_or_together(spark):
    df1 = spark.createDataFrame([("g", 0, 5)], "g string, day long, id long")
    df2 = spark.createDataFrame([("g", 0, 7)], "g string, day long, id long")
    dup = bitmap.bitmap_build(df1, ["g", "day"], "id").unionByName(
        bitmap.bitmap_build(df2, ["g", "day"], "id")
    )
    got = {
        r["day"]: r["active_ids"]
        for r in bitmap.bitmap_rolling_active(dup, ["g"], "day", 2).collect()
    }
    assert got == {0: 2, 1: 2}


def test_rolling_active_bad_window_raises(spark):
    df = spark.createDataFrame([("g", 0, 1)], "g string, day long, id long")
    segs = bitmap.bitmap_build(df, ["g", "day"], "id")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="window_n"):
        bitmap.bitmap_rolling_active(segs, ["g"], "day", 0)


def test_first_seen_matches_min_day(spark):
    rows = [
        ("g", 0, 1), ("g", 0, 2),
        ("g", 1, 2), ("g", 1, 64),   # 64: new on day 1 (same word as 1,2)
        ("g", 3, 1), ("g", 3, 200),  # 200: new on day 3
        ("h", 2, 1),                 # group isolation: 1 is new in h too
    ]
    df = spark.createDataFrame(rows, "g string, day long, id long")
    segs = bitmap.bitmap_build(df, ["g", "day"], "id")
    got = {
        (r["g"], r["day"]): r["n_new"]
        for r in bitmap.bitmap_first_seen(segs, ["g"], "day").collect()
    }
    assert got == {("g", 0): 2, ("g", 1): 1, ("g", 3): 1, ("h", 2): 1}


def test_first_seen_agrees_with_growth_accounting(spark):
    import random

    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        growth_accounting,
    )

    rng = random.Random(3)
    rows = [(rng.randrange(100), rng.randrange(0, 15)) for _ in range(800)]
    df = spark.createDataFrame(rows, "id long, day long")
    segs = bitmap.bitmap_build(df, ["day"], "id")
    # bitmap emits explicit zero rows for active-but-nothing-new slices;
    # growth_accounting also emits churn-only slices — compare nonzero
    via_bitmap = {
        r["day"]: r["n_new"]
        for r in bitmap.bitmap_first_seen(segs, [], "day").collect()
        if r["n_new"] > 0
    }
    via_ga = {
        r["day"]: r["n_new"]
        for r in growth_accounting(df, "id", "day").collect()
        if r["n_new"] > 0
    }
    assert via_bitmap == via_ga


def test_first_seen_duplicate_rows_premerged(spark):
    df1 = spark.createDataFrame([("g", 0, 5), ("g", 1, 5)], "g string, day long, id long")
    df2 = spark.createDataFrame([("g", 0, 7)], "g string, day long, id long")
    dup = bitmap.bitmap_build(df1, ["g", "day"], "id").unionByName(
        bitmap.bitmap_build(df2, ["g", "day"], "id")
    )
    got = {
        r["day"]: r["n_new"]
        for r in bitmap.bitmap_first_seen(dup, ["g"], "day").collect()
    }
    assert got == {0: 2, 1: 0}  # 5 and 7 new on day 0; day 1 nothing new


def test_intersect_word_overlap_bit_disjoint_group_omitted(spark):
    """r14 review: ids 5 and 7 share word 0 but no id — the group must
    be OMITTED (set semantics), not emitted with n_both=0."""
    rows = [("g", "w1", 5), ("g", "w2", 7)]
    df = spark.createDataFrame(rows, "g string, w string, id long")
    segs = bitmap.bitmap_build(df, ["g", "w"], "id")
    assert bitmap.bitmap_intersect_cardinality(segs, ["g"], "w", "w1", "w2").count() == 0


def test_slice_integrality_guards(spark):
    df = spark.createDataFrame([("g", 1.5, 1)], "g string, sl double, id long")
    segs_like = bitmap.bitmap_build(df, ["g", "sl"], "id")
    import pytest as _pytest
    for fn in (
        lambda: bitmap.bitmap_retention(segs_like, ["g"], "sl"),
        lambda: bitmap.bitmap_rolling_active(segs_like, ["g"], "sl", 7),
        lambda: bitmap.bitmap_first_seen(segs_like, ["g"], "sl"),
    ):
        with _pytest.raises(TypeError, match="integral"):
            fn()


def test_bitmap_growth_analytic(spark):
    """id 1 active d0,d1,d3; id 2 active d1: d0 new=1; d1 new(2) +
    returning(1); d2 churned both; d3 resurrected(1); d4 churned(1)."""
    rows = [("g", 0, 1), ("g", 1, 1), ("g", 3, 1), ("g", 1, 2)]
    df = spark.createDataFrame(rows, "g string, day long, id long")
    segs = bitmap.bitmap_build(df, ["g", "day"], "id")
    got = {
        r["day"]: (r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"])
        for r in bitmap.bitmap_growth(segs, ["g"], "day").collect()
    }
    assert got == {
        0: (1, 0, 0, 0),
        1: (1, 1, 0, 0),
        2: (0, 0, 0, 2),
        3: (0, 0, 1, 0),
        4: (0, 0, 0, 1),
    }


def test_bitmap_growth_matches_growth_accounting_random(spark):
    """r15 (verdict item 5): the segment-MV decomposition must equal
    timeseries.growth_accounting row for row on shared inputs —
    including churn-only gap slices and the horizon row."""
    import random

    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        growth_accounting,
    )

    rng = random.Random(61)
    rows = [
        (f"k{rng.randrange(2)}", rng.randrange(0, 12), rng.randrange(0, 200))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, day long, id long")
    segs = bitmap.bitmap_build(df, ["g", "day"], "id")
    key = lambda r: (r["g"], r["day"])
    quad = lambda r: (
        r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"]
    )
    via_bitmap = {key(r): quad(r) for r in bitmap.bitmap_growth(segs, ["g"], "day").collect()}
    via_ga = {
        key(r): quad(r)
        for r in growth_accounting(df, "id", "day", ["g"]).collect()
    }
    assert via_bitmap == via_ga
    # the accounting identity: active(s) = new + returning + resurrected
    active = {}
    for g, d, i in rows:
        active.setdefault((g, d), set()).add(i)
    for (g, d), ids in active.items():
        n, r_, s, _ = via_bitmap[(g, d)]
        assert n + r_ + s == len(ids), (g, d)


def test_bitmap_growth_duplicate_rows_premerged(spark):
    df1 = spark.createDataFrame([("g", 0, 5), ("g", 1, 5)], "g string, day long, id long")
    df2 = spark.createDataFrame([("g", 0, 7)], "g string, day long, id long")
    dup = bitmap.bitmap_build(df1, ["g", "day"], "id").unionByName(
        bitmap.bitmap_build(df2, ["g", "day"], "id")
    )
    got = {
        r["day"]: (r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"])
        for r in bitmap.bitmap_growth(dup, ["g"], "day").collect()
    }
    # d0: 5,7 new; d1: 5 returning, 7 churned; d2: 5 churned
    assert got == {0: (2, 0, 0, 0), 1: (0, 1, 0, 1), 2: (0, 0, 0, 1)}


def test_bitmap_growth_slice_guard(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("g", 1.5, 1)], "g string, sl double, id long")
    segs_like = bitmap.bitmap_build(df, ["g", "sl"], "id")
    with _pytest.raises(TypeError, match="integral"):
        bitmap.bitmap_growth(segs_like, ["g"], "sl")
