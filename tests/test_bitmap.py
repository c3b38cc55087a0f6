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
