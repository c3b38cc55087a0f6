"""Round-11 operators: SCD merges, fuzzy edit-distance join, MAD
outliers — semantics pinned by hand-built micro-cases plus a
brute-force differential for the fuzzy blocking (the recall property
the deletion-neighborhood join must never lose)."""

import random

import pytest
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.anomaly import mad_outliers
from aws_logs_to_parquet_converter_spark.operators.fuzzy import (
    fuzzy_join,
    fuzzy_self_pairs,
)
from aws_logs_to_parquet_converter_spark.operators.scd import (
    scd2_merge,
    upsert_snapshot,
)


# ---------------------------------------------------------------------------
# SCD
# ---------------------------------------------------------------------------


@pytest.fixture()
def hist(spark):
    return spark.createDataFrame(
        [
            (1, "A", "2023-01-01", None),  # open, will be unchanged
            (2, "B", "2023-01-01", None),  # open, will change
            (3, "OLD", "2022-01-01", "2023-01-01"),  # closed passthrough
            (3, "C", "2023-01-01", None),  # open, no update
        ],
        "k long, attr string, valid_from string, valid_to string",
    )


def test_scd2_merge_semantics(spark, hist):
    upd = spark.createDataFrame(
        [
            (1, "A", "2024-01-01"),  # no-op update
            (2, "B1", "2023-06-01"),  # superseded within the batch
            (2, "B2", "2024-01-01"),  # latest wins
            (4, "D", "2024-01-01"),  # brand-new key
        ],
        "k long, attr string, ts string",
    )
    out = {
        (r.k, r.attr): (r.valid_from, r.valid_to)
        for r in scd2_merge(hist, upd, ["k"], ["attr"], "ts").collect()
    }
    assert out == {
        (1, "A"): ("2023-01-01", None),  # unchanged stays open
        (2, "B"): ("2023-01-01", "2024-01-01"),  # closed at update ts
        (2, "B2"): ("2024-01-01", None),  # new open version
        (3, "OLD"): ("2022-01-01", "2023-01-01"),  # closed passthrough
        (3, "C"): ("2023-01-01", None),  # no update -> open
        (4, "D"): ("2024-01-01", None),  # insert
    }


def test_scd2_merge_null_attr_change_detected(spark, hist):
    # NULL -> value and value -> NULL both count as changes (null-safe <=>)
    h = spark.createDataFrame(
        [(1, None, "2023-01-01", None)],
        "k long, attr string, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame([(1, "X", "2024-01-01")], "k long, attr string, ts string")
    rows = sorted(
        scd2_merge(h, upd, ["k"], ["attr"], "ts").collect(),
        key=lambda r: (r.valid_from,),
    )
    assert [(r.attr, r.valid_to) for r in rows] == [(None, "2024-01-01"), ("X", None)]


def test_upsert_snapshot_latest_wins(spark):
    snap = spark.createDataFrame(
        [(1, "A", "2023-01-01"), (2, "B", "2023-01-01")],
        "k long, attr string, ts string",
    )
    upd = spark.createDataFrame(
        [(2, "B1", "2023-06-01"), (2, "B2", "2024-01-01"), (3, "C", "2024-01-01")],
        "k long, attr string, ts string",
    )
    out = {r.k: (r.attr, r.ts) for r in upsert_snapshot(snap, upd, ["k"], "ts").collect()}
    assert out == {
        1: ("A", "2023-01-01"),
        2: ("B2", "2024-01-01"),
        3: ("C", "2024-01-01"),
    }


def test_scd2_merge_empty_tracked_cols_raises(spark, hist):
    upd = spark.createDataFrame([(1, "X", "t")], "k long, attr string, ts string")
    with pytest.raises(ValueError, match="tracked_cols"):
        scd2_merge(hist, upd, ["k"], [], "ts")


def test_upsert_snapshot_column_mismatch_raises(spark):
    snap = spark.createDataFrame([(1, "A")], "k long, attr string")
    upd = spark.createDataFrame([(1, "A", "t")], "k long, attr string, ts string")
    with pytest.raises(ValueError, match="column mismatch"):
        upsert_snapshot(snap, upd, ["k"], "ts")


# ---------------------------------------------------------------------------
# Fuzzy join
# ---------------------------------------------------------------------------


def test_fuzzy_self_pairs_known_case(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "mitten"), (5, "xyz")],
        "id long, s string",
    )
    got = {(r.id_a, r.id_b, r.dist) for r in fuzzy_self_pairs(df, "id", "s", 1).collect()}
    assert got == {(1, 2, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1)}
    got2 = {(r.id_a, r.id_b, r.dist) for r in fuzzy_self_pairs(df, "id", "s", 2).collect()}
    assert got2 == got | {(1, 3, 2), (3, 4, 2)}


def test_fuzzy_join_differential_vs_bruteforce(spark):
    """Recall-exactness: blocked join == brute force on random strings
    (short alphabet forces many near-misses at every distance)."""

    def brute(rows, d):
        import difflib  # noqa: F401  (stdlib only; levenshtein by DP below)

        def lev(a, b):
            la, lb = len(a), len(b)
            prev = list(range(lb + 1))
            for i in range(1, la + 1):
                cur = [i] + [0] * lb
                for j in range(1, lb + 1):
                    cur[j] = min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (a[i - 1] != b[j - 1]),
                    )
                prev = cur
            return prev[lb]

        return {
            (i, j, lev(a, b))
            for (i, a) in rows
            for (j, b) in rows
            if i < j and lev(a, b) <= d
        }

    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_self_pairs(df, "id", "s", d).collect()
        }
        assert got == brute(rows, d), f"d={d}"


def test_fuzzy_join_two_tables_and_bounds(spark):
    l = spark.createDataFrame([(1, "alpha")], "lid long, name string")
    r = spark.createDataFrame(
        [(10, "alpha"), (11, "alphas"), (12, "beta")], "rid long, name string"
    )
    got = {
        (x.lid, x.rid, x.dist)
        for x in fuzzy_join(l, r, "lid", "rid", "name", "name", 1).collect()
    }
    assert got == {(1, 10, 0), (1, 11, 1)}
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(l, r, "lid", "rid", "name", "name", 3)


def test_fuzzy_join_max_len_cutoff(spark):
    # >max_len strings are excluded from matching (declared domain
    # cutoff), short ones still match; max_len < 1 raises
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "x" * 600), (4, "x" * 600 + "y")],
        "id long, s string",
    )
    got = {(r.id_a, r.id_b) for r in fuzzy_self_pairs(df, "id", "s", 1).collect()}
    assert got == {(1, 2)}
    longer = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_pairs(df, "id", "s", 1, max_len=1000).collect()
    }
    assert longer == {(1, 2), (3, 4)}
    with pytest.raises(ValueError, match="max_len"):
        fuzzy_self_pairs(df, "id", "s", 1, max_len=0)


def test_fuzzy_join_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ac")], "id long, s string")
    plan = fuzzy_self_pairs(df, "id", "s", 1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_the_planted_spike(spark):
    # 99 values in [0, 98] plus one at 10_000: median 49.5, MAD ~25 ->
    # the spike's modified z is huge, nothing else crosses 3.5
    rows = [(i, "g", i) for i in range(99)] + [(99, "g", 10_000)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = mad_outliers(df, "v", by=["g"], k=3.5).collect()
    assert [r.id for r in out] == [99]
    assert out[0].med == 49.5 and out[0].mad > 0 and out[0].mz > 3.5


def test_mad_outliers_degenerate_mad_zero_group(spark):
    # >half identical values -> MAD 0 -> off-median values flag with
    # signed infinity, the documented convention
    rows = [(i, 5) for i in range(10)] + [(10, 6), (11, 1)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = {r.id: r.mz for r in mad_outliers(df, "v", by=None, k=3.5).collect()}
    assert out == {10: float("inf"), 11: float("-inf")}


def test_mad_outliers_global_vs_grouped_consistency(spark):
    rows = [(i, "a", i % 7) for i in range(50)] + [(50, "a", 999), (51, "b", 999)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    grouped = {(r.g, r.id) for r in mad_outliers(df, "v", by=["g"], k=3.5).collect()}
    assert ("a", 50) in grouped
    # group b is a single value: deviation 0, never an outlier
    assert not any(g == "b" for g, _ in grouped)


def test_merge_additive_rollup(spark):
    from aws_logs_to_parquet_converter_spark.operators.scd import (
        merge_additive_rollup,
    )

    cur = spark.createDataFrame(
        [("a", 10, 100), ("b", 5, 50)], "k string, n long, s long"
    )
    delta = spark.createDataFrame(
        [("b", 2, 20), ("c", 1, 10)], "k string, n long, s long"
    )
    out = {r.k: (r.n, r.s) for r in
           merge_additive_rollup(cur, delta, ["k"], ["n", "s"]).collect()}
    assert out == {"a": (10, 100), "b": (7, 70), "c": (1, 10)}
    with pytest.raises(ValueError, match="missing"):
        merge_additive_rollup(cur, delta.drop("s"), ["k"], ["n", "s"])


def test_fuzzy_join_defaults_tied_to_max_dist_and_variant_budget(spark):
    from aws_logs_to_parquet_converter_spark.operators.fuzzy import (
        _DEFAULT_MAX_LEN,
        _MAX_VARIANTS_PER_ROW,
        _variant_budget,
    )

    # the per-d defaults themselves are within budget
    for d, ml in _DEFAULT_MAX_LEN.items():
        assert _variant_budget(ml, d) <= _MAX_VARIANTS_PER_ROW
    # d=2 default cutoff is 64, so a 100-char string is excluded by
    # DEFAULT at d=2 but matched at d=1 (whose default is 512)
    df = spark.createDataFrame(
        [(1, "y" * 100), (2, "y" * 100 + "z"), (3, "abc"), (4, "abd")],
        "id long, s string",
    )
    d1 = {(r.id_a, r.id_b) for r in fuzzy_self_pairs(df, "id", "s", 1).collect()}
    assert d1 == {(1, 2), (3, 4)}
    d2 = {(r.id_a, r.id_b) for r in fuzzy_self_pairs(df, "id", "s", 2).collect()}
    assert d2 == {(3, 4)}
    # an explicit max_len whose worst-case neighborhood blows the
    # budget raises instead of silently scheduling the explosion
    with pytest.raises(ValueError, match="variants"):
        fuzzy_self_pairs(df, "id", "s", 2, max_len=512)
    # explicit-but-sane d=2 max_len still works
    ok = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_pairs(df, "id", "s", 2, max_len=150).collect()
    }
    assert ok == {(1, 2), (3, 4)}
