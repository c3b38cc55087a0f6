"""Two-pass range-partitioned global ranking (operators/ranking.py):
must equal the single-window Window.orderBy ground truth on every
statistic while never planning a single-task window."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.ranking import (
    COUNT_COL,
    RANK_COL,
    cume_dist_from_rank,
    global_row_number,
    ntile_from_rank,
    percent_rank_from_rank,
)


def _fixture(spark, n=257, dup_every=5):
    # duplicate values every few rows so peer groups are exercised
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % (n // dup_every)).cast("double").alias("v"),
    ).repartition(7)  # scrambled input placement


def test_global_rank_matches_single_window(spark):
    df = _fixture(spark)
    ranked = global_row_number(df, [F.col("v"), F.col("k")], num_partitions=6)
    truth = df.select(
        "k", F.row_number().over(Window.orderBy("v", "k")).alias("rn")
    )
    got = {r["k"]: r[RANK_COL] for r in ranked.collect()}
    want = {r["k"]: r["rn"] for r in truth.collect()}
    assert got == want
    assert ranked.select(COUNT_COL).distinct().collect()[0][0] == df.count()


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (7, 4), (257, 4), (10, 3), (12, 5)])
def test_ntile_arithmetic_matches_sql_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    ranked = global_row_number(df, [F.col("v"), F.col("k")], num_partitions=3)
    got = {
        r["k"]: r["t"]
        for r in ranked.select(
            "k", ntile_from_rank(F.col(RANK_COL), F.col(COUNT_COL), k).alias("t")
        ).collect()
    }
    want = {
        r["k"]: r["t"]
        for r in df.select("k", F.ntile(k).over(Window.orderBy("v", "k")).alias("t")).collect()
    }
    assert got == want


def test_cume_dist_and_percent_rank_with_peers(spark):
    df = _fixture(spark, n=100, dup_every=4)  # 25 distinct v values, 4 peers each
    ranked = global_row_number(df, [F.col("v"), F.col("k")], num_partitions=5)
    got = ranked.select(
        "k",
        cume_dist_from_rank(["v"]).alias("cd"),
        percent_rank_from_rank(["v"]).alias("pr"),
    )
    truth = df.select(
        "k",
        F.cume_dist().over(Window.orderBy("v")).alias("cd"),
        F.percent_rank().over(Window.orderBy("v")).alias("pr"),
    )
    g = {r["k"]: (r["cd"], r["pr"]) for r in got.collect()}
    w = {r["k"]: (r["cd"], r["pr"]) for r in truth.collect()}
    for key in w:
        assert g[key][0] == pytest.approx(w[key][0], abs=1e-12)
        assert g[key][1] == pytest.approx(w[key][1], abs=1e-12)


def test_descending_rank_cume_dist(spark):
    df = _fixture(spark, n=60, dup_every=3)
    ranked = global_row_number(df, [F.desc("v"), F.col("k")], num_partitions=4)
    got = {
        r["k"]: r["cd"]
        for r in ranked.select(
            "k", cume_dist_from_rank(["v"], descending_rank=True).alias("cd")
        ).collect()
    }
    want = {
        r["k"]: r["cd"]
        for r in df.select("k", F.cume_dist().over(Window.orderBy("v")).alias("cd")).collect()
    }
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-12)


def test_empty_input_keeps_schema(spark):
    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    ranked = global_row_number(df, [F.col("v"), F.col("k")], num_partitions=4)
    assert ranked.columns == ["k", "v", RANK_COL, COUNT_COL]
    assert ranked.count() == 0


def test_no_single_task_window_in_plan(spark):
    from tests.test_plans import _unpartitioned_ordered_windows, explain_str

    df = _fixture(spark)
    ranked = global_row_number(df, [F.col("v"), F.col("k")], num_partitions=6)
    plan = explain_str(ranked, "simple")
    assert not _unpartitioned_ordered_windows(plan)
    assert "Exchange SinglePartition" not in plan
    # the only data-sized exchange is the range partition itself (the
    # plan text can echo it again inside the InMemoryRelation display);
    # the naive pid-window form would pay a SECOND full shuffle on the
    # partition id — that shape must never come back
    assert "Exchange rangepartitioning" in plan
    assert "hashpartitioning(_pid" not in plan


def test_global_row_number_handles_targeted_unpersist(spark):
    """Unpersist contract (round-8 advisor): library callers get the
    persisted intermediate back through ``handles`` and release it
    without a session-wide clearCache."""
    df = spark.createDataFrame([(i, i % 5) for i in range(50)], "k long, v long")
    handles: list = []
    ranked = global_row_number(
        df, [F.col("v"), F.col("k")], num_partitions=4, handles=handles
    )
    assert ranked.count() == 50
    assert len(handles) == 1
    assert handles[0].storageLevel.useMemory
    handles[0].unpersist()
    assert not handles[0].storageLevel.useMemory
