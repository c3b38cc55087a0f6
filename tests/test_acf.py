"""acf_stats (operators/timeseries.py): exact integer sufficient
statistics for lag-k autocorrelation — hand-computed values, gap
semantics, and the max_lag contract."""

import pytest

from aws_logs_to_parquet_converter_spark.operators import timeseries


def _by_lag(df):
    return {r["lag"]: r.asDict() for r in df.collect()}


def test_hand_computed_lag1_lag2(spark):
    # series: b=0..3, x = [2, 4, 8, 16]
    df = spark.createDataFrame(
        [("g", 0, 2), ("g", 1, 4), ("g", 2, 8), ("g", 3, 16)],
        "g string, b long, x long",
    )
    got = _by_lag(timeseries.acf_stats(df, "g", "b", "x", max_lag=2))
    # lag 1 pairs (x_t, x_{t-1}): (4,2) (8,4) (16,8)
    assert got[1]["n_pairs"] == 3
    assert got[1]["sum_x"] == 28 and got[1]["sum_y"] == 14
    assert got[1]["sum_xx"] == 336 and got[1]["sum_yy"] == 84
    assert got[1]["sum_xy"] == 168
    # lag 2 pairs: (8,2) (16,4)
    assert got[2]["n_pairs"] == 2
    assert got[2]["sum_xy"] == 8 * 2 + 16 * 4


def test_missing_bucket_contributes_no_pair(spark):
    # buckets 0,1,3 — lag-1 aligns only (1,0); (3,2) has no anchor.
    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 1, 2), ("g", 3, 4)], "g string, b long, x long"
    )
    got = _by_lag(timeseries.acf_stats(df, "g", "b", "x", max_lag=1))
    assert got[1]["n_pairs"] == 1
    assert got[1]["sum_xy"] == 2
    # lag-2 would align (3,1) — check via max_lag=2
    got2 = _by_lag(timeseries.acf_stats(df, "g", "b", "x", max_lag=2))
    assert got2[2]["n_pairs"] == 1 and got2[2]["sum_xy"] == 4 * 2


def test_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 1), ("b", 0, 5), ("b", 1, 7)],
        "g string, b long, x long",
    )
    rows = timeseries.acf_stats(df, "g", "b", "x", max_lag=1).collect()
    got = {r["g"]: r["sum_xy"] for r in rows}
    assert got == {"a": 1, "b": 35}


def test_max_lag_contract(spark):
    df = spark.createDataFrame([("g", 0, 1)], "g string, b long, x long")
    with pytest.raises(ValueError, match="max_lag"):
        timeseries.acf_stats(df, "g", "b", "x", max_lag=0)
