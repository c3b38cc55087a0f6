"""acf_stats (operators/timeseries.py): exact integer sufficient
statistics for lag-k autocorrelation — hand-computed values, gap
semantics, and the max_lag contract."""

import pytest
from pyspark.sql import functions as F

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


# xcorr_stats (r15)


def test_xcorr_hand_computed(spark):
    # one group, buckets 0..3: x = [1,2,3,4], y = [10,20,30,40]
    rows = [("g", b, x, y) for b, x, y in
            [(0, 1, 10), (1, 2, 20), (2, 3, 30), (3, 4, 40)]]
    df = spark.createDataFrame(rows, "g string, b long, x long, y long")
    got = {
        r["lag"]: (r["n_pairs"], r["sum_x"], r["sum_y"], r["sum_xy"])
        for r in timeseries.xcorr_stats(df, "g", "b", "x", "y", max_lag=2).collect()
    }
    # lag 0: pairs (x_t, y_t) for t=0..3
    assert got[0] == (4, 10, 100, 1*10 + 2*20 + 3*30 + 4*40)
    # lag +1: (x at t, y at t-1) -> t=1..3
    assert got[1] == (3, 2 + 3 + 4, 10 + 20 + 30, 2*10 + 3*20 + 4*30)
    # lag -1: (x at t, y at t+1) -> t=0..2
    assert got[-1] == (3, 1 + 2 + 3, 20 + 30 + 40, 1*20 + 2*30 + 3*40)
    # lag +2 / -2
    assert got[2] == (2, 3 + 4, 10 + 20, 3*10 + 4*20)
    assert got[-2] == (2, 1 + 2, 30 + 40, 1*30 + 2*40)


def test_xcorr_python_differential(spark):
    import random

    rng = random.Random(31)
    series = {}
    for g in ("a", "b"):
        for b in range(20):
            if rng.random() < 0.8:  # holes: missing buckets drop pairs
                series[(g, b)] = (rng.randrange(0, 50), rng.randrange(0, 50))
    rows = [(g, b, x, y) for (g, b), (x, y) in series.items()]
    df = spark.createDataFrame(rows, "g string, b long, x long, y long")
    L = 4
    got = {
        (r["g"], r["lag"]): (
            r["n_pairs"], r["sum_x"], r["sum_y"],
            r["sum_xx"], r["sum_yy"], r["sum_xy"],
        )
        for r in timeseries.xcorr_stats(df, "g", "b", "x", "y", max_lag=L).collect()
    }
    want = {}
    for (g, t), (x, _) in series.items():
        for k in range(-L, L + 1):
            if (g, t - k) in series:
                y = series[(g, t - k)][1]
                n, sx, sy, sxx, syy, sxy = want.get((g, k), (0,) * 6)
                want[(g, k)] = (
                    n + 1, sx + x, sy + y, sxx + x * x, syy + y * y, sxy + x * y
                )
    assert got == want


def test_xcorr_lag_zero_matches_acf_alignment(spark):
    # x == y degenerates lag k and lag -k to acf's lag |k| stats
    rows = [("g", b, v, v) for b, v in [(0, 3), (1, 5), (2, 7), (4, 2)]]
    df = spark.createDataFrame(rows, "g string, b long, x long, y long")
    xc = {
        r["lag"]: (r["n_pairs"], r["sum_xy"])
        for r in timeseries.xcorr_stats(df, "g", "b", "x", "y", max_lag=2).collect()
    }
    ac = {
        r["lag"]: (r["n_pairs"], r["sum_xy"])
        for r in timeseries.acf_stats(
            df.select("g", "b", F.col("x").alias("v")), "g", "b", "v", max_lag=2
        ).collect()
    }
    for k in (1, 2):
        assert xc[k][0] == ac[k][0]
        assert xc[k][1] == ac[k][1]


def test_xcorr_max_lag_contract(spark):
    df = spark.createDataFrame([("g", 0, 1, 1)], "g string, b long, x long, y long")
    with pytest.raises(ValueError, match="max_lag"):
        timeseries.xcorr_stats(df, "g", "b", "x", "y", max_lag=0)


# theilsen_trend (r15)


def _ts_python(rows, scale=1_000_000):
    """Reference: truncate-toward-zero quantized pair slopes, ceil-rank
    median per group."""
    import math
    from collections import defaultdict

    by_g = defaultdict(dict)
    for g, o, v in rows:
        by_g[g][o] = v
    out = {}
    for g, series in by_g.items():
        os_ = sorted(series)
        slopes = []
        for i, o1 in enumerate(os_):
            for o2 in os_[i + 1 :]:
                num = (series[o2] - series[o1]) * scale
                den = o2 - o1
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)
        if slopes:
            slopes.sort()
            out[g] = (slopes[math.ceil(500 * len(slopes) / 1000) - 1], len(slopes))
    return out


def test_theilsen_hand_computed_and_negative_truncation(spark):
    # g: (0,1),(1,3),(2,2) -> slopes [2e6, 500000, -1e6]; median 500000
    # h: single bucket -> no pairs -> absent
    rows = [("g", 0, 1), ("g", 1, 3), ("g", 2, 2), ("h", 0, 5)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {
        r["g"]: (r["median_slope_scaled"], r["n_pairs"])
        for r in timeseries.theilsen_trend(df, "g", "o", "v").collect()
    }
    assert got == {"g": (500000, 3)}
    # negative non-exact quotient truncates toward zero on BOTH engines:
    # (-1 * 1e6) div 3 = -333333 (not floor's -333334)
    rows2 = [("n", 0, 1), ("n", 3, 0)]
    df2 = spark.createDataFrame(rows2, "g string, o long, v long")
    got2 = timeseries.theilsen_trend(df2, "g", "o", "v").collect()
    assert got2[0]["median_slope_scaled"] == -333333


def test_theilsen_python_differential(spark):
    import random

    rng = random.Random(53)
    rows = []
    for g in ("a", "b", "c"):
        for o in rng.sample(range(40), rng.randrange(2, 20)):
            rows.append((g, o, rng.randrange(-100, 100)))
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {
        r["g"]: (r["median_slope_scaled"], r["n_pairs"])
        for r in timeseries.theilsen_trend(df, "g", "o", "v").collect()
    }
    assert got == _ts_python(rows)


def test_theilsen_robust_to_one_spike(spark):
    # perfect slope 2 with one wild outlier: median slope stays 2e6
    rows = [("g", o, 2 * o) for o in range(10)] + [("g", 10, 10_000)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = timeseries.theilsen_trend(df, "g", "o", "v").collect()
    assert got[0]["median_slope_scaled"] == 2_000_000


def test_theilsen_contracts(spark):
    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, 2), ("g", 1, 3)], "g string, o long, v long"
    )
    with pytest.raises(Exception, match="pre-aggregated"):
        timeseries.theilsen_trend(df, "g", "o", "v").collect()
    with pytest.raises(ValueError, match="slope_scale"):
        timeseries.theilsen_trend(df, "g", "o", "v", slope_scale=0)
    big = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1 << 45)], "g string, o long, v long"
    )
    with pytest.raises(Exception, match="BIGINT"):
        timeseries.theilsen_trend(big, "g", "o", "v", slope_scale=1 << 20).collect()
