"""HDR-histogram quantile MV (operators/histogram.py): integer
bucketing differential vs a Python reference, rank-selection
semantics, mergeability, and contracts."""

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from aws_logs_to_parquet_converter_spark.operators import histogram


def _py_bucket(v, m=5):
    if v < (1 << m):
        return v
    msb = v.bit_length() - 1
    shift = msb - m
    return (shift + 1) * (1 << m) + ((v >> shift) - (1 << m))


def _py_floor(idx, m=5):
    if idx < (1 << m):
        return idx
    level, sub = divmod(idx, 1 << m)
    return ((1 << m) + sub) << (level - 1)


def _py_quantiles(vals, q_milli, m=5):
    from collections import Counter

    counts = Counter(_py_bucket(v, m) for v in vals)
    n = len(vals)
    out = {}
    for q in q_milli:
        rank = -(-q * n // 1000)
        cum = 0
        for b in sorted(counts):
            cum += counts[b]
            if cum >= rank:
                out[q] = _py_floor(b, m)
                break
    return out, n


def test_bucket_index_and_floor_match_python(spark):
    vals = (
        list(range(0, 70))
        + [2**k + d for k in range(5, 62) for d in (0, 1, 7)]
        + [(1 << 62) + 12345, (1 << 63) - 1]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for m in (1, 5, 8):
        got = df.select(
            "v",
            histogram.hdr_bucket_index(F.col("v"), m).alias("b"),
            histogram.hdr_bucket_floor(
                histogram.hdr_bucket_index(F.col("v"), m), m
            ).alias("lb"),
        ).collect()
        for r in got:
            assert r["b"] == _py_bucket(r["v"], m), (r["v"], m)
            assert r["lb"] == _py_floor(_py_bucket(r["v"], m), m), (r["v"], m)
            # the floor really is a floor, within relative width 2^-m
            assert r["lb"] <= r["v"]
            if r["v"] >= (1 << m):
                assert r["v"] - r["lb"] <= r["lb"] // (1 << m)


def test_hist_quantiles_match_python_and_bound_error(spark):
    rng = random.Random(5)
    rows = []
    for g in ("a", "b"):
        rows += [(g, int(math.exp(rng.uniform(0, 20)))) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    segs = histogram.hist_build(df, ["g"], "v")
    got = {
        (r["g"], r["q_milli"]): (r["value_lb"], r["n"])
        for r in histogram.hist_quantiles(segs, ["g"], [500, 950, 1000]).collect()
    }
    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        want, n = _py_quantiles(vals, [500, 950, 1000])
        for q in (500, 950, 1000):
            lb, gn = got[(g, q)]
            assert gn == n == len(vals)
            assert lb == want[q], (g, q)
            # the selected bucket contains the exact rank value
            exact = vals[-(-q * n // 1000) - 1]
            assert _py_bucket(exact) == _py_bucket(lb)
            assert lb <= exact <= lb + max(1, lb // 32)


def test_hist_build_small_values_exact_and_merge(spark):
    df = spark.createDataFrame(
        [("a", "d1", 3), ("a", "d1", 3), ("a", "d2", 31), ("b", "d1", 0)],
        "g string, dt string, v long",
    )
    segs = histogram.hist_build(df, ["g", "dt"], "v")
    assert sorted(
        (r["g"], r["dt"], r["bucket"], r["cnt"]) for r in segs.collect()
    ) == [("a", "d1", 3, 2), ("a", "d2", 31, 1), ("b", "d1", 0, 1)]
    # mergeability: summing day segments == building groupwise
    merged = histogram.hist_merge(segs, ["g"])
    direct = histogram.hist_build(df, ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_contracts(spark):
    df = spark.createDataFrame([("a", -1)], "g string, v long")
    with pytest.raises(Exception, match="non-negative"):
        histogram.hist_build(df, ["g"], "v").collect()
    dbl = spark.createDataFrame([("a", 1.5)], "g string, v double")
    with pytest.raises(TypeError, match="integral"):
        histogram.hist_build(dbl, ["g"], "v")
    nulls = spark.createDataFrame(
        [("a", None), ("a", 4)], "g string, v long"
    )
    assert histogram.hist_build(nulls, ["g"], "v").count() == 1
    segs = histogram.hist_build(
        spark.createDataFrame([("a", 1)], "g string, v long"), ["g"], "v"
    )
    with pytest.raises(ValueError, match="q_milli"):
        histogram.hist_quantiles(segs, ["g"], [])
    with pytest.raises(ValueError, match="thousandths"):
        histogram.hist_quantiles(segs, ["g"], [0.5])
    with pytest.raises(ValueError, match="precision_bits"):
        histogram.hist_build(
            spark.createDataFrame([("a", 1)], "g string, v long"),
            ["g"], "v", precision_bits=0,
        )


# hist_rolling_quantiles (r15)


def test_rolling_matches_per_anchor_merge(spark):
    """Rolling window [s-2, s] quantiles == hist_quantiles over the
    manually filtered window, for every observed anchor."""
    import random

    from aws_logs_to_parquet_converter_spark.operators import histogram

    rng = random.Random(71)
    rows = [
        ("g", wk, rng.randrange(0, 500))
        for wk in (0, 1, 3, 4)  # week 2 missing: anchor set has a hole
        for _ in range(rng.randrange(5, 15))
    ]
    df = spark.createDataFrame(rows, "g string, wk long, v long")
    segs = histogram.hist_build(df, ["g", "wk"], "v")
    got = {
        (r["g"], r["wk"], r["q_milli"]): (r["value_lb"], r["n"])
        for r in histogram.hist_rolling_quantiles(
            segs, ["g"], "wk", 3, [500, 950]
        ).collect()
    }
    anchors = sorted({wk for _, wk, _ in rows})
    want = {}
    for a in anchors:
        window = segs.where(F.col("wk").between(a - 2, a))
        for r in histogram.hist_quantiles(window, ["g"], [500, 950]).collect():
            want[(r["g"], a, r["q_milli"])] = (r["value_lb"], r["n"])
    assert got == want
    # no ghost anchors: only observed weeks appear
    assert {k[1] for k in got} == set(anchors)


def test_rolling_window_one_equals_plain(spark):
    from aws_logs_to_parquet_converter_spark.operators import histogram

    rows = [("g", wk, v) for wk in range(3) for v in (1, 10, 100)]
    df = spark.createDataFrame(rows, "g string, wk long, v long")
    segs = histogram.hist_build(df, ["g", "wk"], "v")
    roll = sorted(
        tuple(r)
        for r in histogram.hist_rolling_quantiles(
            segs, ["g"], "wk", 1, [500]
        ).collect()
    )
    plain = sorted(
        tuple(r)
        for r in histogram.hist_quantiles(segs, ["g", "wk"], [500])
        .select("g", "wk", "q_milli", "value_lb", "n")
        .collect()
    )
    # column order: rolling returns (g, wk, q_milli, value_lb, n)
    assert roll == plain


def test_rolling_contracts(spark):
    import pytest

    from aws_logs_to_parquet_converter_spark.operators import histogram

    df = spark.createDataFrame([("g", 0, 1)], "g string, wk long, v long")
    segs = histogram.hist_build(df, ["g", "wk"], "v")
    with pytest.raises(ValueError, match="window_slices"):
        histogram.hist_rolling_quantiles(segs, ["g"], "wk", 0, [500])
