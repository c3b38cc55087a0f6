"""Count-min sketch (operators/sketch.py): one-sided error guarantee,
exactness at low load, and counter mergeability."""

from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators import sketch


def _stream(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "tok string")


def test_estimates_never_undercount_and_match_at_low_load(spark):
    true = {"alpha": 50, "beta": 20, "gamma": 5, "delta": 1}
    df = _stream(spark, true)
    sk = sketch.count_min_build(df, "tok", depth=4, width=1024)
    probes = spark.createDataFrame([(k,) for k in [*true, "absent"]], "tok string")
    est = {r.key: r.est_count for r in sketch.count_min_estimate(sk, probes, "tok").collect()}
    for k, n in true.items():
        assert est[k] >= n                       # one-sided guarantee
        assert est[k] == n                       # 4 keys in 1024 buckets: no collision
    assert est["absent"] == 0


def test_sketch_is_mergeable(spark):
    a = _stream(spark, {"x": 10, "y": 3})
    b = _stream(spark, {"x": 7, "z": 4})
    sk_union = sketch.count_min_build(a.union(b), "tok")
    merged = (
        sketch.count_min_build(a, "tok")
        .union(sketch.count_min_build(b, "tok"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, sk_union.collect())) == sorted(map(tuple, merged.collect()))


def test_sketch_size_is_bounded(spark):
    """10k distinct keys must not produce more than depth*width rows —
    the whole point of the sketch."""
    df = spark.range(10_000).select(F.concat(F.lit("k"), F.col("id")).alias("tok"))
    sk = sketch.count_min_build(df, "tok", depth=4, width=256)
    assert sk.count() <= 4 * 256


def test_approx_percentile_sketch_regime_rank_error_bound(spark):
    """In the true sketch regime (accuracy << n) Greenwald-Khanna
    guarantees rank error <= n/accuracy.  Build a skewed 20k-row column,
    query p50/p90 at accuracy=100, and assert the returned element's
    true rank lies within the guaranteed band."""
    from pyspark.sql import functions as F

    n, accuracy = 20_000, 100
    df = spark.range(n).select((F.col("id") * F.col("id") % 7919).alias("v"))
    vals = sorted(r.v for r in df.collect())
    for p in (0.5, 0.9):
        got = df.agg(
            F.expr(f"approx_percentile(v, {p}D, {accuracy})").alias("q")
        ).first().q
        import bisect

        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got) - 1
        target = p * (n - 1)
        tol = n / accuracy + 1
        assert lo - tol <= target <= hi + tol, (
            f"p={p}: value {got} spans ranks [{lo},{hi}], target {target}"
        )


def test_approx_top_k_sketch_regime_surfaces_heavy_hitters(spark):
    """approx_top_k with tracked slots far below the distinct count
    (the 100 TB accounting regime) must still surface the heavy
    hitters — presence plus a not-below-truth estimate (bounded-state
    frequent-items sketches never undercount a tracked item); the
    exact regime (slots >= distinct) is oracle-graded by
    q_approx_top_k."""
    from pyspark.sql import functions as F

    rows = [("heavy",)] * 500 + [("mid",)] * 80 + [
        (f"light{i}",) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "x string").repartition(8)
    (top,) = df.agg(F.expr("approx_top_k(x, 3, 16)")).first()
    items = {e["item"]: e["count"] for e in top}
    assert "heavy" in items and items["heavy"] >= 500
    assert "mid" in items and items["mid"] >= 80
    # the sketch may return FEWER than k items when merged partials
    # cannot certify a third heavy hitter — never more than k
    assert len(items) <= 3


# sliced segments + merge (r15)


def test_sliced_segments_merge_equals_unsliced(spark):
    """Summing all slices' segments must reproduce the unsliced sketch
    exactly (additivity), and a slice subset's merged estimates must
    equal a direct sketch of that subset."""
    from aws_logs_to_parquet_converter_spark.operators import sketch as sk

    rows = [
        ("d1", k) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    ] + [("d2", k) for k in ["a"] * 4 + ["d"] * 6]
    df = spark.createDataFrame(rows, "day string, k string")
    segs = sk.count_min_build_sliced(df, ["day"], "k", depth=3, width=64)
    merged_all = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sk.count_min_merge(segs).collect()
    }
    direct = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sk.count_min_build(df, "k", depth=3, width=64).collect()
    }
    assert merged_all == direct

    merged_d2 = sk.count_min_merge(segs.where(F.col("day") == "d2"))
    probes = spark.createDataFrame([("a",), ("d",), ("b",)], "k string")
    est = {
        r["key"]: r["est_count"]
        for r in sk.count_min_estimate(
            merged_d2, probes, "k", depth=3, width=64
        ).collect()
    }
    # collision-free at this tiny load: exact per-slice counts; 'b'
    # absent from d2 estimates 0 only if no collision — assert the
    # one-sided guarantee instead
    assert est["a"] == 4 and est["d"] == 6 and est["b"] >= 0


def test_sliced_requires_slices(spark):
    import pytest

    from aws_logs_to_parquet_converter_spark.operators import sketch as sk

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="slice_cols"):
        sk.count_min_build_sliced(df, [], "k")
