"""Interval operators (operators/intervals.py) and growth accounting
(operators/timeseries.py): bucketed overlap join must equal the naive
theta-join exactly (with exactly-once pairs — no dedup anywhere in the
plan), the segmented sweep line must equal a Python sweep, and the
growth decomposition must satisfy its accounting identities."""

import random

import pytest
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators import intervals


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rows)],
        f"k string, {prefix}s long, {prefix}e long, {prefix}id long",
    )


def test_interval_join_matches_bruteforce_random(spark):
    rng = random.Random(11)
    lrows = [("a", s := rng.randrange(0, 500), s + rng.randrange(0, 80)) for _ in range(60)]
    rrows = [("a", s := rng.randrange(0, 500), s + rng.randrange(0, 80)) for _ in range(60)]
    # second key to prove key isolation
    lrows += [("b", 0, 100)]
    rrows += [("b", 50, 60), ("b", 100, 110)]  # [100,110) does NOT overlap [0,100)
    left = _mk(spark, lrows, "l")
    right = _mk(spark, rrows, "r")
    got = {
        (r["k"], r["lid"], r["rid"])
        for r in intervals.interval_join(
            left, right, "ls", "le", "rs", "re", keys=["k"], bucket_width=64
        ).collect()
    }
    want = set()
    for i, (lk, ls, le) in enumerate(lrows):
        for j, (rk, rs, re) in enumerate(rrows):
            # ls < le / rs < re: empty intervals overlap nothing under
            # half-open semantics (the raw predicate alone would let an
            # empty interval strictly inside a real one "match")
            if lk == rk and ls < le and rs < re and ls < re and rs < le:
                want.add((lk, i, j))
    assert got == want
    assert ("b", 60, 61) not in got  # adjacency is not overlap (half-open)


def test_interval_join_exactly_once_across_buckets(spark):
    # both intervals span many buckets; the pair must appear ONCE
    left = _mk(spark, [("a", 0, 1000)], "l")
    right = _mk(spark, [("a", 500, 1500)], "r")
    out = intervals.interval_join(
        left, right, "ls", "le", "rs", "re", keys=["k"], bucket_width=10
    )
    assert out.count() == 1
    # and the plan holds no dedup: exactly-once comes from bucket math
    # (same explainString idiom as tests/test_bucketing.py::_explain)
    jmode = out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = out._jdf.queryExecution().explainString(jmode)
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_interval_join_guards(spark):
    left = _mk(spark, [("a", 0, 10)], "l")
    right = _mk(spark, [("a", 0, 10)], "r")
    with pytest.raises(ValueError, match="collide"):
        intervals.interval_join(
            left.withColumnRenamed("ls", "x"),
            right.withColumnRenamed("rs", "x"),
            "x", "le", "x", "re", keys=["k"],
        )
    # span guard fails loudly
    wide_l = _mk(spark, [("a", 0, 10_000)], "l")
    with pytest.raises(Exception, match="spans"):
        intervals.interval_join(
            wide_l, right, "ls", "le", "rs", "re",
            keys=["k"], bucket_width=10, max_span_buckets=100,
        ).collect()
    # non-integral start raises
    with pytest.raises(TypeError, match="integral"):
        intervals.interval_join(
            left.withColumn("ls", F.col("ls").cast("double")),
            right, "ls", "le", "rs", "re", keys=["k"],
        )


def test_peak_concurrency_matches_python_sweep(spark):
    rng = random.Random(23)
    rows = []
    for g in ("x", "y"):
        for _ in range(200):
            s = rng.randrange(0, 2000)
            rows.append((g, s, s + rng.randrange(1, 150)))
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {
        r["g"]: (r["peak"], r["peak_at"])
        for r in intervals.peak_concurrency(df, ["g"], "s", "e", bucket_width=100).collect()
    }
    for g in ("x", "y"):
        deltas = {}
        for gg, s, e in rows:
            if gg != g:
                continue
            deltas[s] = deltas.get(s, 0) + 1
            deltas[e] = deltas.get(e, 0) - 1
        run, best, best_at = 0, -1, None
        for t in sorted(deltas):
            run += deltas[t]
            if run > best:
                best, best_at = run, t
        assert got[g] == (best, best_at)


def test_peak_concurrency_half_open_adjacency(spark):
    # [0,10) and [10,20) never overlap: peak 1, at t=0
    df = spark.createDataFrame([("g", 0, 10), ("g", 10, 20)], "g string, s long, e long")
    (r,) = intervals.peak_concurrency(df, ["g"], "s", "e", bucket_width=7).collect()
    assert (r["peak"], r["peak_at"]) == (1, 0)


def test_peak_concurrency_bucket_width_invariance(spark):
    rows = [("g", i * 3, i * 3 + 10) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    outs = {
        w: tuple(intervals.peak_concurrency(df, ["g"], "s", "e", bucket_width=w).collect()[0])
        for w in (1, 13, 1000)
    }
    assert len(set(outs.values())) == 1


def test_growth_accounting_analytic(spark):
    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        growth_accounting,
    )

    # u1 active d1,d2,d4 ; u2 active d2 only
    rows = [("u1", 1), ("u1", 2), ("u1", 4), ("u2", 2), ("u1", 1)]  # dup row
    df = spark.createDataFrame(rows, "uid string, d long")
    got = {
        r["d"]: (r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"])
        for r in growth_accounting(df, "uid", "d").collect()
    }
    assert got == {
        1: (1, 0, 0, 0),          # u1 new
        2: (1, 1, 0, 0),          # u2 new, u1 returning
        3: (0, 0, 0, 2),          # u1 gap-churn, u2 churn
        4: (0, 0, 1, 0),          # u1 resurrected
        5: (0, 0, 0, 1),          # u1 horizon churn
    }


def test_growth_accounting_identity_random(spark):
    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        growth_accounting,
    )

    rng = random.Random(5)
    rows = [
        (f"u{rng.randrange(40)}", rng.randrange(0, 25)) for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "uid string, d long")
    ga = {r["d"]: r for r in growth_accounting(df, "uid", "d").collect()}
    active = {
        r["d"]: r["a"]
        for r in df.groupBy("d").agg(F.count_distinct("uid").alias("a")).collect()
    }
    for d, a in active.items():
        r = ga[d]
        assert r["n_new"] + r["n_returning"] + r["n_resurrected"] == a
    # flow identity: active(d) - active(d+1) = churned(d+1) - new(d+1) - resurrected(d+1)
    for d in active:
        nxt = ga.get(d + 1)
        a_next = active.get(d + 1, 0)
        ch = nxt["n_churned"] if nxt else 0
        nw = (nxt["n_new"] + nxt["n_resurrected"]) if nxt else 0
        assert active[d] - a_next == ch - nw


def test_interval_join_exact_past_double_precision(spark):
    """r14 review: bucket math must be exact LONG floor division — a
    double-routed floor(s/w) mis-buckets epochs past 2^53."""
    base = (1 << 60) + 1  # not representable as float64
    left = _mk(spark, [("a", base, base + 10)], "l")
    right = _mk(spark, [("a", base + 5, base + 20)], "r")
    out = intervals.interval_join(
        left, right, "ls", "le", "rs", "re", keys=["k"], bucket_width=7
    )
    assert out.count() == 1


def test_interval_ops_negative_epochs(spark):
    """Pre-1970 epochs: floor (not truncate-toward-zero) bucketing."""
    left = _mk(spark, [("a", -15, -5)], "l")
    right = _mk(spark, [("a", -8, -1)], "r")
    assert intervals.interval_join(
        left, right, "ls", "le", "rs", "re", keys=["k"], bucket_width=10
    ).count() == 1
    df = spark.createDataFrame([("g", -15, -5), ("g", -8, -1)], "g string, s long, e long")
    (r,) = intervals.peak_concurrency(df, ["g"], "s", "e", bucket_width=10).collect()
    assert (r["peak"], r["peak_at"]) == (2, -8)


def test_point_in_interval_matches_bruteforce(spark):
    rng = random.Random(31)
    pts = [("a", rng.randrange(0, 400)) for _ in range(50)] + [("b", 10)]
    ivs = [("a", s := rng.randrange(0, 400), s + rng.randrange(0, 60)) for _ in range(30)]
    ivs += [("b", 0, 10), ("b", 10, 20)]  # half-open: t=10 in [10,20) only
    points = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(pts)], "k string, t long, pid long"
    )
    intervals_df = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(ivs)],
        "k string, s long, e long, iid long",
    )
    got = {
        (r["k"], r["pid"], r["iid"])
        for r in intervals.point_in_interval_join(
            points, intervals_df, "t", "s", "e", keys=["k"], bucket_width=32
        ).collect()
    }
    want = {
        (pk, i, j)
        for i, (pk, t) in enumerate(pts)
        for j, (ik, s, e) in enumerate(ivs)
        if pk == ik and s <= t < e
    }
    assert got == want
    assert ("b", 50, 31) in got and ("b", 50, 30) not in got


def test_point_in_interval_exactly_once_long_interval(spark):
    points = spark.createDataFrame([("a", 500, 0)], "k string, t long, pid long")
    ivs = spark.createDataFrame([("a", 0, 1000, 0)], "k string, s long, e long, iid long")
    out = intervals.point_in_interval_join(
        points, ivs, "t", "s", "e", keys=["k"], bucket_width=10
    )
    assert out.count() == 1


def test_exact_floordiv_boundary_wide_widths(spark):
    """r15 advisory: the old decimal(38,0)/decimal(38,0) form rounded
    HALF_UP at scale 6 before floor, so c = w-1 floored to 1 (true 0)
    and c = -1 floored to 0 (true -1) once w > 2_000_000.  The pure
    BIGINT div+pmod-correction form must match Python's // everywhere,
    including past 2^53 and at Long extremes."""
    hour_us, day_us = 3_600_000_000, 86_400_000_000
    cases = []
    for w in (hour_us, day_us, 7, 1, 2_000_001):
        for c in (
            w - 1, -1, 0, w, -w, w + 1, -w - 1, 2 * w - 1, -2 * w,
            (1 << 60) + 1, -(1 << 60) - 1, (1 << 62), 5 * w + w // 2,
        ):
            cases.append((c, w))
    df = spark.createDataFrame(cases, "c long, w long")
    for w in sorted({w for _, w in cases}):
        rows = (
            df.where(F.col("w") == w)
            .select("c", intervals.exact_floordiv(F.col("c"), w).alias("q"))
            .collect()
        )
        for r in rows:
            assert r["q"] == r["c"] // w, (r["c"], w, r["q"])


def test_exact_floordiv_rejects_nonpositive_width():
    with pytest.raises(ValueError):
        intervals.exact_floordiv(F.col("x"), 0)


def test_interval_join_slim_matches_unslim_with_duplicates(spark):
    """r15 (verdict item 3): payload slimming must reproduce the exact
    pair MULTISET of the unslimmed form — including duplicate interval
    rows on either side (the content-key join-back re-expands them as
    the cross product, which is the pair semantics)."""
    rng = random.Random(47)
    lrows = [("a", s := rng.randrange(0, 200), s + rng.randrange(0, 50)) for _ in range(40)]
    lrows += [lrows[0], lrows[0]]  # duplicate left interval, 3 copies total
    rrows = [("a", s := rng.randrange(0, 200), s + rng.randrange(0, 50)) for _ in range(40)]
    rrows += [rrows[5]]  # duplicate right interval, 2 copies
    left = _mk(spark, lrows, "l")   # carries payload col lid
    right = _mk(spark, rrows, "r")
    kw = dict(keys=["k"], bucket_width=32)
    slim = intervals.interval_join(
        left, right, "ls", "le", "rs", "re", slim_payload=True, **kw
    )
    unslim = intervals.interval_join(
        left, right, "ls", "le", "rs", "re", slim_payload=False, **kw
    )
    assert slim.columns == unslim.columns
    key = lambda r: (r["k"], r["ls"], r["le"], r["lid"], r["rs"], r["re"], r["rid"])
    got_s = sorted(key(r) for r in slim.collect())
    got_u = sorted(key(r) for r in unslim.collect())
    assert got_s == got_u and len(got_s) > 0
    # duplicates really multiplied: the 3 identical left copies each pair
    lid0_pairs = [p for p in got_s if p[1:3] == (lrows[0][1], lrows[0][2])]
    per_copy = {}
    for p in lid0_pairs:
        per_copy.setdefault(p[3], []).append(p[4:])
    copies = {i for i, (k, s, e) in enumerate(lrows) if (k, s, e) == lrows[0]}
    assert set(per_copy) == copies
    assert len({tuple(sorted(v)) for v in per_copy.values()}) == 1


def test_point_in_interval_slim_matches_unslim_with_duplicates(spark):
    rng = random.Random(53)
    pts = [("a", rng.randrange(0, 300)) for _ in range(60)]
    ivs = [("a", s := rng.randrange(0, 300), s + rng.randrange(0, 40)) for _ in range(25)]
    ivs += [ivs[3], ivs[3]]  # duplicate interval, 3 copies
    points = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(pts)], "k string, t long, pid long"
    )
    ivdf = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(ivs)],
        "k string, s long, e long, iid long",
    )
    kw = dict(keys=["k"], bucket_width=16)
    slim = intervals.point_in_interval_join(
        points, ivdf, "t", "s", "e", slim_payload=True, **kw
    )
    unslim = intervals.point_in_interval_join(
        points, ivdf, "t", "s", "e", slim_payload=False, **kw
    )
    assert slim.columns == unslim.columns
    key = lambda r: (r["k"], r["pid"], r["t"], r["s"], r["e"], r["iid"])
    assert sorted(map(key, slim.collect())) == sorted(map(key, unslim.collect()))


def test_interval_join_auto_slim_only_with_payload(spark):
    """Default slim_payload=None: a side with no payload beyond
    (keys, bounds) must NOT be slimmed — a distinct there would
    otherwise be pure overhead (and the plan should show no extra
    aggregate)."""
    left = spark.createDataFrame([("a", 0, 10)], "k string, ls long, le long")
    right = spark.createDataFrame([("a", 5, 15)], "k string, rs long, re long")
    out = intervals.interval_join(left, right, "ls", "le", "rs", "re", keys=["k"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan and "Aggregate" not in plan
    assert out.count() == 1


def _py_merge(ivs):
    """Reference gaps-and-islands merge (overlap-or-touch) of half-open
    intervals; returns [(s, e, n)] sorted."""
    out = []
    for s, e in sorted(ivs):
        if e <= s:
            continue
        if out and s <= out[-1][1]:
            ps, pe, n = out[-1]
            out[-1] = (ps, max(pe, e), n + 1)
        else:
            out.append((s, e, 1))
    return out


def test_merge_intervals_matches_python(spark):
    rng = random.Random(71)
    rows = []
    for g in ("a", "b"):
        rows += [(g, s := rng.randrange(0, 500), s + rng.randrange(0, 60)) for _ in range(80)]
    rows += [("a", 100, 120)]  # duplicate-prone region
    df = spark.createDataFrame(rows, "g string, s long, e long")
    for w in (1, 32, 1 << 20):
        got = {}
        for r in intervals.merge_intervals(df, ["g"], "s", "e", bucket_width=w).collect():
            got.setdefault(r["g"], []).append((r["island_s"], r["island_e"], r["n_merged"]))
        for g in ("a", "b"):
            want = _py_merge([(s, e) for gg, s, e in rows if gg == g])
            assert sorted(got[g]) == want, (g, w)


def test_merge_intervals_touching_merge_and_gap(spark):
    """Half-open adjacency: [0,10)+[10,20) merge (no gap); [0,10)+[11,20)
    do not.  Empty intervals are dropped."""
    df = spark.createDataFrame(
        [("g", 0, 10), ("g", 10, 20), ("g", 25, 25), ("g", 30, 40)],
        "g string, s long, e long",
    )
    got = sorted(
        (r["island_s"], r["island_e"], r["n_merged"])
        for r in intervals.merge_intervals(df, ["g"], "s", "e").collect()
    )
    assert got == [(0, 20, 2), (30, 40, 1)]


def test_merge_intervals_island_spans_many_buckets(spark):
    """An island longer than bucket_width must still merge (the carry
    max-end crosses buckets; membership never explodes)."""
    # chain of 50 touching intervals of length 7 with bucket_width 10,
    # plus one contained interval starting in a late bucket
    rows = [("g", i * 7, (i + 1) * 7) for i in range(50)] + [("g", 300, 301)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = [
        (r["island_s"], r["island_e"], r["n_merged"])
        for r in intervals.merge_intervals(df, ["g"], "s", "e", bucket_width=10).collect()
    ]
    assert got == [(0, 350, 51)]


def test_interval_coverage_and_negative_epochs(spark):
    df = spark.createDataFrame(
        [("g", -15, -5), ("g", -8, 2), ("g", 10, 11), ("h", 0, 1)],
        "g string, s long, e long",
    )
    got = {
        r["g"]: (r["covered"], r["n_islands"])
        for r in intervals.interval_coverage(df, ["g"], "s", "e", bucket_width=10).collect()
    }
    assert got == {"g": (18, 2), "h": (1, 1)}  # [-15,2) = 17 + [10,11) = 1


def test_merge_intervals_null_group_kept_and_guards(spark):
    df = spark.createDataFrame([(None, 0, 5), (None, 3, 9), ("a", 0, 1)], "g string, s long, e long")
    got = {
        r["g"]: (r["island_s"], r["island_e"], r["n_merged"])
        for r in intervals.merge_intervals(df, ["g"], "s", "e").collect()
    }
    assert got == {None: (0, 9, 2), "a": (0, 1, 1)}
    with pytest.raises(ValueError, match="bucket_width"):
        intervals.merge_intervals(df, ["g"], "s", "e", bucket_width=0)
    bad = spark.createDataFrame([("g", 1.5, 2.0)], "g string, s double, e double")
    with pytest.raises(TypeError, match="integral"):
        intervals.merge_intervals(bad, ["g"], "s", "e")


def _py_gaps(ivs):
    islands = _py_merge(ivs)
    return [
        (islands[i][1], islands[i + 1][0], islands[i + 1][0] - islands[i][1])
        for i in range(len(islands) - 1)
    ]


def test_interval_gaps_matches_python(spark):
    rng = random.Random(17)
    rows = []
    for g in ("a", "b"):
        rows += [(g, s := rng.randrange(0, 800), s + rng.randrange(0, 40)) for _ in range(60)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    for w in (1, 9, 1 << 20):
        got = {}
        for r in intervals.interval_gaps(df, ["g"], "s", "e", bucket_width=w).collect():
            got.setdefault(r["g"], []).append((r["gap_s"], r["gap_e"], r["gap_len"]))
        for g in ("a", "b"):
            want = _py_gaps([(s, e) for gg, s, e in rows if gg == g])
            assert sorted(got.get(g, [])) == want, (g, w)


def test_interval_gaps_cross_bucket_and_single_island(spark):
    """The next island's start may sit many buckets later (buckets-sized
    stitch), and a single-island group emits nothing."""
    df = spark.createDataFrame(
        [("g", 0, 5), ("g", 1000, 1001), ("h", 3, 4)],
        "g string, s long, e long",
    )
    got = [
        (r["g"], r["gap_s"], r["gap_e"], r["gap_len"])
        for r in intervals.interval_gaps(df, ["g"], "s", "e", bucket_width=10).collect()
    ]
    assert got == [("g", 5, 1000, 995)]


def test_interval_gaps_null_group(spark):
    df = spark.createDataFrame(
        [(None, 0, 2), (None, 5, 7)], "g string, s long, e long"
    )
    got = intervals.interval_gaps(df, ["g"], "s", "e").collect()
    assert [(r["g"], r["gap_s"], r["gap_e"]) for r in got] == [(None, 2, 5)]


def _py_intersect(a_ivs, b_ivs):
    ia, ib = _py_merge(a_ivs), _py_merge(b_ivs)
    out = []
    for s1, e1, _ in ia:
        for s2, e2, _ in ib:
            s, e = max(s1, s2), min(e1, e2)
            if s < e:
                out.append((s, e))
    return sorted(out)


def test_interval_intersect_matches_python(spark):
    rng = random.Random(43)
    rows_a, rows_b = [], []
    for g in ("a", "b"):
        rows_a += [(g, s := rng.randrange(0, 400), s + rng.randrange(0, 50)) for _ in range(40)]
        rows_b += [(g, s := rng.randrange(0, 400), s + rng.randrange(0, 50)) for _ in range(40)]
    da = spark.createDataFrame(rows_a, "g string, s long, e long")
    db = spark.createDataFrame(rows_b, "g string, s long, e long")
    for w in (8, 1 << 20):
        got = {}
        for r in intervals.interval_intersect(da, db, ["g"], "s", "e", bucket_width=w).collect():
            got.setdefault(r["g"], []).append((r["isect_s"], r["isect_e"]))
        for g in ("a", "b"):
            want = _py_intersect(
                [(s, e) for gg, s, e in rows_a if gg == g],
                [(s, e) for gg, s, e in rows_b if gg == g],
            )
            assert sorted(got.get(g, [])) == want, (g, w)


def test_interval_intersect_segments_disjoint_and_null_group(spark):
    """Each side merges first, so output segments are disjoint; a NULL
    group intersects like any other (struct-keyed null-safe join)."""
    da = spark.createDataFrame(
        [(None, 0, 10), (None, 5, 20), ("k", 0, 3)], "g string, s long, e long"
    )
    db = spark.createDataFrame(
        [(None, 8, 12), (None, 15, 30), ("z", 0, 3)], "g string, s long, e long"
    )
    got = sorted(
        (r["g"], r["isect_s"], r["isect_e"])
        for r in intervals.interval_intersect(da, db, ["g"], "s", "e").collect()
    )
    assert got == [(None, 8, 12), (None, 15, 20)]
    # disjointness: the merged sides guarantee non-overlapping output
    segs = [(s, e) for _, s, e in got]
    assert all(segs[i][1] <= segs[i + 1][0] for i in range(len(segs) - 1))
