"""Randomized differentials for the late round-13 operators: hypothesis
draws small inputs, a pure-Python reference recomputes the closed form,
and the Spark result must match EXACTLY (the r11/r12 convention).

max_examples stays small: each example is a Spark job; the properties
target arithmetic/boundary logic, not throughput.
"""

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_logs_to_parquet_converter_spark.operators import bitmap, linkage
from aws_logs_to_parquet_converter_spark.operators.timeseries import acf_stats

_SETTINGS = dict(max_examples=10, deadline=None)


# --------------------------------------------------------------------------
# bitmap: shard/merge/count vs a Python set, including word boundaries
# --------------------------------------------------------------------------

_ids = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.one_of(
            st.integers(min_value=0, max_value=200),
            # force word-boundary and high-bit coverage
            st.sampled_from([0, 63, 64, 127, 128, 2**40, 2**40 + 63]),
        ),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_ids)
@settings(**_SETTINGS)
def test_bitmap_cardinality_matches_set(spark, rows):
    df = spark.createDataFrame(rows, "g string, id long")
    segs = bitmap.bitmap_build(df, ["g"], "id")
    got = {
        r["g"]: r["distinct_ids"]
        for r in bitmap.bitmap_cardinality(segs, ["g"]).collect()
    }
    want = defaultdict(set)
    for g, i in rows:
        want[g].add(i)
    assert got == {g: len(s) for g, s in want.items()}


# --------------------------------------------------------------------------
# acf_stats vs a brute-force Python pair scan
# --------------------------------------------------------------------------

_series = st.lists(
    st.tuples(st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=50)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@given(pts=_series, max_lag=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_acf_matches_bruteforce(spark, pts, max_lag):
    df = spark.createDataFrame([("g", b, x) for b, x in pts], "g string, b long, x long")
    got = {
        r["lag"]: (r["n_pairs"], r["sum_x"], r["sum_y"], r["sum_xx"], r["sum_yy"], r["sum_xy"])
        for r in acf_stats(df, "g", "b", "x", max_lag=max_lag).collect()
    }
    by_b = dict(pts)
    want = {}
    for k in range(1, max_lag + 1):
        pairs = [(x, by_b[b - k]) for b, x in pts if (b - k) in by_b]
        if pairs:
            want[k] = (
                len(pairs),
                sum(x for x, _ in pairs),
                sum(y for _, y in pairs),
                sum(x * x for x, _ in pairs),
                sum(y * y for _, y in pairs),
                sum(x * y for x, y in pairs),
            )
    assert got == want


# --------------------------------------------------------------------------
# fellegi_sunter_link vs a brute-force Python blocked scorer
# --------------------------------------------------------------------------

_recs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),                      # block
        st.one_of(st.none(), st.sampled_from(["p", "q"])),          # f1
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # f2
    ),
    min_size=1,
    max_size=12,
)


@given(lrows=_recs, rrows=_recs, thr=st.sampled_from([-10**6, 0, 900]))
@settings(**_SETTINGS)
def test_linkage_matches_bruteforce(spark, lrows, rrows, thr):
    left = spark.createDataFrame(
        [(i, b, f1, f2) for i, (b, f1, f2) in enumerate(lrows)],
        "lid long, blk long, f1 string, f2 long",
    )
    right = spark.createDataFrame(
        [(i, b, f1, f2) for i, (b, f1, f2) in enumerate(rrows)],
        "rid long, blk long, f1 string, f2 long",
    )
    fields = [("f1", 1000, -500), ("f2", 2000, -100)]
    got = {
        (r["lid"], r["rid"]): (r["n_agree"], r["n_disagree"], r["score_milli"])
        for r in linkage.fellegi_sunter_link(
            left, right, "lid", "rid", ["blk"], fields, threshold_milli=thr
        ).collect()
    }
    want = {}
    for li, (lb, lf1, lf2) in enumerate(lrows):
        for ri, (rb, rf1, rf2) in enumerate(rrows):
            if lb != rb:
                continue
            na = nd = score = 0
            for lv, rv, wa, wd in ((lf1, rf1, 1000, -500), (lf2, rf2, 2000, -100)):
                if lv is None or rv is None:
                    continue
                if lv == rv:
                    na, score = na + 1, score + wa
                else:
                    nd, score = nd + 1, score + wd
            if score >= thr:
                want[(li, ri)] = (na, nd, score)
    assert got == want


# --------------------------------------------------------------------------
# bitmap_rollup_cardinality vs per-level Python sets
# --------------------------------------------------------------------------

_rollup_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=130),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_rollup_rows)
@settings(**_SETTINGS)
def test_bitmap_rollup_matches_sets(spark, rows):
    df = spark.createDataFrame(rows, "t string, w long, id long")
    segs = bitmap.bitmap_build(df, ["t", "w"], "id")
    got = {
        (r["t"], r["w"], r["gid"]): r["distinct_ids"]
        for r in bitmap.bitmap_rollup_cardinality(segs, ["t", "w"]).collect()
    }
    fine, by_t, total = defaultdict(set), defaultdict(set), set()
    for t_, w, i in rows:
        fine[(t_, w)].add(i)
        by_t[t_].add(i)
        total.add(i)
    want = {(t_, w, 0): len(s) for (t_, w), s in fine.items()}
    want.update({(t_, None, 1): len(s) for t_, s in by_t.items()})
    want[(None, None, 3)] = len(total)
    assert got == want
