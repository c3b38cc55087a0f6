"""Randomized differentials for the round-15 operators: hypothesis
draws small inputs, a pure-Python reference recomputes the closed form,
and the Spark result must match EXACTLY (the r11-r14 convention).

max_examples stays small: each example is a Spark job; the properties
target set/arithmetic logic (word-wise growth algebra incl. word
boundaries and gap/horizon churn, pure-BIGINT floor division at bucket
boundaries), not throughput.
"""

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators import bitmap, intervals

_SETTINGS = dict(max_examples=10, deadline=None)


# --------------------------------------------------------------------------
# bitmap_growth vs a pure-Python growth-accounting scan
# --------------------------------------------------------------------------

_activity = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # slice
        st.one_of(
            st.integers(min_value=0, max_value=200),
            st.sampled_from([0, 63, 64, 127, 128, 2**40]),  # word boundaries
        ),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_activity)
@settings(**_SETTINGS)
def test_bitmap_growth_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "d long, id long")
    segs = bitmap.bitmap_build(df, ["d"], "id")
    got = {
        r["d"]: (r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"])
        for r in bitmap.bitmap_growth(segs, [], "d").collect()
    }
    days = defaultdict(lambda: [0, 0, 0, 0])
    per_id = defaultdict(set)
    for d, i in rows:
        per_id[i].add(d)
    for ss in per_id.values():
        seq = sorted(ss)
        for j, s in enumerate(seq):
            if j == 0:
                days[s][0] += 1
            elif seq[j - 1] == s - 1:
                days[s][1] += 1
            else:
                days[s][2] += 1
            if j == len(seq) - 1 or seq[j + 1] != s + 1:
                days[s + 1][3] += 1
    assert got == {d: tuple(v) for d, v in days.items()}


# --------------------------------------------------------------------------
# exact_floordiv vs Python // (the r15 decimal-rounding fix)
# --------------------------------------------------------------------------

_vals = st.lists(
    st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.sampled_from([-1, 0, 1, 2**53, -(2**53), 2**60 + 1]),
    ),
    min_size=1,
    max_size=20,
)


@given(
    vals=_vals,
    w=st.sampled_from([1, 2, 7, 2_000_001, 3_600_000_000, 86_400_000_000]),
)
@settings(**_SETTINGS)
def test_exact_floordiv_matches_python(spark, vals, w):
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = df.select(
        "c", intervals.exact_floordiv(F.col("c"), w).alias("q")
    ).collect()
    for r in got:
        assert r["q"] == r["c"] // w, (r["c"], w)


# --------------------------------------------------------------------------
# merge_intervals vs a pure-Python sort-and-sweep merge
# --------------------------------------------------------------------------

_mivs = st.lists(
    st.tuples(
        st.integers(min_value=-40, max_value=120),
        st.integers(min_value=0, max_value=30),  # span (0 => empty, dropped)
    ),
    min_size=1,
    max_size=20,
)


@given(ivs=_mivs, width=st.sampled_from([1, 7, 64]))
@settings(**_SETTINGS)
def test_merge_intervals_matches_python(spark, ivs, width):
    rows = [("g", s, s + d) for s, d in ivs]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = sorted(
        (r["island_s"], r["island_e"], r["n_merged"])
        for r in intervals.merge_intervals(
            df, ["g"], "s", "e", bucket_width=width
        ).collect()
    )
    want = []
    for s, e in sorted((s, e) for _, s, e in rows):
        if e <= s:
            continue
        if want and s <= want[-1][1]:
            ps, pe, n = want[-1]
            want[-1] = (ps, max(pe, e), n + 1)
        else:
            want.append((s, e, 1))
    assert got == [tuple(w) for w in want]


# --------------------------------------------------------------------------
# interval_gaps / interval_intersect vs pure-Python references
# --------------------------------------------------------------------------


def _py_merge_ref(ivs):
    out = []
    for s, e in sorted(ivs):
        if e <= s:
            continue
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@given(ivs=_mivs, width=st.sampled_from([1, 7, 64]))
@settings(**_SETTINGS)
def test_interval_gaps_matches_python(spark, ivs, width):
    rows = [("g", s, s + d) for s, d in ivs]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = sorted(
        (r["gap_s"], r["gap_e"], r["gap_len"])
        for r in intervals.interval_gaps(
            df, ["g"], "s", "e", bucket_width=width
        ).collect()
    )
    isl = _py_merge_ref([(s, e) for _, s, e in rows])
    want = [
        (isl[i][1], isl[i + 1][0], isl[i + 1][0] - isl[i][1])
        for i in range(len(isl) - 1)
    ]
    assert got == want


@given(a=_mivs, b=_mivs, width=st.sampled_from([1, 7, 64]))
@settings(**_SETTINGS)
def test_interval_intersect_matches_python(spark, a, b, width):
    da = spark.createDataFrame([("g", s, s + d) for s, d in a], "g string, s long, e long")
    db = spark.createDataFrame([("g", s, s + d) for s, d in b], "g string, s long, e long")
    got = sorted(
        (r["isect_s"], r["isect_e"])
        for r in intervals.interval_intersect(
            da, db, ["g"], "s", "e", bucket_width=width
        ).collect()
    )
    want = sorted(
        (max(s1, s2), min(e1, e2))
        for s1, e1 in _py_merge_ref([(s, s + d) for s, d in a])
        for s2, e2 in _py_merge_ref([(s, s + d) for s, d in b])
        if max(s1, s2) < min(e1, e2)
    )
    assert got == want


# --------------------------------------------------------------------------
# histogram MV quantiles vs a pure-Python reference of the same rule
# --------------------------------------------------------------------------

from aws_logs_to_parquet_converter_spark.operators import histogram  # noqa: E402


def _py_hdr(v, m):
    if v < (1 << m):
        return v
    msb = v.bit_length() - 1
    return (msb - m + 1) * (1 << m) + ((v >> (msb - m)) - (1 << m))


def _py_hdr_floor(idx, m):
    if idx < (1 << m):
        return idx
    level, sub = divmod(idx, 1 << m)
    return ((1 << m) + sub) << (level - 1)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=(1 << 62)), min_size=1, max_size=60
    ),
    m=st.sampled_from([1, 5, 11]),
    qs=st.lists(
        st.integers(min_value=1, max_value=1000),
        min_size=1, max_size=4, unique=True,
    ),
)
@settings(**_SETTINGS)
def test_hist_quantiles_match_python(spark, vals, m, qs):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    segs = histogram.hist_build(df, ["g"], "v", precision_bits=m)
    got = {
        r["q_milli"]: (r["value_lb"], r["n"])
        for r in histogram.hist_quantiles(
            segs, ["g"], qs, precision_bits=m
        ).collect()
    }
    from collections import Counter

    counts = Counter(_py_hdr(v, m) for v in vals)
    n = len(vals)
    for q in qs:
        rank = -(-q * n // 1000)
        cum = 0
        for b in sorted(counts):
            cum += counts[b]
            if cum >= rank:
                assert got[q] == (_py_hdr_floor(b, m), n), (q, m)
                break


# --------------------------------------------------------------------------
# setsim_join vs brute-force pair scan (prefix-filter completeness +
# verification exactness under arbitrary token-frequency profiles)
# --------------------------------------------------------------------------

_corpus = st.lists(
    st.sets(
        st.integers(min_value=0, max_value=25), min_size=1, max_size=12
    ),
    min_size=2,
    max_size=14,
)


@given(sets=_corpus, thr=st.sampled_from([300, 500, 800, 1000]))
@settings(**_SETTINGS)
def test_setsim_matches_brute_force(spark, sets, thr):
    from aws_logs_to_parquet_converter_spark.operators import setsim

    docs = [(i, " ".join(f"t{t}" for t in sorted(s))) for i, s in enumerate(sets)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in setsim.setsim_join(df, "doc_id", "text", thr).collect()
    }
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if 1000 * inter >= thr * uni:
                want[(i, j)] = (inter, uni)
    assert got == want


# --------------------------------------------------------------------------
# xcorr_stats vs a pure-Python pair scan (holes, negative lags)
# --------------------------------------------------------------------------

_series = st.dictionaries(
    st.integers(min_value=0, max_value=12),  # bucket
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=10,
)


@given(series=_series, lag=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_xcorr_matches_python(spark, series, lag):
    from aws_logs_to_parquet_converter_spark.operators import timeseries

    rows = [("g", b, x, y) for b, (x, y) in series.items()]
    df = spark.createDataFrame(rows, "g string, b long, x long, y long")
    got = {
        r["lag"]: (r["n_pairs"], r["sum_x"], r["sum_y"], r["sum_xx"], r["sum_yy"], r["sum_xy"])
        for r in timeseries.xcorr_stats(df, "g", "b", "x", "y", max_lag=lag).collect()
    }
    want = {}
    for t, (x, _) in series.items():
        for k in range(-lag, lag + 1):
            if (t - k) in series:
                y = series[t - k][1]
                n, sx, sy, sxx, syy, sxy = want.get(k, (0,) * 6)
                want[k] = (n + 1, sx + x, sy + y, sxx + x * x, syy + y * y, sxy + x * y)
    assert got == want


# --------------------------------------------------------------------------
# weighted exact quantiles vs the weight-expanded multiset
# --------------------------------------------------------------------------

_weighted = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),  # value
        st.integers(min_value=1, max_value=7),  # weight
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_weighted, q=st.sampled_from([1, 250, 500, 999, 1000]))
@settings(**_SETTINGS)
def test_weighted_quantiles_match_expansion(spark, rows, q):
    import math

    from aws_logs_to_parquet_converter_spark.operators.ranking import (
        exact_quantiles_disc,
    )

    df = spark.createDataFrame(
        [("g", v, w) for v, w in rows], "g string, v long, w long"
    )
    got = {
        r["q_milli"]: (r["value"], r["n"])
        for r in exact_quantiles_disc(df, ["g"], "v", [q], weight_col="w").collect()
    }
    expanded = sorted(v for v, w in rows for _ in range(w))
    want = expanded[math.ceil(q * len(expanded) / 1000) - 1]
    assert got[q] == (want, len(expanded))


# --------------------------------------------------------------------------
# theilsen_trend vs pure-Python pair-slope median (truncation parity)
# --------------------------------------------------------------------------

_ts_series = st.dictionaries(
    st.integers(min_value=-20, max_value=20),  # order
    st.integers(min_value=-1000, max_value=1000),  # value
    min_size=2,
    max_size=12,
)


@given(series=_ts_series, scale=st.sampled_from([1, 1000, 1_000_000]))
@settings(**_SETTINGS)
def test_theilsen_matches_python(spark, series, scale):
    import math

    from aws_logs_to_parquet_converter_spark.operators import timeseries

    rows = [("g", o, v) for o, v in series.items()]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {
        r["g"]: (r["median_slope_scaled"], r["n_pairs"])
        for r in timeseries.theilsen_trend(
            df, "g", "o", "v", slope_scale=scale
        ).collect()
    }
    os_ = sorted(series)
    slopes = []
    for i, o1 in enumerate(os_):
        for o2 in os_[i + 1 :]:
            num = (series[o2] - series[o1]) * scale
            den = o2 - o1
            q = abs(num) // den
            slopes.append(q if num >= 0 else -q)
    slopes.sort()
    want = (slopes[math.ceil(500 * len(slopes) / 1000) - 1], len(slopes))
    assert got == {"g": want}


# --------------------------------------------------------------------------
# mann_whitney_u vs brute-force pair scan
# --------------------------------------------------------------------------

_mw_rows = st.lists(
    st.tuples(st.booleans(), st.integers(min_value=0, max_value=12)),
    min_size=1,
    max_size=40,
)


@given(rows=_mw_rows)
@settings(**_SETTINGS)
def test_mann_whitney_matches_python(spark, rows):
    from collections import Counter

    from aws_logs_to_parquet_converter_spark.operators.ranking import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [("g", s, v) for s, v in rows], "g string, s boolean, v long"
    )
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["u2_a"], r["tie_cubes"])
        for r in mann_whitney_u(df, ["g"], "s", "v").collect()
    }
    avs = [v for s, v in rows if s]
    bvs = [v for s, v in rows if not s]
    u2 = sum(2 if a > b else (1 if a == b else 0) for a in avs for b in bvs)
    ties = Counter(v for _, v in rows)
    want = (len(avs), len(bvs), u2, sum(t**3 - t for t in ties.values()))
    assert got == {"g": want}
