"""Randomized differentials for the round-14 operators: hypothesis
draws small inputs, a pure-Python reference recomputes the closed form,
and the Spark result must match EXACTLY (the r11-r13 convention).

max_examples stays small: each example is a Spark job; the properties
target arithmetic/boundary logic (half-open semantics, bucket
ownership, cumulative-OR first-seen, self-pair bucket counting), not
throughput.
"""

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_logs_to_parquet_converter_spark.operators import bitmap, intervals
from aws_logs_to_parquet_converter_spark.operators.timeseries import (
    growth_accounting,
    kendall_trend,
)

_SETTINGS = dict(max_examples=10, deadline=None)


# --------------------------------------------------------------------------
# interval_join vs a brute-force O(n*m) Python scan
# --------------------------------------------------------------------------

_ivs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=-50, max_value=120),
        st.integers(min_value=0, max_value=40),  # span (0 => empty)
    ),
    min_size=1,
    max_size=14,
)


@given(lrows=_ivs, rrows=_ivs, width=st.sampled_from([1, 7, 64]))
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce(spark, lrows, rrows, width):
    left = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(lrows)],
        "k string, ls long, le long, lid long",
    )
    right = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(rrows)],
        "k string, rs long, re long, rid long",
    )
    got = {
        (r["k"], r["lid"], r["rid"])
        for r in intervals.interval_join(
            left, right, "ls", "le", "rs", "re", keys=["k"], bucket_width=width
        ).collect()
    }
    want = set()
    for i, (lk, ls, ld) in enumerate(lrows):
        for j, (rk, rs, rd) in enumerate(rrows):
            le, re = ls + ld, rs + rd
            if lk == rk and ld > 0 and rd > 0 and ls < re and rs < le:
                want.add((lk, i, j))
    assert got == want


# --------------------------------------------------------------------------
# peak_concurrency vs a pure-Python sweep (negatives + ties included)
# --------------------------------------------------------------------------


@given(rows=_ivs, width=st.sampled_from([1, 13, 100]))
@settings(**_SETTINGS)
def test_peak_concurrency_matches_python(spark, rows, width):
    nonempty = [(k, s, s + d) for k, s, d in rows if d > 0]
    if not nonempty:
        return
    df = spark.createDataFrame(nonempty, "g string, s long, e long")
    got = {
        r["g"]: (r["peak"], r["peak_at"])
        for r in intervals.peak_concurrency(
            df, ["g"], "s", "e", bucket_width=width
        ).collect()
    }
    by_g = defaultdict(lambda: defaultdict(int))
    for g, s, e in nonempty:
        by_g[g][s] += 1
        by_g[g][e] -= 1
    for g, deltas in by_g.items():
        run, best, best_at = 0, None, None
        for t in sorted(deltas):
            run += deltas[t]
            if best is None or run > best:
                best, best_at = run, t
        assert got[g] == (best, best_at)


# --------------------------------------------------------------------------
# growth_accounting vs a pure-Python per-id classification
# --------------------------------------------------------------------------

_activity = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),    # id
        st.integers(min_value=0, max_value=12),   # slice
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_activity)
@settings(**_SETTINGS)
def test_growth_accounting_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "uid long, d long")
    got = {
        r["d"]: (r["n_new"], r["n_returning"], r["n_resurrected"], r["n_churned"])
        for r in growth_accounting(df, "uid", "d").collect()
    }
    days = defaultdict(lambda: [0, 0, 0, 0])
    per_id = defaultdict(set)
    for uid, d in rows:
        per_id[uid].add(d)
    for ss in per_id.values():
        seq = sorted(ss)
        for i, s in enumerate(seq):
            if i == 0:
                days[s][0] += 1
            elif seq[i - 1] == s - 1:
                days[s][1] += 1
            else:
                days[s][2] += 1
            if i == len(seq) - 1 or seq[i + 1] != s + 1:
                days[s + 1][3] += 1
    assert got == {d: tuple(v) for d, v in days.items()}


# --------------------------------------------------------------------------
# bitmap_first_seen vs a Python min-slice scan (word boundaries covered)
# --------------------------------------------------------------------------

_seen = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # slice
        st.one_of(
            st.integers(min_value=0, max_value=200),
            st.sampled_from([0, 63, 64, 127, 128, 2**40]),
        ),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_seen)
@settings(**_SETTINGS)
def test_bitmap_first_seen_matches_min_slice(spark, rows):
    df = spark.createDataFrame(rows, "sl long, id long")
    segs = bitmap.bitmap_build(df, ["sl"], "id")
    got = {
        r["sl"]: r["n_new"]
        for r in bitmap.bitmap_first_seen(segs, [], "sl").collect()
    }
    first = {}
    for sl, i in rows:
        first[i] = min(first.get(i, sl), sl)
    want = defaultdict(int)
    for sl in first.values():
        want[sl] += 1
    active = {sl for sl, _ in rows}
    assert got == {sl: want.get(sl, 0) for sl in active}


# --------------------------------------------------------------------------
# kendall_trend (self-pair bucket counting) vs a Python pair scan
# --------------------------------------------------------------------------

_buckets = st.lists(
    st.integers(min_value=0, max_value=6),
    min_size=1,
    max_size=12,
    unique=True,
).flatmap(
    lambda days: st.tuples(
        st.just(days),
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=len(days),
            max_size=len(days),
        ),
    )
)


@given(dv=_buckets)
@settings(**_SETTINGS)
def test_kendall_trend_matches_python(spark, dv):
    days, vals = dv
    rows = [("g", f"d{d}", v) for d, v in zip(sorted(days), vals)]
    df = spark.createDataFrame(rows, "g string, day string, n long")
    (r,) = kendall_trend(df, "g", "day", "n").collect()
    conc = disc = tied = 0
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            d = vals[j] - vals[i]
            conc += d > 0
            disc += d < 0
            tied += d == 0
    assert (
        r["n_buckets"], r["concordant"], r["discordant"], r["tied"], r["s_stat"]
    ) == (len(vals), conc, disc, tied, conc - disc)
