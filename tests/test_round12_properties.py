"""Randomized differentials for the round-12 operators: hypothesis
draws small inputs, a pure-Python reference recomputes the closed form
(same integer/IEEE arithmetic the docstrings promise), and the Spark
result must match EXACTLY — the r11 scd2/rolling-actives convention.

max_examples stays small: each example is a Spark job; the properties
target arithmetic/boundary logic, not throughput.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.anomaly import (
    interarrival_regularity,
    winsorized_stats,
)
from aws_logs_to_parquet_converter_spark.operators.timeseries import (
    ewma_trailing,
    markov_transitions,
    seasonal_naive_backtest,
)

_SETTINGS = dict(max_examples=10, deadline=None)


# one key's state sequence: 2..8 states from a 3-letter alphabet
_seqs = st.lists(
    st.lists(st.sampled_from("ABC"), min_size=1, max_size=8),
    min_size=1,
    max_size=4,
)


@given(_seqs)
@settings(**_SETTINGS)
def test_markov_matches_python_reference(spark, sequences):
    rows = [
        (u, i, s)
        for u, seq in enumerate(sequences)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u long, seq long, state string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob_ppm"])
        for r in markov_transitions(df, "u", ["seq"], "state").collect()
    }
    counts: dict = {}
    for seq in sequences:
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals: dict = {}
    for (a, _), n in counts.items():
        totals[a] = totals.get(a, 0) + n
    want = {
        k: (n, n * 1_000_000 // totals[k[0]]) for k, n in counts.items()
    }
    assert got == want


@given(_seqs)
@settings(**_SETTINGS)
def test_markov_rows_normalize_within_floor_loss(spark, sequences):
    """Per from-state the ppm column sums to 1e6 minus at most the
    per-destination floor losses."""
    rows = [
        (u, i, s)
        for u, seq in enumerate(sequences)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u long, seq long, state string")
    out = markov_transitions(df, "u", ["seq"], "state").collect()
    by_from: dict = {}
    for r in out:
        by_from.setdefault(r["from_state"], []).append(r["prob_ppm"])
    for probs in by_from.values():
        assert 1_000_000 - len(probs) < sum(probs) <= 1_000_000


@given(
    st.lists(st.integers(min_value=0, max_value=3600), min_size=5, max_size=12)
)
@settings(**_SETTINGS)
def test_interarrival_matches_python_reference(spark, gaps):
    """Build one user's events from the drawn second-gaps and mirror
    the exact integer/IEEE formula in Python."""
    offsets = [0]
    for g in gaps:
        offsets.append(offsets[-1] + g)
    rows = [(1, i, o) for i, o in enumerate(offsets)]
    df = spark.createDataFrame(rows, "u long, eid long, off long").select(
        "u",
        "eid",
        (F.timestamp_seconds(F.lit(1700000000) + F.col("off"))).alias("ts"),
    )
    row = interarrival_regularity(df, "u", "ts", "eid").collect()[0]
    g_us = [g * 1_000_000 for g in gaps]
    n, sg = len(g_us), sum(g_us)
    sg2 = sum(x * x for x in g_us)
    assert row["n_gaps"] == n
    assert row["mean_gap_us"] == sg // n
    if sg == 0:
        assert row["cv_ppm"] == 0
    else:
        nf, gf, g2f = float(n), float(sg), float(sg2)
        var = max((nf * g2f - gf * gf) / (nf * (nf - 1.0)), 0.0)
        assert row["cv_ppm"] == math.floor(1_000_000.0 * math.sqrt(var) * nf / gf)


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12)
)
@settings(**_SETTINGS)
def test_ewma_matches_python_reference(spark, values):
    rows = [("g", f"d{i:02d}", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, d string, n long")
    got = {
        r["d"]: r["ewma_milli"]
        for r in ewma_trailing(df, "k", "d", "n").collect()
    }
    for t in range(len(values)):
        frame = values[max(0, t - 6) : t + 1]
        weights = [1 << i for i in range(len(frame))]  # oldest -> 1
        num = sum(v * w for v, w in zip(frame, weights))
        den = sum(weights)
        assert got[f"d{t:02d}"] == 1000 * num // den


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=8, max_size=20)
)
@settings(**_SETTINGS)
def test_seasonal_naive_matches_python_reference(spark, values):
    rows = [("g", f"d{i:02d}", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, d string, n long")
    out = seasonal_naive_backtest(df, "k", "d", "n", season=7).collect()
    errs = [values[i] - values[i - 7] for i in range(7, len(values))]
    if not errs:
        assert out == []
        return
    row = out[0]
    assert row["n_scored"] == len(errs)
    assert row["mae_milli"] == 1000 * sum(abs(e) for e in errs) // len(errs)
    # Spark `div` truncates toward zero (verified == DuckDB `//`);
    # Python // floors, so mirror truncation explicitly for the bias
    tot = 1000 * sum(errs)
    trunc = abs(tot) // len(errs) * (1 if tot >= 0 else -1)
    assert row["bias_milli"] == trunc


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=2, max_size=15)
)
@settings(**_SETTINGS)
def test_winsorize_matches_python_reference(spark, values):
    df = spark.createDataFrame([("g", v) for v in values], "src string, v long")
    row = winsorized_stats(df, "src", "v").collect()[0]

    def pct(sorted_vals, q):
        pos = q * (len(sorted_vals) - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        frac = pos - lo
        return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac

    sv = sorted(values)
    plo, phi = pct(sv, 0.25), pct(sv, 0.75)
    clamped = [min(max(float(v), plo), phi) for v in values]
    assert row["n"] == len(values)
    assert row["n_clamped_low"] == sum(1 for v in values if v < plo)
    assert row["n_clamped_high"] == sum(1 for v in values if v > phi)
    assert row["sum_clamped_x4"] == sum(int(c * 4) for c in clamped)
