#!/usr/bin/env python
"""Prefix-filter set-similarity join (operators/setsim.py) at the
boilerplate-heavy corpus shape — the shape where a NAIVE uncapped
token self-join is quadratic and the prefix-filtered join is linear.

Corpus model: every doc carries H hot boilerplate tokens (df = N) plus
R rare tokens; each rare-token set appears in exactly TWO docs (planted
near-dup twins, Jaccard 1.0), so the TRUE answer is N/2 pairs.  A
naive inverted-index join with no cap generates C(N,2) candidates per
hot token (the df-cap in ngram_jaccard_pairs exists precisely to
amputate those lists, at the cost of exactness the oracle must
mirror).  The prefix filter keeps exactness AND never indexes the hot
tokens: with tau=0.8 and 30 tokens/doc the prefix is the 7 RAREST
tokens — all rare — so candidates are exactly the twin pairs plus
vocab-collision noise, O(N) at fixed dup rate.

Measured here: ours at N (default 200k) and the naive form at a
N_naive (default 4k) where its hot-token candidate volume (H *
C(N,2) pairs) is still runnable; the asymmetry is the point — scale
the naive N by x and its candidate volume grows x^2 while ours grows
x.  Results land in SCALE.md.

Usage: python scripts/measure_setsim.py [--docs 200000] [--naive-docs 4000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    w = time.time() - t0
    print(f"{label}: {w:.2f}s {out if out is not None else ''}")
    return w


def corpus(spark, n: int, hot: int = 10, rare: int = 20, vocab: int = 20_000_000):
    """(_id, _tk) distinct token pairs: `hot` boilerplate tokens on every
    doc + `rare` tokens keyed by twin seed (id % (n/2)), so docs i and
    i + n/2 are exact twins."""
    half = n // 2
    d = spark.range(n).select(
        F.col("id").alias("_id"),
        F.concat(
            F.array(*[F.lit(f"hot{j}") for j in range(hot)]),
            F.transform(
                F.sequence(F.lit(1), F.lit(rare)),
                lambda i: F.concat(
                    F.lit("r"),
                    F.pmod(
                        F.xxhash64((F.col("id") % half) * 1000 + i), F.lit(vocab)
                    ),
                ),
            ),
        ).alias("_tks"),
    )
    return d.select("_id", F.explode("_tks").alias("_tk")).distinct()


def naive_join(tok, threshold_milli: int):
    """Uncapped inverted-index join: candidates from ANY shared token
    (the form whose hot-token lists are quadratic), then the same
    integer-exact verification filter."""
    sz = tok.groupBy("_id").agg(F.count("*").alias("_n"))
    t2 = tok.join(sz, "_id")
    a = t2.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "_tk")
    b = t2.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "_tk")
    common = (
        a.join(b, "_tk")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count("*").alias("_i"))
    )
    return common.where(
        F.lit(1000) * F.col("_i")
        >= F.lit(threshold_milli) * (F.col("_na") + F.col("_nb") - F.col("_i"))
    ).select("id_a", "id_b")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--naive-docs", type=int, default=4_000)
    args = ap.parse_args()

    from aws_logs_to_parquet_converter_spark.operators import setsim
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="setsim-skew", extra_conf={"spark.ui.enabled": "false"})
    import os

    print("loadavg:", tuple(round(x, 2) for x in os.getloadavg()))

    n = args.docs
    tok = corpus(spark, n)
    tok.persist()
    print("tokens:", tok.count(), "docs:", n)

    # ours at full N: true answer is n/2 twin pairs
    w_ours = timed(
        f"prefix-filtered setsim N={n}",
        lambda: setsim.setsim_join_tokens(tok, 800).count(),
    )

    # naive at the small N where it is still runnable
    n2 = args.naive_docs
    tok2 = corpus(spark, n2)
    tok2.persist()
    tok2.count()
    w_naive = timed(
        f"naive uncapped token join N={n2}",
        lambda: naive_join(tok2, 800).count(),
    )
    # ours at the SAME small N for a like-for-like ratio
    w_ours2 = timed(
        f"prefix-filtered setsim N={n2}",
        lambda: setsim.setsim_join_tokens(tok2, 800).count(),
    )
    print(
        f"like-for-like at N={n2}: naive {w_naive:.2f}s vs ours {w_ours2:.2f}s "
        f"= {w_naive / max(w_ours2, 1e-9):.1f}x; ours at {n // n2}x the docs: "
        f"{w_ours:.2f}s ({w_ours / max(w_ours2, 1e-9):.1f}x the small-N wall "
        f"for {n // n2}x the data; naive would be ~{(n // n2) ** 2}x its wall)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
