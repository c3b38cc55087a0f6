"""DSIR importance weights (Xie 2023): sign sanity on a separable
corpus, zero-token edge, bucket validation, and determinism."""

import pytest
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.textstats import (
    dsir_importance_weights,
)


@pytest.fixture()
def corpus(spark):
    # target slice talks about cats; the raw remainder about markets
    rows = [
        (1, "the cat sat on the mat with the cat", True),
        (2, "cat and cat and more cat on a mat", True),
        (3, "stock market prices fell on heavy trading volume", False),
        (4, "market traders sold stock as prices fell again", False),
        (5, "the cat watched the market", False),  # mixed
        (6, "", False),  # zero tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")


def test_dsir_separates_target_like_docs(spark, corpus):
    out = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_importance_weights(
            corpus, "doc_id", "text", F.col("is_tgt"), buckets=256, hash_fn="md5"
        ).collect()
    }
    # target-like docs score above market docs; the mixed doc in between
    assert out[1][1] > out[5][1] > out[3][1]
    assert out[2][1] > out[4][1]
    # zero-token doc: no features, weight exactly 0
    assert out[6] == (0, 0.0)
    # feature count = unigrams + bigrams = 2*tokens - 1
    assert out[1][0] == 2 * 9 - 1


def test_dsir_deterministic_and_partition_invariant(spark, corpus):
    a = dsir_importance_weights(
        corpus, "doc_id", "text", F.col("is_tgt"), buckets=64, hash_fn="md5"
    ).collect()
    b = dsir_importance_weights(
        corpus.repartition(7), "doc_id", "text", F.col("is_tgt"), buckets=64,
        hash_fn="md5",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_production_hash_mode_runs(spark, corpus):
    out = dsir_importance_weights(
        corpus, "doc_id", "text", F.col("is_tgt"), buckets=64, hash_fn="xxhash64"
    )
    assert out.count() == 6


def test_dsir_rejects_degenerate_buckets(spark, corpus):
    with pytest.raises(ValueError, match="buckets"):
        dsir_importance_weights(corpus, "doc_id", "text", F.col("is_tgt"), buckets=1)


def test_dsir_differential_vs_python_reference(spark, corpus):
    """Exact value check against a pure-Python reimplementation with
    the same md5 bucket draw, smoothing, and ROUND(3) convention."""
    import hashlib
    import math

    B, ALPHA = 64, 0.5

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B

    rows = corpus.collect()
    feats = []  # (doc_id, tgt, bucket)
    for r in rows:
        toks = [t for t in r.text.lower().split() if t]
        fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats.extend((r.doc_id, r.is_tgt, bucket(f)) for f in fs)
    c_raw, c_tgt = {}, {}
    for _, tgt, b in feats:
        c_raw[b] = c_raw.get(b, 0) + 1
        if tgt:
            c_tgt[b] = c_tgt.get(b, 0) + 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    lr = {
        b: math.log((c_tgt.get(b, 0) + ALPHA) / (n_tgt + ALPHA * B))
        - math.log((c_raw[b] + ALPHA) / (n_raw + ALPHA * B))
        for b in c_raw
    }
    want = {}
    for r in rows:
        toks = [t for t in r.text.lower().split() if t]
        fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        w = sum(lr[bucket(f)] for f in fs)
        want[r.doc_id] = (len(fs), round(round(w, 3) + 0.0, 3))

    from pyspark.sql import functions as F2

    got = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_importance_weights(
            corpus, "doc_id", "text", F2.col("is_tgt"), buckets=B, hash_fn="md5"
        ).collect()
    }
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, (k, got[k], want[k])
