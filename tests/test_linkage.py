"""Fellegi–Sunter record linkage (operators/linkage.py): hand-scored
pairs, the NULL-is-no-information rule, threshold and blocking
contracts."""

import pytest

from aws_logs_to_parquet_converter_spark.operators import linkage


def _link(spark, lrows, rrows, **kw):
    left = spark.createDataFrame(lrows, "lid long, blk long, f1 string, f2 long")
    right = spark.createDataFrame(rrows, "rid long, blk long, f1 string, f2 long")
    kw.setdefault("block_cols", ["blk"])
    kw.setdefault("fields", [("f1", 1000, -500), ("f2", 2000, -100)])
    kw.setdefault("threshold_milli", -10**9)
    return {
        (r["lid"], r["rid"]): (r["n_agree"], r["n_disagree"], r["score_milli"])
        for r in linkage.fellegi_sunter_link(
            left, right, "lid", "rid", **kw
        ).collect()
    }


def test_hand_scored_agreement_patterns(spark):
    got = _link(
        spark,
        [(1, 0, "x", 7)],
        [(10, 0, "x", 7), (11, 0, "x", 8), (12, 0, "y", 8)],
    )
    assert got[(1, 10)] == (2, 0, 3000)   # both agree
    assert got[(1, 11)] == (1, 1, 900)    # f1 agrees, f2 disagrees
    assert got[(1, 12)] == (0, 2, -600)   # both disagree


def test_null_contributes_zero_weight(spark):
    got = _link(
        spark,
        [(1, 0, None, 7)],
        [(10, 0, "x", 7), (11, 0, None, 8)],
    )
    # f1 NULL on left: neither agree nor disagree
    assert got[(1, 10)] == (1, 0, 2000)
    assert got[(1, 11)] == (0, 1, -100)


def test_threshold_filters(spark):
    got = _link(
        spark,
        [(1, 0, "x", 7)],
        [(10, 0, "x", 7), (12, 0, "y", 8)],
        threshold_milli=0,
    )
    assert (1, 10) in got and (1, 12) not in got


def test_blocking_confines_pairs(spark):
    got = _link(spark, [(1, 0, "x", 7)], [(10, 1, "x", 7)])
    assert got == {}


def test_contracts(spark):
    left = spark.createDataFrame([(1, 0, "x", 7)], "lid long, blk long, f1 string, f2 long")
    with pytest.raises(ValueError, match="block_cols"):
        linkage.fellegi_sunter_link(left, left, "lid", "lid", [], [("f1", 1, -1)])
    with pytest.raises(ValueError, match="field"):
        linkage.fellegi_sunter_link(left, left, "lid", "lid", ["blk"], [])
