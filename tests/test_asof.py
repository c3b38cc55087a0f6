"""as-of join unit semantics (operators/asof.py) — especially the
NULL-payload atomicity fix: the matched right row's timestamp and
payload must come from the SAME row (round-2 advisor finding)."""

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from aws_logs_to_parquet_converter_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, lts timestamp"
    )
    # nearest right row (09:59) carries a NULL payload; an older row
    # (09:00) carries a real value.
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "old"),
            (1, _ts("2024-01-01 09:59:00"), None),
        ],
        "k int, rts timestamp, v string",
    )
    return left, right


def test_null_payload_from_nearest_row_stays_null(spark):
    """A per-column fill would resurrect 'old' from the farther row;
    the struct fill must report the nearest row's NULL."""
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "lts", "rts", ["v"]).collect()
    assert len(out) == 1
    assert out[0].v_asof is None


def test_tolerance_judged_on_same_row_as_payload(spark):
    """tolerance=120s: nearest row (09:59) is within tolerance but has
    NULL payload -> NULL; the 09:00 row must NOT leak through even
    though its value is non-null (it is outside tolerance anyway)."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "k", "lts", "rts", ["v"], tolerance_seconds=120
    ).collect()
    assert out[0].v_asof is None


def test_backward_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2024-01-01 10:00:00"))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 5.0)], "k int, rts timestamp, v double"
    )
    rows = {r.k: r.v_asof for r in asof_join(left, right, "k", "k", "lts", "rts", ["v"]).collect()}
    assert rows == {1: 5.0, 2: None}


def test_forward_with_tolerance_bounds(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"), "soon"), (1, _ts("2024-01-01 09:00:00"), "past")],
        "k int, rts timestamp, v string",
    )
    hit = asof_join(
        left, right, "k", "k", "lts", "rts", ["v"],
        direction="forward", tolerance_seconds=3600,
    ).collect()
    assert hit[0].v_asof == "soon"
    miss = asof_join(
        left, right, "k", "k", "lts", "rts", ["v"],
        direction="forward", tolerance_seconds=60,
    ).collect()
    assert miss[0].v_asof is None


def test_asof_null_keys_and_null_timestamps_never_match(spark):
    """JOIN equality semantics (round-7 review finding): NULL-key and
    NULL-ts right rows are never matches; NULL-key/-ts left rows stay
    in the output matchless — in BOTH directions (forward's descending
    order used to hand a NULL-ts left row the minimum-ts payload)."""
    from aws_logs_to_parquet_converter_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 50, 1), ("k", 50, 2), ("k", None, 3)],
        "k string, ts long, lid int",
    )
    right = spark.createDataFrame(
        [(None, 5, "null-key"), ("k", None, "null-ts"), ("k", 40, "real")],
        "k string, ts long, payload string",
    )
    for direction, expect in (
        ("backward", {1: None, 2: "real", 3: None}),
        ("forward", {1: None, 2: None, 3: None}),  # no right ts >= 50
    ):
        got = {
            r.lid: r.payload_asof
            for r in asof_join(
                left, right, "k", "k", "ts", "ts", ["payload"],
                direction=direction,
            ).collect()
        }
        assert got == expect, (direction, got)
