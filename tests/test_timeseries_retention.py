"""Round-11 log-ops: time-spine gap fill and dt-partition retention."""

import glob

import pytest
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.compact import expire_partitions
from aws_logs_to_parquet_converter_spark.operators.timeseries import (
    gap_filled_counts,
    time_spine,
)


# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------


def _events(spark):
    rows = [
        ("2024-01-01 00:10:00", "a", 1),
        ("2024-01-01 00:40:00", "a", 2),
        # hour 01 entirely missing
        ("2024-01-01 02:05:00", "b", 3),
        ("2024-01-01 03:59:00", "a", 4),
    ]
    return spark.createDataFrame(rows, "ts string, k string, v long").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )


def test_time_spine_covers_span_inclusive(spark):
    spine = [r.bucket.strftime("%H") for r in time_spine(_events(spark), "ts").collect()]
    assert sorted(spine) == ["00", "01", "02", "03"]


def test_time_spine_rejects_unknown_unit(spark):
    with pytest.raises(ValueError, match="unit"):
        time_spine(_events(spark), "ts", unit="fortnight")


def test_gap_filled_counts_zero_fills_missing_buckets(spark):
    dense = gap_filled_counts(
        _events(spark), "ts", key_cols=["k"],
        aggs={"n": (F.count("*"), 0), "v_sum": (F.sum("v"), 0)},
    )
    got = {
        (r.bucket.strftime("%H"), r.k): (r.n, r.v_sum) for r in dense.collect()
    }
    # 4 hours x 2 keys: every combination present
    assert len(got) == 8
    assert got[("00", "a")] == (2, 3)
    assert got[("01", "a")] == (0, 0)  # the gap reads zero, not absent
    assert got[("01", "b")] == (0, 0)
    assert got[("02", "b")] == (1, 3)
    assert got[("03", "a")] == (1, 4)


def test_gap_filled_counts_global_no_keys(spark):
    dense = gap_filled_counts(_events(spark), "ts")
    got = {r.bucket.strftime("%H"): r.n_events for r in dense.collect()}
    assert got == {"00": 2, "01": 0, "02": 1, "03": 1}


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------


def _write_days(spark, dest, days):
    for d in days:
        spark.createDataFrame([(d, 1)], "dt string, x long").write.mode(
            "append"
        ).partitionBy("dt").parquet(dest)


def test_expire_partitions_drops_only_older(spark, tmp_path):
    dest = str(tmp_path / "wh")
    _write_days(spark, dest, ["2024-01-01", "2024-01-02", "2024-01-03"])
    gone = expire_partitions(spark, dest, "2024-01-03")
    assert gone == ["2024-01-01", "2024-01-02"]
    left = {p.split("dt=")[1] for p in glob.glob(f"{dest}/dt=*")}
    assert left == {"2024-01-03"}
    # data in the surviving partition still reads
    assert spark.read.parquet(dest).count() == 1


def test_expire_partitions_dry_run_deletes_nothing(spark, tmp_path):
    dest = str(tmp_path / "wh")
    _write_days(spark, dest, ["2024-01-01", "2024-01-02"])
    gone = expire_partitions(spark, dest, "2024-01-02", dry_run=True)
    assert gone == ["2024-01-01"]
    assert len(glob.glob(f"{dest}/dt=*")) == 2


def test_expire_partitions_rejects_malformed_cutoff(spark, tmp_path):
    with pytest.raises(ValueError, match="YYYY-MM-DD"):
        expire_partitions(spark, str(tmp_path), "2024-1-5")


def test_expire_partitions_missing_dest(spark, tmp_path):
    assert expire_partitions(spark, str(tmp_path / "nope"), "2024-01-01") == []


def test_cli_maintain_expire_before(spark, tmp_path, capsys):
    from aws_logs_to_parquet_converter_spark import cli

    dest = str(tmp_path / "wh")
    _write_days(spark, dest, ["2024-01-01", "2024-01-05"])
    args = cli.build_maintenance_parser().parse_args(
        ["--dest", dest, "--expire-before", "2024-01-02", "--dry-run"]
    )
    assert cli.run_maintenance(args) == 0
    assert "dt=2024-01-01: would expire" in capsys.readouterr().out
    assert len(glob.glob(f"{dest}/dt=*")) == 2

    args = cli.build_maintenance_parser().parse_args(
        ["--dest", dest, "--expire-before", "2024-01-02"]
    )
    assert cli.run_maintenance(args) == 0
    left = {p.split("dt=")[1] for p in glob.glob(f"{dest}/dt=*")}
    assert left == {"2024-01-05"}


def test_rolling_active_users(spark):
    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        rolling_active_users,
    )

    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 1),  # dup same day
        ("2024-01-01 10:00:00", 2),
        ("2024-01-03 10:00:00", 3),
        ("2024-01-09 10:00:00", 1),  # 8 days later: day-1 users aged out
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    out = {
        r.bucket.strftime("%m-%d"): r.active_3d
        for r in rolling_active_users(df, "ts", "user_id", 3).collect()
    }
    # 3-day trailing windows: 01-01 {1,2}; 01-02 {1,2}; 01-03 {1,2,3};
    # 01-04 {3}; 01-05 {3}; 01-06..08 {}; 01-09 {1}
    assert out == {
        "01-01": 2, "01-02": 2, "01-03": 3, "01-04": 1, "01-05": 1,
        "01-06": 0, "01-07": 0, "01-08": 0, "01-09": 1,
    }
    with pytest.raises(ValueError, match="window_days"):
        rolling_active_users(df, "ts", "user_id", 0)


def test_rolling_active_users_randomized_differential(spark):
    """Random event stream vs a driver-side reference of the trailing
    N-day distinct-user count over the full day spine."""
    import datetime
    import random

    from aws_logs_to_parquet_converter_spark.operators.timeseries import (
        rolling_active_users,
    )

    rng = random.Random(7)
    base = datetime.date(2024, 3, 1)
    rows = [
        (
            (base + datetime.timedelta(days=rng.randint(0, 20))).strftime(
                "%Y-%m-%d 12:00:00"
            ),
            rng.randint(1, 9),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    active = {}
    for ts, u in rows:
        active.setdefault(ts[:10], set()).add(u)
    days = sorted(active)
    lo = datetime.date.fromisoformat(days[0])
    hi = datetime.date.fromisoformat(days[-1])
    want = {}
    d = lo
    while d <= hi:
        users = set()
        for back in range(4):
            users |= active.get((d - datetime.timedelta(days=back)).isoformat(), set())
        want[d.isoformat()] = len(users)
        d += datetime.timedelta(days=1)

    got = {
        r.bucket.strftime("%Y-%m-%d"): r.active_4d
        for r in rolling_active_users(df, "ts", "user_id", 4).collect()
    }
    assert got == want


def test_expire_partitions_skips_nonconforming_dirs(spark, tmp_path):
    # dt values that fail the YYYY-MM-DD gate compare lexicographically
    # wrong against the cutoff — they must be skipped, never deleted
    # (r11 advisor: delete is recursive/destructive)
    dest = str(tmp_path / "wh")
    _write_days(spark, dest, ["2024-01-01", "2024-01-03"])
    import os

    os.makedirs(f"{dest}/dt=2024-1-2")  # < cutoff lexicographically
    os.makedirs(f"{dest}/dt=20230101")  # < cutoff lexicographically
    gone = expire_partitions(spark, dest, "2024-01-03")
    assert gone == ["2024-01-01"]
    left = {p.split("dt=")[1] for p in glob.glob(f"{dest}/dt=*")}
    assert left == {"2024-01-03", "2024-1-2", "20230101"}
