"""Z-order layout tests: interleave arithmetic is exact, and the write
layout actually delivers the multi-column locality that justifies it —
per-file spans on BOTH dimensions beat a single-column sort."""

import glob

import pytest

from aws_logs_to_parquet_converter_spark.operators import zorder


def test_morton_interleave_known_bits(spark):
    """bits=2 over ranges making quantization the identity (lo=0,
    hi=4 -> q = v for v in 0..3): interleave(x=0b10, y=0b01) places
    x-bit j at position 2j and y-bit j at 2j+1 -> z = 0b0110 = 6."""
    df = spark.createDataFrame([(2, 1)], "x long, y long")
    z = df.select(zorder.zorder_value({"x": (0, 4), "y": (0, 4)}, bits=2).alias("z"))
    assert z.first().z == 0b0110
    # exhaustive 4x4 grid: distinct z per cell, and the curve's first
    # quadrant (x,y in 0..1) occupies exactly z 0..3
    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    zs = {
        (r.x, r.y): r.z
        for r in grid.select(
            "x", "y", zorder.zorder_value({"x": (0, 4), "y": (0, 4)}, bits=2).alias("z")
        ).collect()
    }
    assert len(set(zs.values())) == 16
    assert {zs[(x, y)] for x in range(2) for y in range(2)} == {0, 1, 2, 3}


def test_zorder_value_edges(spark):
    df = spark.createDataFrame([(100, -5), (None, 3)], "x long, y long")
    col = zorder.zorder_value({"x": (0, 4), "y": (0, 4)}, bits=2)
    rows = df.select(col.alias("z")).collect()
    # out-of-range clamps to the curve edge (q=3 / q=0): finite z
    assert rows[0].z == 0b0101  # x=3 -> bits at positions 0,2; y=0 -> none
    assert rows[1].z is None  # NULL propagates
    with pytest.raises(ValueError):
        zorder.zorder_value({"x": (0, 4)})
    with pytest.raises(ValueError):
        zorder.zorder_value({c: (0, 1) for c in "abcde"}, bits=16)
    with pytest.raises(ValueError):
        zorder.zorder_value({"x": (4, 4), "y": (0, 4)})


def _per_file_spans(spark, path, col):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        r = spark.read.parquet(f).agg({col: "min"}).collect()[0][0], \
            spark.read.parquet(f).agg({col: "max"}).collect()[0][0]
        spans.append(r[1] - r[0])
    return spans


def test_write_zordered_beats_linear_sort_on_second_dim(spark, tmp_path):
    """32x32 grid into 8 files: a linear sort on x leaves every file
    spanning the FULL y domain; the z-order layout must cut the mean
    y-span at least in half while keeping x-spans bounded — the
    row-group-stats pruning claim, measured on real files."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder.write_zordered(grid, zpath, ["x", "y"], num_files=8, bits=5)
    (
        grid.repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lpath)
    )
    z_y = _per_file_spans(spark, zpath, "y")
    lin_y = _per_file_spans(spark, lpath, "y")
    assert sum(z_y) / len(z_y) <= 0.5 * sum(lin_y) / len(lin_y), (z_y, lin_y)
    # and the z layout did not give up x locality entirely
    z_x = _per_file_spans(spark, zpath, "x")
    assert sum(z_x) / len(z_x) < 32, z_x


def test_write_zordered_explicit_ranges_no_prescan(spark, tmp_path):
    """Explicit ranges skip the min/max pre-scan and round-trip all
    rows (the at-scale calling convention)."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    p = str(tmp_path / "zr")
    zorder.write_zordered(grid, p, {"x": (0, 8), "y": (0, 8)}, num_files=4, bits=3)
    back = spark.read.parquet(p)
    assert back.count() == 64
    assert {(r.x, r.y) for r in back.collect()} == {(x, y) for x in range(8) for y in range(8)}


def test_write_zordered_handles_date_and_timestamp_cols(spark, tmp_path):
    """The canonical log-warehouse layout — z-order on (day, status) —
    must work without hand-converting temporal columns."""
    import datetime

    rows = [
        (datetime.date(2019, 2, 1) + datetime.timedelta(days=d), s * 100 + 100)
        for d in range(16)
        for s in range(4)
    ]
    df = spark.createDataFrame(rows, "day date, status long")
    p = str(tmp_path / "zdt")
    zorder.write_zordered(df, p, ["day", "status"], num_files=4, bits=4)
    back = spark.read.parquet(p)
    assert back.count() == 64
    assert set(back.columns) == {"day", "status"}  # helper cols dropped
    # locality: per-file day spans tighter than the full 16-day domain
    spans = _per_file_spans(spark, p, "status")
    assert sum(s for s in spans) / len(spans) < 300


def test_write_zordered_constant_and_empty_columns(spark, tmp_path):
    """Auto-range must survive a constant column at any magnitude (the
    +1e-9 epsilon was below one ULP for epoch-micros domains) and an
    empty input (NULL min/max) — round-5 advisor finding."""
    import datetime

    ts = datetime.datetime(2019, 2, 1, 12, 0, 0)
    rows = [(ts, i) for i in range(32)]
    df = spark.createDataFrame(rows, "event_ts timestamp, status long")
    p = str(tmp_path / "zconst")
    zorder.write_zordered(df, p, ["event_ts", "status"], num_files=2, bits=4)
    assert spark.read.parquet(p).count() == 32

    empty = df.where("status < 0")
    p2 = str(tmp_path / "zempty")
    zorder.write_zordered(empty, p2, ["event_ts", "status"], num_files=1, bits=4)
    assert spark.read.parquet(p2).count() == 0
