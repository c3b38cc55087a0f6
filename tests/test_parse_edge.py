"""Parser edge cases: unicode, huge lines, empty input, all-garbage."""

from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.sources.parse import parse_lines
from aws_logs_to_parquet_converter_spark.testing import GOLDEN_LINE


def _parse(spark, lines):
    return parse_lines(spark.createDataFrame([(l,) for l in lines], "value string"))


def test_unicode_fields(spark):
    line = GOLDEN_LINE.replace(
        '"GET /awsexamplebucket?versioning HTTP/1.1"', '"GET /bücket/ключ/文件.txt HTTP/1.1"'
    ).replace("awsexamplebucket ", "bücket-ünïcode ")
    row = _parse(spark, [line]).collect()[0]
    assert row.error_line is None
    assert row.s3_bucket == "bücket-ünïcode"
    assert "文件" in row.request


def test_very_long_line(spark):
    # a 100KB key must parse, not crash or truncate silently
    long_key = "logs/svc/" + "x" * 100_000 + ".tgz"
    line = GOLDEN_LINE.replace("REST.GET.VERSIONING - ", f"REST.GET.OBJECT {long_key} ")
    row = _parse(spark, [line]).collect()[0]
    assert row.error_line is None
    assert row.key == long_key


def test_empty_input(spark):
    df = parse_lines(spark.createDataFrame([], "value string"))
    assert df.count() == 0
    assert len(df.columns) == 19


def test_all_garbage_preserved(spark):
    lines = [f"garbage line {i}" for i in range(50)]
    out = _parse(spark, lines)
    assert out.count() == 50
    assert out.where(F.col("error_line").isNotNull()).count() == 50
    got = {r.error_line for r in out.collect()}
    assert got == set(lines)  # nothing dropped, nothing mangled


def test_timestamp_offset_parses_under_non_utc_session(spark):
    """The bracketed offset REALLY parses: under a non-UTC session the
    stored instant is unchanged (the old form dropped '+0000' and read
    wall time in the session zone, silently shifting every timestamp
    by the zone offset — round-7 review finding)."""
    from aws_logs_to_parquet_converter_spark.sources.parse import parse_lines
    from aws_logs_to_parquet_converter_spark.testing import GOLDEN_LINE

    df = spark.createDataFrame([(GOLDEN_LINE,)], "value string")
    utc_val = parse_lines(df).select(F.unix_micros("request_time")).first()[0]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = parse_lines(df).select(F.unix_micros("request_time")).first()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert shifted == utc_val  # same instant regardless of session zone
