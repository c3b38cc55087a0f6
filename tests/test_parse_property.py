"""Property-based round-trip test (SURVEY §5.1): generate random field
values, format them per the AWS LogFormat contract, parse with the
engine, and compare field-by-field."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_logs_to_parquet_converter_spark.sources.parse import parse_lines

_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters='"\\'),
    min_size=1,
    max_size=24,
)
_quoted_inner = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters='"\\'),
    min_size=0,
    max_size=40,
)
_maybe_int = st.one_of(st.none(), st.integers(min_value=0, max_value=10**12))
_months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


@st.composite
def log_records(draw):
    ts = draw(
        st.datetimes(
            min_value=datetime.datetime(2015, 1, 1), max_value=datetime.datetime(2030, 12, 28)
        )
    )
    rec = {
        "owner": draw(_token),
        "bucket": draw(_token),
        "ts": ts.replace(microsecond=0),
        "ip": draw(_token),
        "requester": draw(_token),
        "reqid": draw(_token),
        "operation": draw(_token),
        # dash-nullable fields must not generate the literal '-' (it IS
        # the absent marker and correctly parses to NULL)
        "key": draw(st.one_of(st.none(), _token.filter(lambda s: s != "-"))),
        "request": draw(st.one_of(st.none(), _quoted_inner)),
        "status": draw(st.one_of(st.none(), st.integers(100, 599))),
        "error": draw(st.one_of(st.none(), _token.filter(lambda s: s != "-"))),
        "bytes": draw(_maybe_int),
        "size": draw(_maybe_int),
        "total": draw(_maybe_int),
        "turn": draw(_maybe_int),
        # inner text '-' would format to '"-"', the quoted absent marker
        "referrer": draw(st.one_of(st.none(), _quoted_inner.filter(lambda s: s != "-"))),
        "agent": draw(st.one_of(st.none(), _quoted_inner.filter(lambda s: s != "-"))),
        "version": draw(st.one_of(st.none(), _token.filter(lambda s: s != "-"))),
    }
    return rec


def _format(rec) -> str:
    """Format per docs.aws.amazon.com LogFormat: '-' for absent fields,
    quoted request/referrer/agent ('\"-\"' when absent)."""
    ts = rec["ts"]
    t = f"[{ts.day:02d}/{_months[ts.month - 1]}/{ts.year}:{ts.hour:02d}:{ts.minute:02d}:{ts.second:02d} +0000]"

    def tok(v):
        return "-" if v is None else str(v)

    def quoted(v):
        return '"-"' if v is None else f'"{v}"'

    return (
        f"{rec['owner']} {rec['bucket']} {t} {rec['ip']} {rec['requester']} "
        f"{rec['reqid']} {rec['operation']} {tok(rec['key'])} {quoted(rec['request'])} "
        f"{tok(rec['status'])} {tok(rec['error'])} {tok(rec['bytes'])} {tok(rec['size'])} "
        f"{tok(rec['total'])} {tok(rec['turn'])} {quoted(rec['referrer'])} "
        f"{quoted(rec['agent'])} {tok(rec['version'])}"
    )


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(log_records(), min_size=1, max_size=8))
def test_roundtrip(spark, records):
    lines = [_format(r) for r in records]
    rows = parse_lines(spark.createDataFrame([(l,) for l in lines], "value string")).collect()
    assert len(rows) == len(records)
    for rec, row in zip(records, rows):
        assert row.error_line is None, f"line dead-lettered: {_format(rec)}"
        assert row.bucket_owner == rec["owner"]
        assert row.s3_bucket == rec["bucket"]
        assert row.request_time == rec["ts"]
        assert row.remote_ip == rec["ip"]
        assert row.requester == rec["requester"]
        assert row.request_id == rec["reqid"]
        assert row.operation == rec["operation"]
        assert row.key == (rec["key"] if rec["key"] is not None else None)
        # request keeps literal '"-"' when absent (SURVEY §1.3.6)
        expect_req = '"-"' if rec["request"] is None else f'"{rec["request"]}"'
        assert row.request == expect_req
        assert row.http_status == rec["status"]
        assert row.error_code == rec["error"]
        assert row.bytes_sent == rec["bytes"]
        assert row.object_size == rec["size"]
        assert row.total_time == rec["total"]
        assert row.turn_around_time == rec["turn"]
        assert row.referrer == (None if rec["referrer"] is None else f'"{rec["referrer"]}"')
        assert row.user_agent == (None if rec["agent"] is None else f'"{rec["agent"]}"')
        assert row.version_id == rec["version"]
