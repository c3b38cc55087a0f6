"""Canonical S3 server-access-log schema + line grammar.

Single source of truth for the 19-field record the whole engine speaks.
Mirrors the reference's ``S3_ACCESS_LOG_OUTPUT_SCHEMA``
(oss_s3_server_side_logging_compacter.py:103-125) and its line regex
(compacter.py:21-25), with two deliberate divergences documented in
SURVEY.md §1.3:

  * ``version_id`` captures ``\\S+`` (full token).  The reference's
    ``(?P<version>\\S)`` keeps only the first character — a bug.
  * Unparseable bracketed timestamps yield NULL ``request_time`` instead
    of crashing the task (reference raises AttributeError via
    ``None.isoformat()``, compacter.py:73-74).

The regex is written with *unnamed* groups because it executes inside
the JVM (java.util.regex has a different named-group syntax than
Python's ``(?P<...>``); group order is the field order.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One capture group per field, order == FIELD ORDER below.  Semantics
# match the reference pattern (compacter.py:21-25): quoted-or-dash for
# request/referrer/user_agent, bracketed time, \S+ tokens elsewhere.
# Like the reference, this is applied with *search* (unanchored)
# semantics so trailing fields AWS added post-2019 (host id, TLS
# version, ...) are tolerated.
S3_ACCESS_LOG_PATTERN = (
    r'(\S+) (\S+) (\[[^\]]*\]) (\S+) '
    r'(\S+) (\S+) (\S+) (\S+) '
    r'("[^"]*"|-) (\S+) (\S+) (\S+) '
    r'(\S+) (\S+) (\S+) ("[^"]*"|-) '
    r'("[^"]*"|-) (\S+)'
)

# Raw capture-group names, pre-coercion (all strings).
RAW_FIELDS = [
    "bucket_owner",
    "s3_bucket",
    "request_time_raw",  # "[06/Feb/2019:00:00:38 +0000]"
    "remote_ip",
    "requester",
    "request_id",
    "operation",
    "key",
    "request",
    "http_status",
    "error_code",
    "bytes_sent",
    "object_size",
    "total_time",
    "turn_around_time",
    "referrer",
    "user_agent",
    "version_id",
]

N_FIELDS = len(RAW_FIELDS)  # 18 captured; +error_line = 19 at rest

# Post-coercion, at-rest schema.  ``request_time`` replaces the raw
# string at position 3, matching the reference's final select
# (compacter.py:223-243) and the Athena DDL (create_table.sql:13-34).
S3_ACCESS_LOG_SCHEMA = StructType(
    [
        StructField("bucket_owner", StringType(), True),
        StructField("s3_bucket", StringType(), True),
        StructField("request_time", TimestampType(), True),
        StructField("remote_ip", StringType(), True),
        StructField("requester", StringType(), True),
        StructField("request_id", StringType(), True),
        StructField("operation", StringType(), True),
        StructField("key", StringType(), True),
        StructField("request", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("error_code", StringType(), True),
        StructField("bytes_sent", LongType(), True),
        StructField("object_size", LongType(), True),
        StructField("total_time", LongType(), True),
        StructField("turn_around_time", LongType(), True),
        StructField("referrer", StringType(), True),
        StructField("user_agent", StringType(), True),
        StructField("version_id", StringType(), True),
        StructField("error_line", StringType(), True),
    ]
)

# Fields where a bare '-' means NULL (compacter.py:79-98).  Note the
# asymmetry preserved from the reference: `request` keeps a literal
# '"-"' while `referrer`/`user_agent` null it out (SURVEY §1.3.6).
DASH_NULL_FIELDS = {
    "key",
    "http_status",
    "error_code",
    "bytes_sent",
    "object_size",
    "total_time",
    "turn_around_time",
    "version_id",
}
QUOTED_DASH_NULL_FIELDS = {"referrer", "user_agent"}

INT_FIELDS = {"http_status"}
LONG_FIELDS = {"bytes_sent", "object_size", "total_time", "turn_around_time"}
