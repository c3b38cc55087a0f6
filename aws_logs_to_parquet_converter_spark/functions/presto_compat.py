"""Presto/Athena dialect shims (SURVEY §2.9).

The reference's query half is Presto SQL run by Athena
(example_queries/days_apart_analysis.sql).  Almost every function is
name-identical in Spark SQL; the exceptions — F1 2-arg
``regexp_replace``, F5 ``date_parse`` (MySQL format strings), F7
``date_diff(unit, a, b)`` — are shimmed here so the reference's
analysis SQL runs verbatim on this engine:

  * ``register_presto_compat(spark)`` creates SQL UDFs where no builtin
    name collides (pure Catalyst expressions — a SQL-macro layer, zero
    Python in the data path); colliding names (``date_diff``) are
    head-rewritten by the translator instead.
  * ``translate_presto_sql(sql)`` rewrites the dialect residue that
    functions can't cover: double-quoted identifiers -> backticks and
    2-arg ``regexp_replace(col, 'pat')`` -> 3-arg with empty
    replacement.
  * ``run_presto_sql`` additionally executes under
    ``escapedStringLiterals=true`` so Presto regex literals like
    ``'/(\\d+)'`` keep their backslashes exactly as written.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Presto/MySQL date_parse tokens -> JDK DateTimeFormatter patterns
# (public MySQL DATE_FORMAT spec, which Presto's date_parse/date_format
# follow).  Replacement outputs never contain '%', so ordering is free.
_FORMAT_REPLACEMENTS = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%M", "MMMM"),  # full month name
    ("%m", "MM"),
    ("%c", "M"),  # month, no leading zero
    ("%e", "d"),  # day of month, no leading zero
    ("%d", "dd"),
    ("%j", "DDD"),  # day of year
    ("%W", "EEEE"),  # full weekday name
    ("%a", "EEE"),  # abbreviated weekday name
    ("%T", "HH:mm:ss"),  # 24-hour time shorthand
    ("%H", "HH"),
    ("%k", "H"),  # hour, no leading zero
    ("%h", "hh"),  # 12-hour, padded
    ("%I", "hh"),
    ("%l", "h"),  # 12-hour, no leading zero
    ("%p", "a"),  # AM/PM
    ("%i", "mm"),
    ("%s", "ss"),
    ("%f", "SSSSSS"),
    ("%b", "MMM"),
]


# Bump when the shim set below changes: the registration guard keys on
# it, so an upgraded library re-registers into an existing session.
_SHIM_VERSION = "8"
_SHIM_MARKER = "spark.spark_graft.prestoCompatVersion"


def register_presto_compat(spark: SparkSession) -> None:
    """Register Presto-named SQL UDFs: ``date_parse``, ``date_diff``.

    SQL UDFs inline into the Catalyst plan (no Python boundary), so the
    compat layer costs nothing at execution time.  Registration itself
    is NOT free — eight CREATE FUNCTION statements cost ~2.3s on a cold
    session / ~0.2s warm (measured, r02 bench regression on the
    flagship) — so it runs once per session, guarded by a conf marker,
    and callers may invoke it unconditionally.
    """
    if spark.conf.get(_SHIM_MARKER, None) == _SHIM_VERSION:
        return
    # Register under the PARSER MODE the bodies were written for: with
    # escapedStringLiterals already true (the natural setting for a
    # Presto workload), the json_extract body's backslash literals
    # would parse differently and the stored shim would mis-escape
    # JSON forever after (round-7 review finding).
    prev_esc = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
    try:
        _register_shims(spark)
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", prev_esc)
    spark.conf.set(_SHIM_MARKER, _SHIM_VERSION)


def _register_shims(spark: SparkSession) -> None:
    fmt_expr = "fmt"
    for presto_tok, jdk_tok in _FORMAT_REPLACEMENTS:
        fmt_expr = f"replace({fmt_expr}, '{presto_tok}', '{jdk_tok}')"
    # AFTER %-token replacement (token outputs never contain T or Z),
    # single-quote the common literal letters of ISO-ish formats: a
    # bare pattern letter like the 'T' in '%Y-%m-%dT%H:%i:%s' is a
    # JDK parse error ('Unknown pattern letter'), while MySQL treats
    # it as a literal (round-7 review finding).
    for lit in ("T", "Z"):
        # SQL literal for the three characters <'T'>: quotes escape by
        # doubling, so it is written '''T'''
        quoted = "'''" + lit + "'''"
        fmt_expr = f"replace({fmt_expr}, '{lit}', {quoted})"
    # The whole MySQL->JDK translation fires ONLY for formats that
    # actually carry '%' tokens: a JDK-dialect pattern reaching the
    # shim (the blanket date_format( -> date_format_presto( rewrite
    # catches both dialects) must pass through VERBATIM — the T/Z
    # quoting above would corrupt it (a quoted literal 'T' becomes
    # ''T'', an escaped quote plus a bare pattern letter; the JDK
    # zone-offset letter Z would silently emit as the literal letter)
    # (round-7 advisor finding).  KNOWN EDGE (accepted tradeoff,
    # round-8 advisor): a %-free MySQL format that still contains bare
    # pattern letters (e.g. a literal 'T' or 'Z' and nothing else) is
    # all-literal in MySQL but reaches the JDK formatter verbatim here
    # and throws/misformats — the pre-gate always-quote path handled
    # it, at the cost of corrupting every real JDK-dialect pattern.
    # %-free formats in the reference's query corpus are plain literal
    # strings; test_presto_compat pins this edge so it is not
    # re-reported as a new bug.
    fmt_expr = f"CASE WHEN contains(fmt, '%') THEN {fmt_expr} ELSE fmt END"
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION date_parse(s STRING, fmt STRING)
        RETURNS TIMESTAMP
        RETURN try_to_timestamp(s, {fmt_expr})
        """
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION date_format_presto(ts TIMESTAMP, fmt STRING)
        RETURNS STRING
        RETURN date_format(ts, {fmt_expr})
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION strpos(haystack STRING, needle STRING)
        RETURNS INT
        RETURN instr(haystack, needle)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(ts TIMESTAMP)
        RETURNS DOUBLE
        RETURN cast(unix_micros(ts) as double) / 1e6
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION from_iso8601_timestamp(s STRING)
        RETURNS TIMESTAMP
        RETURN try_cast(s AS TIMESTAMP)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION from_iso8601_date(s STRING)
        RETURNS DATE
        RETURN try_cast(s AS DATE)
        """
    )
    # Presto URL functions (the access-log domain's own function family:
    # referrer/request-URI analysis).  Spark's parse_url is the same
    # extraction engine under a different calling convention; the
    # NULL-vs-empty edge cases are covered in test_presto_compat.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_host(url STRING)
        RETURNS STRING
        RETURN parse_url(url, 'HOST')
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_path(url STRING)
        RETURNS STRING
        RETURN parse_url(url, 'PATH')
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_query(url STRING)
        RETURNS STRING
        RETURN parse_url(url, 'QUERY')
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_protocol(url STRING)
        RETURNS STRING
        RETURN parse_url(url, 'PROTOCOL')
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_parameter(url STRING, name STRING)
        RETURNS STRING
        RETURN parse_url(url, 'QUERY', name)
        """
    )
    # Presto JSON extraction -> Spark's get_json_object (same JSONPath
    # dialect for the $.field forms Athena queries actually use).
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION json_extract_scalar(j STRING, p STRING)
        RETURNS STRING
        RETURN get_json_object(j, p)
        """
    )
    # Presto's json_extract returns JSON-ENCODED text (string scalars
    # keep their quotes: json_extract('{"s":"hi"}','$.s') = '"hi"'),
    # while get_json_object unquotes scalars.  Re-encode: objects/
    # arrays/numbers/booleans/null pass through (get_json_object already
    # returns their JSON text); anything else is a string scalar and
    # gets JSON-quoted.  Documented residual divergence: a JSON *string*
    # whose content itself parses as a number/boolean/object (e.g.
    # {"s":"123"}) is indistinguishable after get_json_object and passes
    # through unquoted.
    spark.sql(
        r"""
        CREATE OR REPLACE TEMPORARY FUNCTION json_extract(j STRING, p STRING)
        RETURNS STRING
        RETURN CASE
          WHEN get_json_object(j, p) IS NULL THEN NULL
          WHEN get_json_object(j, p)
               RLIKE '^(\\{.*\\}|\\[.*\\]|true|false|null|-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$'
            THEN get_json_object(j, p)
          ELSE concat('"',
                      replace(replace(get_json_object(j, p), '\\', '\\\\'), '"', '\\"'),
                      '"')
        END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION from_unixtime_presto(x DOUBLE)
        RETURNS TIMESTAMP
        RETURN timestamp_seconds(x)
        """
    )
    # split_part needs no shim: Spark's builtin is name- and
    # semantics-compatible (1-based index) with one documented
    # divergence — an out-of-range index yields '' in Spark vs NULL in
    # Presto (covered in test_presto_compat).  cardinality, regexp_like,
    # element_at, array_max/min, map_keys/values are name-identical
    # builtins; Presto's array `contains` collides with Spark's string
    # builtin and cannot be shadowed — migrating queries use
    # array_contains (documented divergence).
# First arg: identifier, ONE-level call (parens, no nesting), or a
# Presto string literal (quotes escape by DOUBLING, matching the
# _STRING_LITERAL model below — the old \\-escape model skipped
# 'it''s'-style literals); second arg: a literal.  Deeper nesting in
# the first argument is not rewritten — wrap it in a projection
# first (documented limit).
_TWO_ARG_REGEXP_REPLACE = re.compile(
    r"regexp_replace\(\s*"
    r"([A-Za-z_][\w.]*(?:\((?:[^()']|'(?:[^']|'')*')*\))?|'(?:[^']|'')*')"
    r"\s*,\s*('(?:[^']|'')*')\s*\)"
)
_QUOTED_IDENT = re.compile(r'"([^"]+)"')
# date_diff('day', ...  ->  timestampdiff(DAY, ...   (head-only rewrite:
# nested args untouched; Spark's own 2-arg date_diff is a builtin that a
# temp SQL UDF cannot shadow, so the 3-arg Presto form maps to
# timestampdiff, whose complete-unit semantics match Presto's.)
_DATE_DIFF_HEAD = re.compile(r"date_diff\(\s*'(\w+)'\s*,")
# date_add('day', n, ts) -> timestampadd(DAY, n, ts): same collision
# (Spark's 2-arg date_add builtin) and the same head-only fix.
_DATE_ADD_HEAD = re.compile(r"date_add\(\s*'(\w+)'\s*,")


_NAME_REWRITES = [
    # Presto aggregate names -> Spark equivalents (aggregates cannot be
    # shimmed as SQL UDFs, so they rewrite textually)
    (re.compile(r"\barbitrary\(", re.IGNORECASE), "any_value("),
    (re.compile(r"\bapprox_distinct\(", re.IGNORECASE), "approx_count_distinct("),
    # Presto's unparameterized VARCHAR in CASTs: Spark requires a length
    # for VARCHAR(n), but Presto's bare VARCHAR is just its string type
    (re.compile(r"\bAS\s+VARCHAR\s*\)", re.IGNORECASE), "AS STRING)"),
    # name-identical builtins with DIFFERENT semantics: Spark's
    # date_format takes JDK patterns (Presto's takes MySQL '%' tokens;
    # the shim translates ONLY formats containing '%' tokens and
    # passes everything else through verbatim — r7 advisor: the T/Z
    # literal-quoting corrupted quoted-'T' / zone-letter-Z JDK
    # patterns, so the claim is now enforced by a gate, not assumed)
    # and Spark's
    # from_unixtime returns a STRING (Presto's a timestamp) —
    # route both to the shims (round-7 review finding)
    (re.compile(r"\bdate_format\(", re.IGNORECASE), "date_format_presto("),
    (re.compile(r"\bfrom_unixtime\(", re.IGNORECASE), "from_unixtime_presto("),
]


# A Presto single-quoted string literal ('' escapes an embedded quote).
# Rewrites must never reach INSIDE these: a double-quoted-identifier
# rewrite applied to '{"k": 7}' would turn the JSON into '{`k`: 7}'
# (found via the json_extract shims' own test).
_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _outside_literals(sql: str, fn) -> str:
    out, last = [], 0
    for m in _STRING_LITERAL.finditer(sql):
        out.append(fn(sql[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(fn(sql[last:]))
    return "".join(out)


def _sub_outside_literals(pattern: "re.Pattern[str]", repl, sql: str) -> str:
    """``pattern.sub`` that skips matches STARTING inside a string
    literal.  The head rewrites deliberately CONSUME literal arguments
    (the 2-arg regexp_replace's pattern, the date unit) so they cannot
    run segment-wise — but a match that *begins* inside a literal is
    quoted text (e.g. a message containing "date_diff(") and must
    survive verbatim (round-4 advisor finding)."""
    spans = [(m.start(), m.end()) for m in _STRING_LITERAL.finditer(sql)]

    def guarded(m: "re.Match[str]") -> str:
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)
        return m.expand(repl) if isinstance(repl, str) else repl(m)

    return pattern.sub(guarded, sql)


def translate_presto_sql(sql: str) -> str:
    """Rewrite Presto dialect residue to Spark SQL (see module doc)."""
    sql = _sub_outside_literals(_TWO_ARG_REGEXP_REPLACE, r"regexp_replace(\1, \2, '')", sql)
    sql = _sub_outside_literals(
        _DATE_DIFF_HEAD, lambda m: f"timestampdiff({m.group(1).upper()}, ", sql
    )
    sql = _sub_outside_literals(
        _DATE_ADD_HEAD, lambda m: f"timestampadd({m.group(1).upper()}, ", sql
    )

    def rest(segment: str) -> str:
        for pat, repl in _NAME_REWRITES:
            segment = pat.sub(repl, segment)
        return _QUOTED_IDENT.sub(r"`\1`", segment)

    return _outside_literals(sql, rest)


def run_presto_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute a Presto-dialect query verbatim on this engine."""
    register_presto_compat(spark)
    prev = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        return spark.sql(translate_presto_sql(sql))
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", prev)
