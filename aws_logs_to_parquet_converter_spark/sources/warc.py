"""WARC (Web ARChive, ISO 28500) record source — the Common Crawl
ingestion format every web-scale training corpus starts from.

Spark-first design: ``spark.read.text`` with the record boundary
``\\r\\n\\r\\nWARC/1.0\\r\\n`` as the custom ``lineSep`` splits a WARC
member into one row per record NATIVELY — the scan stays splittable
and streamed, and everything after it (header parsing, payload
separation, filtering) is codegen ``regexp_extract``/``substring``
expressions.  No Python worker touches the bytes.

Honest caveats, stated up front:

  * ``.warc.gz`` WORKS through the same reader (tested): Hadoop's
    gzip codec decompresses transparently — including Common Crawl's
    concatenated per-record gzip members, which decode as one stream —
    and the version peek decodes the member head driver-side.  The
    cost is splittability: each ``.gz`` file is one task, i.e.
    file-level parallelism, which for CC's ~1 GB files is how every
    engine reads them anyway; decompress in the lake first if you need
    intra-file splits.
  * Splitting on the boundary string assumes payloads do not contain
    ``\\r\\n\\r\\nWARC/1.0\\r\\n`` verbatim.  Real HTML payloads
    essentially never do (the sequence requires a blank line followed
    by a WARC version line), but a length-based parser is the
    watertight form; ``Content-Length`` is carried through so readers
    can VERIFY the split (``payload_length_ok``) and quarantine any
    record whose payload length disagrees — the same
    dead-letter-not-silent-drop discipline as the log parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Record boundary: blank line then the next record's version line.  The
# FIRST record in a file has no preceding blank line, so its version
# line survives at the head of the first split and is stripped there.
# The version ("1.0" / "1.1") is auto-detected from the first file's
# leading bytes — a wrong separator would not error, it would collapse
# the whole file into one mis-typed record.
def _record_sep(version: str) -> str:
    return f"\r\n\r\nWARC/{version}\r\n"


def _detect_version(spark: SparkSession, path: str) -> str:
    """Peek the first ~256 bytes of one matching FILE driver-side (one
    buffered JVM read, directories descended one level — a glob or a
    directory path must not fall into the open-a-directory trap) and
    return its WARC version ('1.0' fallback).  Metadata-scale I/O via
    the same Hadoop FS the scan uses, so it works on any filesystem.

    I/O errors PROPAGATE (round-6 advisor finding: a silently-swallowed
    transient read failure on a WARC/1.1 archive would pick the wrong
    lineSep, collapse each file into one mis-typed record, and the
    default record_types filter would then drop everything — data loss
    with no flag).  Callers hitting a flaky filesystem can pin
    ``version=`` explicitly.  Content-based fallbacks (no matching
    file; head that is not a WARC version line) return '1.0' with a
    loud warning instead, because there the scan itself will surface
    the real problem."""
    import warnings

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(p)
    if not matches:
        warnings.warn(
            f"warc version peek: no files match {path!r}; assuming WARC/1.0"
        )
        return "1.0"
    def visible(status) -> bool:
        # match the scan's hiddenFileFilter: _SUCCESS markers and
        # .crc checksums must not be the file we peek
        name = status.getPath().getName()
        return not (name.startswith("_") or name.startswith("."))

    first = None
    for st in matches:
        if st.isFile() and visible(st):
            first = st.getPath()
            break
        if st.isDirectory():
            for inner in fs.listStatus(st.getPath()):
                if inner.isFile() and visible(inner):
                    first = inner.getPath()
                    break
        if first is not None:
            break
    if first is None:
        warnings.warn(
            f"warc version peek: no visible data file under {path!r}; "
            "assuming WARC/1.0"
        )
        return "1.0"
    stream = fs.open(first)
    try:
        # read UP TO 256 bytes in one buffered call.  Two traps
        # here: IOUtils.toByteArray(stream, n) demands exactly n
        # (EOFException on shorter files), and py4j passes primitive
        # arrays BY VALUE (a JVM-side read fills a copy the Python
        # side never sees) — so bound the stream and take the bytes
        # as a RETURN value.
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
            stream, 256
        )
        head = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(bounded))
    finally:
        stream.close()
    if head[:2] == b"\x1f\x8b":  # gzip member: peek the DECODED head
        import zlib

        head = zlib.decompressobj(wbits=31).decompress(head, 16)
    import re

    m = re.match(rb"WARC/(1\.[01])", head)
    if m is None:
        warnings.warn(
            f"warc version peek: {first} does not start with a WARC "
            "version line; assuming WARC/1.0 (pin version= to override)"
        )
        return "1.0"
    return m.group(1).decode()

_HEADER_FIELDS = {
    "warc_type": "WARC-Type",
    "warc_record_id": "WARC-Record-ID",
    "warc_date": "WARC-Date",
    "target_uri": "WARC-Target-URI",
    "content_type": "Content-Type",
    "content_length": "Content-Length",
}


def read_warc_records(
    spark: SparkSession,
    path: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    version: "str | None" = None,
) -> DataFrame:
    """One row per WARC record: the typed header fields above, the raw
    header block, the payload, and ``payload_length_ok`` (whether the
    payload's byte length matches ``Content-Length`` — False flags a
    mis-split, truncated, or malformed-declaration record for
    quarantine, mirroring the log parser's dead-letter contract; NULL
    only when the record genuinely declares no length).

    ``record_types`` pre-filters on WARC-Type (``("response",)`` keeps
    page captures and drops request/metadata records — ~2/3 of a crawl
    — right at the scan; pass None to keep everything).  The filter
    and all projections are codegen expressions over the one text
    scan.

    ``version`` pins the record-boundary version string; None (the
    default) auto-detects it from the first matching file, so WARC/1.1
    archives split correctly too.  Header field matching is
    case-insensitive per the spec."""
    if version is None:
        version = _detect_version(spark, path)
    raw = spark.read.option("lineSep", _record_sep(version)).text(path)
    # strip the file-leading version line the separator can't consume
    rec = raw.select(
        F.regexp_replace("value", r"\A(?s)WARC/1\.[01]\r\n", "").alias("_rec")
    ).where(F.length("_rec") > 0)
    # header block = up to the first blank line; payload = the rest.
    # Pure Column API (no F.expr): string escapes here must not depend
    # on the parser's escapedStringLiterals setting.
    blank = F.instr(F.col("_rec"), "\r\n\r\n")
    header = F.substring_index(F.col("_rec"), "\r\n\r\n", 1)
    cols = [header.alias("warc_headers")]
    for name, field in _HEADER_FIELDS.items():
        cols.append(
            F.nullif(
                # (?i): WARC/HTTP field names are case-insensitive
                F.regexp_extract(header, rf"(?im)^{field}:\s*(.*?)\r?$", 1), F.lit("")
            ).alias(name)
        )
    raw_pay = F.when(
        blank > 0, F.col("_rec").substr(blank + 4, F.length("_rec"))
    ).otherwise(F.lit(""))
    # The LAST record keeps its \r\n\r\n terminator (every other one is
    # consumed by the separator match) — but a payload may also END
    # with a legitimate \r\n\r\n (e.g. an HTTP request with no body),
    # so the strip is Content-Length-aware: keep the form whose byte
    # length matches the declaration; without a declaration strip the
    # trailing terminator best-effort.
    stripped = F.regexp_replace(raw_pay, r"(?s)\r\n\r\n\Z", "")
    # try_cast: a malformed Content-Length (crawler-supplied data) must
    # never kill the job under ANSI mode; a DECLARED-but-malformed
    # length flags False (quarantine), only a genuinely absent header
    # yields the NULL "no declaration" state — keeping the dead-letter
    # filter `payload_length_ok == False` able to catch corruption
    decl = F.col("content_length").try_cast("long")
    malformed_decl = F.col("content_length").isNotNull() & decl.isNull()
    cols.append(raw_pay.alias("_rp"))
    cols.append(stripped.alias("_sp"))
    out = (
        rec.select(*cols)
        .withColumn(
            "payload",
            F.when(decl.isNotNull() & (F.octet_length("_rp") == decl), F.col("_rp"))
            .when(decl.isNotNull() & (F.octet_length("_sp") == decl), F.col("_sp"))
            .when(decl.isNull(), F.col("_sp"))
            .otherwise(F.col("_rp")),
        )
        .drop("_rp", "_sp")
        .withColumn(
            "payload_length_ok",
            F.when(malformed_decl, F.lit(False)).when(
                decl.isNotNull(), F.octet_length("payload") == decl
            ),
        )
    )
    if record_types is not None:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def warc_to_documents(
    records: DataFrame, id_col: str = "doc_id", strip_http: bool = True
) -> DataFrame:
    """Project WARC response records onto the documents-table shape
    (doc_id, text, lang, source, n_chars) so every downstream corpus
    operator (dedup, quality, perplexity, sampling) applies unchanged.

    ``strip_http`` drops the HTTP response envelope (status line +
    headers) that ``application/http`` payloads carry before the body.
    doc_id is the xxhash64 of the record id — deterministic, collision
    odds the same 2^-64 class the digest operators already accept;
    lang is left NULL for the language-ID operator to fill."""
    body = F.col("payload")
    if strip_http:
        blank = F.instr(F.col("payload"), "\r\n\r\n")
        body = F.when(
            F.col("content_type").startswith("application/http") & (blank > 0),
            F.col("payload").substr(blank + 4, F.length("payload")),
        ).otherwise(F.col("payload"))
    return records.select(
        F.xxhash64("warc_record_id").alias(id_col),
        body.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("target_uri").alias("source"),
        F.length(body).cast("long").alias("n_chars"),
    )


def write_warc(rows: "list[tuple[dict, str]]", path: str, version: str = "1.0") -> None:
    """Test-fixture helper: serialize (headers, payload) pairs as a
    spec-shaped uncompressed WARC file (version line, CRLF headers,
    blank line, payload, double-CRLF record terminator).  Driver-side
    and tiny by design — real WARC comes FROM the crawler; the engine
    only reads it."""
    with open(path, "wb") as fh:
        for headers, payload in rows:
            pb = payload.encode("utf-8")
            fh.write(f"WARC/{version}\r\n".encode())
            hdrs = dict(headers)
            hdrs.setdefault("Content-Length", str(len(pb)))
            for k, v in hdrs.items():
                fh.write(f"{k}: {v}\r\n".encode())
            fh.write(b"\r\n")
            fh.write(pb)
            fh.write(b"\r\n\r\n")
