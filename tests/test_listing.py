"""S3 prefix listing (sources/listing.py): the paginated loop now has
executed coverage via an injected fake client — the reference shape it
mirrors (paginated list_objects_v2, bounded driver memory) had never
actually run in this container (boto3 absent)."""

import pytest

from aws_logs_to_parquet_converter_spark.sources import listing


class FakeS3Client:
    """Three pages: 2 + 2 + 1 keys, continuation-token driven, plus a
    call log so the test can assert the token protocol."""

    def __init__(self, pages):
        self.pages = pages
        self.calls = []

    def list_objects_v2(self, **kwargs):
        self.calls.append(kwargs)
        idx = int(kwargs.get("ContinuationToken", "page0")[4:])
        page = dict(self.pages[idx])
        if idx + 1 < len(self.pages):
            page["NextContinuationToken"] = f"page{idx + 1}"
        return page


def test_pagination_walks_all_pages_in_order():
    pages = [
        {"Contents": [{"Key": "logs/2019-02-06-00-a"}, {"Key": "logs/2019-02-06-01-b"}]},
        {"Contents": [{"Key": "logs/2019-02-06-02-c"}, {"Key": "logs/2019-02-06-03-d"}]},
        {"Contents": [{"Key": "logs/2019-02-06-04-e"}]},
    ]
    client = FakeS3Client(pages)
    uris = listing._list_s3("s3://my-bucket", "logs/2019-02-06-", client=client)
    assert uris == [
        "s3a://my-bucket/logs/2019-02-06-00-a",
        "s3a://my-bucket/logs/2019-02-06-01-b",
        "s3a://my-bucket/logs/2019-02-06-02-c",
        "s3a://my-bucket/logs/2019-02-06-03-d",
        "s3a://my-bucket/logs/2019-02-06-04-e",
    ]
    # token protocol: first call token-free, then one token per page
    assert "ContinuationToken" not in client.calls[0]
    assert [c.get("ContinuationToken") for c in client.calls[1:]] == ["page1", "page2"]
    assert all(c["Prefix"] == "logs/2019-02-06-" for c in client.calls)


def test_empty_prefix_and_empty_middle_page():
    assert listing._list_s3("s3://b", "none/", client=FakeS3Client([{}])) == []
    pages = [{"Contents": [{"Key": "k1"}]}, {}, {"Contents": [{"Key": "k2"}]}]
    uris = listing._list_s3("s3://b", "p/", client=FakeS3Client(pages))
    assert uris == ["s3a://b/k1", "s3a://b/k2"]


def test_local_glob_path(tmp_path):
    d = tmp_path / "bucket"
    d.mkdir()
    (d / "2019-02-06-00-00-00-aaa").write_text("x")
    (d / "2019-02-06-01-00-00-bbb").write_text("y")
    (d / "2019-02-07-00-00-00-ccc").write_text("z")  # other day: excluded
    got = listing.list_day_paths(str(tmp_path), "bucket", "2019-02-06")
    assert [p.rsplit("/", 1)[1] for p in got] == [
        "2019-02-06-00-00-00-aaa", "2019-02-06-01-00-00-bbb"]


def test_missing_boto3_raises_not_implemented(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_boto3(name, *a, **k):
        if name == "boto3":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_boto3)
    with pytest.raises(NotImplementedError):
        listing._list_s3("s3://b", "p/")


def test_s3_root_with_key_prefix_splits_bucket(tmp_path):
    """s3://bucket/nested/prefix roots: Bucket is the bucket alone and
    the nested path joins the listing prefix (the old parse handed
    boto3 'bucket/nested/prefix' as the Bucket name and dropped the
    path from the prefix)."""
    from aws_logs_to_parquet_converter_spark.sources.listing import _list_s3

    calls = []

    class Fake:
        def list_objects_v2(self, **kw):
            calls.append(kw)
            return {"Contents": [{"Key": f"{kw['Prefix']}x.log"}]}

    keys = _list_s3("s3://logs/raw/region1", "server-logs/2024-01-01-", client=Fake())
    assert calls[0]["Bucket"] == "logs"
    assert calls[0]["Prefix"] == "raw/region1/server-logs/2024-01-01-"
    # keys come back as full URIs on the BUCKET (key already carries
    # the nested prefix)
    assert keys == ["s3a://logs/raw/region1/server-logs/2024-01-01-x.log"]

    # bucket-only root unchanged
    calls.clear()
    _list_s3("s3a://logs", "server-logs/2024-01-01-", client=Fake())
    assert calls[0]["Bucket"] == "logs"
    assert calls[0]["Prefix"] == "server-logs/2024-01-01-"


# ---------------------------------------------------------------------------
# REAL boto3 against a local ListObjectsV2 stub (r11 verdict item 7):
# exercises boto3's request serialization, the XML response parse, and
# the continuation-token protocol end-to-end — no fake client.
# ---------------------------------------------------------------------------

_S3_PAGE_TMPL = """<?xml version="1.0" encoding="UTF-8"?>
<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
  <Name>{bucket}</Name><Prefix>{prefix}</Prefix>
  <KeyCount>{n}</KeyCount><MaxKeys>2</MaxKeys>
  <IsTruncated>{truncated}</IsTruncated>
  {contents}
  {token}
</ListBucketResult>"""


def _start_s3_stub(keys_by_page):
    """Minimal ListObjectsV2 HTTP endpoint: path-style addressing,
    2 keys/page, continuation tokens 'p1', 'p2', ...  Returns
    (server, port)."""
    import http.server
    import threading
    import urllib.parse

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(parsed.query)
            assert q.get("list-type") == ["2"], "must be ListObjectsV2"
            page = int(q.get("continuation-token", ["p0"])[0][1:])
            keys = keys_by_page[page]
            last = page + 1 >= len(keys_by_page)
            contents = "".join(
                f"<Contents><Key>{k}</Key>"
                "<LastModified>2019-02-06T00:00:00.000Z</LastModified>"
                '<ETag>"0"</ETag><Size>1</Size>'
                "<StorageClass>STANDARD</StorageClass></Contents>"
                for k in keys
            )
            token = (
                "" if last
                else f"<NextContinuationToken>p{page + 1}</NextContinuationToken>"
            )
            body = _S3_PAGE_TMPL.format(
                bucket=parsed.path.strip("/").split("/")[0],
                prefix=q.get("prefix", [""])[0],
                n=len(keys),
                truncated=str(not last).lower(),
                contents=contents,
                token=token,
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_real_boto3_pagination_against_local_stub(monkeypatch):
    boto3 = pytest.importorskip("boto3")
    from botocore.config import Config

    pages = [
        ["logs/2019-02-06-00-a", "logs/2019-02-06-01-b"],
        ["logs/2019-02-06-02-c", "logs/2019-02-06-03-d"],
        ["logs/2019-02-06-04-e"],
    ]
    srv, port = _start_s3_stub(pages)
    try:
        client = boto3.client(
            "s3",
            endpoint_url=f"http://127.0.0.1:{port}",
            region_name="us-east-1",
            aws_access_key_id="stub",
            aws_secret_access_key="stub",
            config=Config(s3={"addressing_style": "path"}),
        )
        uris = listing._list_s3(
            "s3://my-bucket", "logs/2019-02-06-", client=client
        )
        assert uris == [f"s3a://my-bucket/{k}" for p in pages for k in p]
    finally:
        srv.shutdown()


def test_real_boto3_default_client_via_endpoint_env(monkeypatch):
    """client=None — the production branch builds its own boto3 client
    (honoring AWS_ENDPOINT_URL_S3), so the previously never-executed
    gated-import path runs for real."""
    pytest.importorskip("boto3")
    srv, port = _start_s3_stub([["d/2019-02-06-00-x"]])
    try:
        monkeypatch.setenv("AWS_ENDPOINT_URL_S3", f"http://127.0.0.1:{port}")
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "stub")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "stub")
        monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
        monkeypatch.setenv("AWS_S3_ADDRESSING_STYLE", "path")
        uris = listing.list_day_paths("s3://b", "d", "2019-02-06")
        assert uris == ["s3a://b/d/2019-02-06-00-x"]
    finally:
        srv.shutdown()
