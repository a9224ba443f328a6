"""Index sink + content cache tests (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from incubator_stormcrawler_spark.operators.indexing import ContentCache, IndexTable


def docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, title=t, text=x) for (u, t, x) in rows]
    )


def test_index_upsert_and_delete(spark, tmp_path):
    idx = IndexTable(str(tmp_path / "index"))
    idx.upsert(docs_df(spark, [
        ("https://a.com/1", "One", "body one"),
        ("https://a.com/2", "Two", "body two"),
    ]))
    assert idx.read(spark).count() == 2

    # upsert newer version of doc 1 + a new doc
    idx.upsert(docs_df(spark, [
        ("https://a.com/1", "One v2", "body one v2"),
        ("https://a.com/3", "Three", "body three"),
    ]))
    got = {r.url: r.title for r in idx.read(spark).collect()}
    assert got == {
        "https://a.com/1": "One v2",
        "https://a.com/2": "Two",
        "https://a.com/3": "Three",
    }

    # deletion stream drops ERROR'd docs
    idx.delete(spark.createDataFrame([("https://a.com/2",)], ["url"]))
    assert set(r.url for r in idx.read(spark).collect()) == {
        "https://a.com/1", "https://a.com/3",
    }


def test_content_cache_split(spark, tmp_path):
    cache = ContentCache(str(tmp_path / "cache"))
    pages = spark.createDataFrame(
        [Row(url="https://a.com/1", content=bytearray(b"ONE")),
         Row(url="https://a.com/2", content=bytearray(b"TWO"))]
    )
    cache.store(pages)

    batch = spark.createDataFrame(
        [Row(url="https://a.com/1", key="a.com"),
         Row(url="https://a.com/9", key="a.com")]
    )
    hits, misses = cache.split_cached(batch)
    h = hits.collect()
    assert len(h) == 1 and h[0].url == "https://a.com/1"
    assert bytes(h[0].content) == b"ONE"
    m = misses.collect()
    assert len(m) == 1 and m[0].url == "https://a.com/9"


def test_bulk_payload_builder():
    from incubator_stormcrawler_spark.operators.search_sink import (
        build_bulk_payload,
        doc_id_for,
    )
    import json as _json

    docs = [
        {"url": "https://a.com/1", "title": "One", "key": "a.com"},
        {"url": "https://a.com/2", "title": "Two", "key": "a.com"},
    ]
    body = build_bulk_payload(docs, "docs", create_only=True,
                              routing_field="key")
    lines = body.strip().split("\n")
    assert len(lines) == 4
    action = _json.loads(lines[0])
    assert "create" in action
    assert action["create"]["_id"] == doc_id_for("https://a.com/1")
    assert action["create"]["routing"] == "a.com"
    assert _json.loads(lines[1])["title"] == "One"
    # default verb is index
    assert "index" in _json.loads(
        build_bulk_payload(docs, "docs").split("\n")[0]
    )


def test_bulk_batching_bounds():
    from incubator_stormcrawler_spark.operators.search_sink import (
        batch_documents,
    )

    rows = [{"url": f"https://a.com/{i}", "text": "x" * 100} for i in range(25)]
    batches = list(batch_documents(rows, max_docs=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    # size-bounded: tiny byte cap forces one doc per batch
    batches = list(batch_documents(rows[:5], max_docs=100, max_bytes=120))
    assert [len(b) for b in batches] == [1, 1, 1, 1, 1]


def test_playwright_protocol_gated():
    from incubator_stormcrawler_spark.protocol.browser import PlaywrightProtocol

    with pytest.raises(ImportError, match="playwright"):
        PlaywrightProtocol()


def test_write_opensearch_bulk_http(spark, tmp_path):
    """Drive the bulk sink against a live local HTTP stub accepting
    /_bulk — the transport layer end-to-end, not just the payload."""
    import http.server
    import json as _json
    import threading
    from pyspark.sql import Row
    from incubator_stormcrawler_spark.operators.search_sink import (
        write_opensearch,
    )

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, body.decode()))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"errors": false, "items": []}')

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        docs = spark.createDataFrame(
            [Row(url=f"https://a.com/{i}", title=f"T{i}", key="a.com")
             for i in range(7)]
        ).coalesce(2)
        write_opensearch(docs, f"http://127.0.0.1:{port}", "docs",
                         routing_field="key", max_docs_per_batch=3)
    finally:
        srv.shutdown()

    assert all(path == "/_bulk" for path, _ in received)
    all_lines = [l for _, b in received for l in b.strip().split("\n")]
    actions = [_json.loads(l) for l in all_lines[::2]]
    sources = [_json.loads(l) for l in all_lines[1::2]]
    assert len(actions) == 7
    assert {s["title"] for s in sources} == {f"T{i}" for i in range(7)}
    assert all(a["index"]["routing"] == "a.com" for a in actions)
    # batching respected: no request carried more than 3 docs
    for _, b in received:
        assert len(b.strip().split("\n")) <= 6
