"""Live bulk-transport tests — the OpenSearch `_bulk` wire protocol
exercised end-to-end against an in-process stub endpoint (same pattern as
test_http_live.py's WireMock-style fetch suite). These drive the REAL
``write_opensearch`` / ``delete_opensearch`` foreachPartition writers from
Spark executors over HTTP, not just the payload builders: NDJSON framing,
sha256 ids, routing passthrough, count-bounded batching, create-vs-index
replay semantics (per-item 409 acked as success, exactly
persistence/StatusUpdaterBolt.java:330-337), real item errors raising,
and deletion of missing ids as a no-op (DeletionBolt.java:55)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from incubator_stormcrawler_spark.operators.search_sink import (
    delete_opensearch,
    doc_id_for,
    write_opensearch,
)


class BulkState:
    """In-memory 'index': (index, _id) -> source doc, plus request log."""

    def __init__(self):
        self.docs: dict = {}
        self.routing: dict = {}
        self.pipelines: dict = {}
        self.requests: list[str] = []
        self.fail_ids: set[str] = set()
        self.lock = threading.Lock()


STATE = BulkState()


class BulkHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        if not self.path.endswith("/_bulk"):
            self.send_response(404)
            self.end_headers()
            return
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        lines = [ln for ln in body.split("\n") if ln]
        items, errors = [], False
        with STATE.lock:
            STATE.requests.append(body)
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                verb, meta = next(iter(action.items()))
                key = (meta["_index"], meta["_id"])
                if verb == "delete":
                    found = key in STATE.docs
                    STATE.docs.pop(key, None)
                    items.append({"delete": {
                        "_id": meta["_id"], "status": 200 if found else 404,
                        "result": "deleted" if found else "not_found"}})
                    i += 1
                    continue
                source = json.loads(lines[i + 1])
                i += 2
                if meta["_id"] in STATE.fail_ids:
                    errors = True
                    items.append({verb: {
                        "_id": meta["_id"], "status": 400,
                        "error": {"type": "mapper_parsing_exception"}}})
                    continue
                if verb == "create" and key in STATE.docs:
                    errors = True
                    items.append({"create": {
                        "_id": meta["_id"], "status": 409,
                        "error": {
                            "type": "version_conflict_engine_exception"}}})
                    continue
                STATE.docs[key] = source
                if "routing" in meta:
                    STATE.routing[key] = meta["routing"]
                if "pipeline" in meta:
                    STATE.pipelines[key] = meta["pipeline"]
                items.append({verb: {"_id": meta["_id"], "status": 201}})
        resp = json.dumps({"took": 1, "errors": errors, "items": items})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(resp.encode())


@pytest.fixture(scope="module")
def endpoint():
    httpd = HTTPServer(("127.0.0.1", 0), BulkHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


@pytest.fixture(autouse=True)
def clean_state():
    with STATE.lock:
        STATE.docs.clear()
        STATE.routing.clear()
        STATE.pipelines.clear()
        STATE.requests.clear()
        STATE.fail_ids.clear()
    yield


def _docs_df(spark, n=7):
    from pyspark.sql import Row

    return spark.createDataFrame([
        Row(url=f"https://h{i % 3}.example/p{i}", title=f"t{i}",
            key=f"h{i % 3}.example")
        for i in range(n)
    ])


def test_bulk_roundtrip_ids_routing_batching(spark, endpoint):
    df = _docs_df(spark, 7).coalesce(1)
    write_opensearch(df, endpoint, "content", routing_field="key",
                     pipeline="extract-meta", max_docs_per_batch=3)
    assert len(STATE.docs) == 7
    key = ("content", doc_id_for("https://h1.example/p1"))
    assert STATE.docs[key]["title"] == "t1"
    assert STATE.routing[key] == "h1.example"
    assert STATE.pipelines[key] == "extract-meta"  # ingest pipeline param
    # 7 docs, 3/request → 3 bulk requests from the single partition
    assert len(STATE.requests) == 3


def test_create_only_replay_is_noop_not_error(spark, endpoint):
    """The crash-retry path: a replayed DISCOVERED batch hits per-item
    409s, which must ack as success AND leave the stored docs untouched
    (no clobber of fresher state — the whole point of create)."""
    df = _docs_df(spark, 4)
    write_opensearch(df, endpoint, "status", create_only=True)
    with STATE.lock:
        for key in STATE.docs:
            STATE.docs[key] = {"frozen": True}
    write_opensearch(df, endpoint, "status", create_only=True)  # replay
    assert len(STATE.docs) == 4
    assert all(d == {"frozen": True} for d in STATE.docs.values())


def test_index_mode_overwrites_and_real_errors_raise(spark, endpoint):
    df = _docs_df(spark, 3)
    write_opensearch(df, endpoint, "content")
    write_opensearch(df, endpoint, "content")  # index mode: upsert, no 409
    assert len(STATE.docs) == 3
    with STATE.lock:
        STATE.fail_ids.add(doc_id_for("https://h1.example/p1"))
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError, match="mapper_parsing_exception"):
        write_opensearch(df, endpoint, "content")


def test_deletion_stream_deletes_and_missing_is_noop(spark, endpoint):
    from pyspark.sql import Row

    df = _docs_df(spark, 5)
    write_opensearch(df, endpoint, "content")
    assert len(STATE.docs) == 5
    dels = spark.createDataFrame([
        Row(url="https://h1.example/p1"),
        Row(url="https://h2.example/p2"),
        Row(url="https://never.indexed/x"),  # not_found → no error
    ])
    delete_opensearch(dels, endpoint, "content")
    assert len(STATE.docs) == 3
    assert ("content", doc_id_for("https://h1.example/p1")) not in STATE.docs


# ---- Solr live stub --------------------------------------------------------


class SolrState:
    def __init__(self):
        self.docs: dict = {}  # (collection, url) -> doc
        self.lock = threading.Lock()


SOLR = SolrState()


class SolrHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        # /solr/<collection>/update
        parts = self.path.split("?")[0].strip("/").split("/")
        if len(parts) != 3 or parts[0] != "solr" or parts[2] != "update":
            self.send_response(404)
            self.end_headers()
            return
        collection = parts[1]
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])).decode()
        )
        with SOLR.lock:
            if isinstance(body, list):  # add: JSON array of docs
                for doc in body:
                    SOLR.docs[(collection, doc["url"])] = doc
            elif "delete" in body:  # deleteById — unknown id is a no-op
                for u in body["delete"]:
                    SOLR.docs.pop((collection, u), None)
        resp = json.dumps({"responseHeader": {"status": 0, "QTime": 1}})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(resp.encode())


@pytest.fixture(scope="module")
def solr_endpoint():
    httpd = HTTPServer(("127.0.0.1", 0), SolrHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_solr_update_roundtrip_and_delete_by_raw_url(spark, solr_endpoint):
    """Solr IndexerBolt wire contract: docs land keyed by the RAW url
    (Solr's uniqueKey — no digest, unlike OpenSearch), re-adding upserts,
    and the deletion stream deletes by id with unknown ids as no-ops
    (bolt/DeletionBolt.java:75)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.search_sink import (
        delete_solr,
        write_solr,
    )

    with SOLR.lock:
        SOLR.docs.clear()
    df = _docs_df(spark, 6)
    write_solr(df, solr_endpoint, "content", max_docs_per_batch=4)
    assert len(SOLR.docs) == 6
    assert SOLR.docs[("content", "https://h0.example/p0")]["title"] == "t0"

    # upsert: second add replaces, count unchanged
    write_solr(df, solr_endpoint, "content")
    assert len(SOLR.docs) == 6

    dels = spark.createDataFrame([
        Row(url="https://h0.example/p0"),
        Row(url="https://never.indexed/x"),
    ])
    delete_solr(dels, solr_endpoint, "content")
    assert len(SOLR.docs) == 5
    assert ("content", "https://h0.example/p0") not in SOLR.docs
