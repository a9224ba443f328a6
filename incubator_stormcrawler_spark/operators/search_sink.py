"""Search-index sink — the OpenSearch IndexerBolt re-expressed
(external/opensearch/.../bolt/IndexerBolt.java:81-123: bulk-async writes,
``create``-only flag, ingest pipeline param; routing by politeness key,
persistence/StatusUpdaterBolt.java:80-98).

Split into a pure payload layer and a real HTTP transport:

* ``build_bulk_payload`` / ``build_solr_update_payload`` — docs → wire
  bodies (NDJSON ``_bulk`` with create/index actions + sha256 doc ids +
  routing; Solr JSON-array adds keyed by raw URL). Pure functions.
* ``write_opensearch`` / ``delete_opensearch`` / ``write_solr`` /
  ``delete_solr`` — ``foreachPartition`` HTTP writers (batched like the
  reference's BulkProcessor / SolrJ update client). The full transport —
  framing, batching, replay-conflict acks, deletion no-ops — runs live
  against in-process stub endpoints in tests/test_search_live.py; only a
  real cluster is absent from the sandbox.
"""

from __future__ import annotations

import hashlib
import json


def doc_id_for(url: str) -> str:
    """sha256(url) — AbstractStatusUpdaterBolt.java:251-253's identity."""
    return hashlib.sha256(url.encode()).hexdigest()


def build_bulk_payload(
    docs: list[dict],
    index: str,
    create_only: bool = False,
    routing_field: str | None = None,
    pipeline: str | None = None,
) -> str:
    """NDJSON bulk body: action line + source line per doc.

    ``create_only`` mirrors the DISCOVERED create-vs-index distinction
    (opensearch StatusUpdaterBolt: create for new docs so replays don't
    clobber fresher state); ``routing_field`` mirrors ``%s.routing`` by
    politeness key; ``pipeline`` mirrors ``%s.pipeline`` — the ingest
    pipeline set per request (bolt/IndexerBolt.java:238-239), carried as
    per-action metadata in bulk."""
    lines = []
    verb = "create" if create_only else "index"
    for doc in docs:
        action: dict = {"_index": index, "_id": doc_id_for(doc["url"])}
        if routing_field and doc.get(routing_field):
            action["routing"] = doc[routing_field]
        if pipeline:
            action["pipeline"] = pipeline
        lines.append(json.dumps({verb: action}, sort_keys=True))
        lines.append(json.dumps(doc, sort_keys=True, default=str))
    return "\n".join(lines) + "\n"


def batch_documents(rows, max_docs: int = 500, max_bytes: int = 5 * 1024 * 1024):
    """Yield doc batches bounded by count AND serialized size — the
    BulkProcessor/CloudSearch 5 MB batching discipline
    (external/aws/.../CloudSearchIndexerBolt.java:69)."""
    batch: list[dict] = []
    size = 0
    for row in rows:
        doc = row if isinstance(row, dict) else row.asDict()
        doc_bytes = len(json.dumps(doc, default=str))
        if batch and (len(batch) >= max_docs or size + doc_bytes > max_bytes):
            yield batch
            batch, size = [], 0
        batch.append(doc)
        size += doc_bytes
    if batch:
        yield batch


def _url_batches(rows, max_docs: int):
    """URL lists for the deletion writers, bounded by count AND bytes via
    the same batch_documents discipline the write paths use (r7 review
    fix: the deletes hand-rolled a count-only loop twice)."""
    docs = ({"url": r} if isinstance(r, str) else r for r in rows)
    for batch in batch_documents(docs, max_docs=max_docs):
        yield [d["url"] for d in batch]


def _post_bulk(endpoint: str, payload: str) -> dict:
    import urllib.request

    req = urllib.request.Request(
        f"{endpoint.rstrip('/')}/_bulk",
        data=payload.encode(),
        headers={"Content-Type": "application/x-ndjson"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _raise_on_item_errors(body: dict, tolerate_conflicts: bool) -> None:
    """Per-item failure policy, reference-exact: a CREATE that hits an
    existing doc returns per-item 409 CONFLICT, which the reference acks
    as success ("already discovered" — opensearch
    persistence/StatusUpdaterBolt.java:330-337 counts doc_conflicts and
    does NOT fail the tuple); every other item failure is a real error.
    Without this, a replayed generation (the crash-retry path) would
    poison-pill the whole batch on its own earlier success."""
    if not body.get("errors"):
        return
    real = []
    for item in body.get("items", []):
        for verb, r in item.items():
            err = r.get("error")
            if not err:
                continue
            if tolerate_conflicts and r.get("status") == 409:
                continue
            real.append({verb: r})
    if real:
        raise RuntimeError(f"bulk indexing errors: {real}")


def write_opensearch(
    docs,
    endpoint: str,
    index: str,
    create_only: bool = False,
    routing_field: str | None = None,
    pipeline: str | None = None,
    max_docs_per_batch: int = 500,
) -> None:
    """foreachPartition bulk writer. Each task streams its partition as
    size-bounded ``_bulk`` requests — the exact shape of the reference's
    per-bolt BulkProcessor, with Spark tasks as the parallelism. Live
    wire format + replay semantics exercised against an in-process bulk
    endpoint in tests/test_search_live.py."""

    def send_partition(rows):
        for batch in batch_documents(rows, max_docs=max_docs_per_batch):
            payload = build_bulk_payload(
                batch, index, create_only=create_only,
                routing_field=routing_field, pipeline=pipeline,
            )
            body = _post_bulk(endpoint, payload)
            _raise_on_item_errors(body, tolerate_conflicts=create_only)

    docs.foreachPartition(send_partition)


def build_delete_payload(urls: list[str], index: str) -> str:
    """NDJSON bulk body of delete actions by sha256(url) id — the
    deletion stream's sink (opensearch bolt/DeletionBolt.java:55-66:
    deletes by the same documentID scheme as the indexer; fire-and-forget
    per URL)."""
    return "\n".join(
        json.dumps(
            {"delete": {"_index": index, "_id": doc_id_for(u)}},
            sort_keys=True,
        )
        for u in urls
    ) + "\n"


def delete_opensearch(
    urls_df,
    endpoint: str,
    index: str,
    max_docs_per_batch: int = 500,
) -> None:
    """foreachPartition deletion writer for the `deletion` stream
    (status_merge.deletion_stream rows). Deleting a never-indexed doc is
    a no-op, exactly like the reference ("will also try to delete
    documents even though they were never indexed" —
    DeletionBolt.java:55): bulk delete of a missing id reports
    result=not_found with no error flag, so no item-failure fires."""

    def send_partition(rows):
        for urls in _url_batches(rows, max_docs_per_batch):
            _raise_on_item_errors(
                _post_bulk(endpoint, build_delete_payload(urls, index)),
                tolerate_conflicts=False,
            )

    urls_df.foreachPartition(send_partition)


# ---- Solr transport --------------------------------------------------------


def build_solr_update_payload(docs: list[dict]) -> str:
    """JSON-array update body — what SolrJ's ``UpdateRequest.add`` sends
    to ``/update`` (solr bolt/IndexerBolt.java:95-127 builds one
    SolrInputDocument per tuple; the JSON equivalent is an array of
    docs). Unlike the OpenSearch sink there is no doc-id hashing: Solr's
    uniqueKey is the URL field itself."""
    return json.dumps(docs, sort_keys=True, default=str)


def build_solr_delete_payload(urls: list[str]) -> str:
    """``{"delete": [ids]}`` — SolrJ ``deleteById`` (solr
    bolt/DeletionBolt.java:75 deletes by the raw URL, NOT a digest)."""
    return json.dumps({"delete": list(urls)}, sort_keys=True)


def _post_solr(endpoint: str, collection: str, payload: str) -> dict:
    import urllib.request

    req = urllib.request.Request(
        f"{endpoint.rstrip('/')}/solr/{collection}/update?commitWithin=10000",
        data=payload.encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        body = json.loads(resp.read())
    status = body.get("responseHeader", {}).get("status", -1)
    if status != 0:
        raise RuntimeError(f"solr update failed: {body}")
    return body


def write_solr(
    docs,
    endpoint: str,
    collection: str,
    max_docs_per_batch: int = 500,
) -> None:
    """foreachPartition Solr update writer — the Solr IndexerBolt's
    ``connection.getUpdateClient().add(doc)`` path with Spark tasks as
    the parallelism and the same count/size batching discipline as the
    OpenSearch sink. Live wire format exercised in
    tests/test_search_live.py."""

    def send_partition(rows):
        for batch in batch_documents(rows, max_docs=max_docs_per_batch):
            _post_solr(endpoint, collection, build_solr_update_payload(batch))

    docs.foreachPartition(send_partition)


def delete_solr(
    urls_df,
    endpoint: str,
    collection: str,
    max_docs_per_batch: int = 500,
) -> None:
    """foreachPartition deletion writer for the `deletion` stream —
    ``deleteById`` by raw URL; deleting an unknown id is a Solr no-op."""

    def send_partition(rows):
        for urls in _url_batches(rows, max_docs_per_batch):
            _post_solr(endpoint, collection, build_solr_delete_payload(urls))

    urls_df.foreachPartition(send_partition)
