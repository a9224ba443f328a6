"""Search-index sink — the OpenSearch IndexerBolt re-expressed
(external/opensearch/.../bolt/IndexerBolt.java:81-123: bulk-async writes,
``create``-only flag, ingest pipeline param; routing by politeness key,
persistence/StatusUpdaterBolt.java:80-98).

Split into a pure, testable payload layer and a gated transport:

* ``build_bulk_payload`` — docs → NDJSON ``_bulk`` body with create/index
  actions, sha256 doc ids, optional per-doc routing. Pure function.
* ``write_opensearch`` — ``foreachPartition`` HTTP POST of per-partition
  bulk bodies (batched like the reference's BulkProcessor). Needs a live
  endpoint, so tests cover the payload layer and the batching math only.
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
    politeness key."""
    lines = []
    verb = "create" if create_only else "index"
    for doc in docs:
        action: dict = {"_index": index, "_id": doc_id_for(doc["url"])}
        if routing_field and doc.get(routing_field):
            action["routing"] = doc[routing_field]
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


def write_opensearch(
    docs,
    endpoint: str,
    index: str,
    create_only: bool = False,
    routing_field: str | None = None,
    max_docs_per_batch: int = 500,
) -> None:
    """foreachPartition bulk writer. Each task streams its partition as
    size-bounded ``_bulk`` requests — the exact shape of the reference's
    per-bolt BulkProcessor, with Spark tasks as the parallelism."""

    def send_partition(rows):
        import urllib.request

        for batch in batch_documents(rows, max_docs=max_docs_per_batch):
            payload = build_bulk_payload(
                batch, index, create_only=create_only, routing_field=routing_field
            )
            req = urllib.request.Request(
                f"{endpoint.rstrip('/')}/_bulk",
                data=payload.encode(),
                headers={"Content-Type": "application/x-ndjson"},
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                body = json.loads(resp.read())
                if body.get("errors"):
                    raise RuntimeError(f"bulk indexing errors: {body}")

    docs.foreachPartition(send_partition)
