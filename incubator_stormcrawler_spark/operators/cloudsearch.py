"""CloudSearch indexer sink — the AWS CloudSearchIndexerBolt re-expressed
(external/aws/.../bolt/CloudSearchIndexerBolt.java:69; utils
CloudSearchUtils.java: sha-512 ids, field-name cleaning, codepoint strip).

Same split as the OpenSearch sink (operators/search_sink.py): a pure,
fully-tested payload layer (SDF batch-document JSON, 5 MB / 1 MB limits,
field typing rules) and a transport gated on a live endpoint.

SDF ("search data format") rules implemented from the reference:
  * doc id       = sha512(url) hex (CloudSearchUtils.getID)
  * field names  = lowercased, [^a-z_0-9] → '_', must be 3-64 chars
                   (cleanFieldName)
  * values       = invalid-XML codepoints stripped
                   (stripNonCharCodepoints); date-typed fields must parse
                   ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` or are dropped
  * multi-values kept only for ``*-array`` typed fields, else first wins
  * fields not defined in the domain schema are skipped
  * batches      = JSON arrays capped at 5,242,880 bytes; single docs over
                   1,048,576 bytes are dropped (MAX_SIZE_BATCH_BYTES /
                   MAX_SIZE_DOC_BYTES)
"""

from __future__ import annotations

import hashlib
import json
import re

MAX_SIZE_BATCH_BYTES = 5_242_880
MAX_SIZE_DOC_BYTES = 1_048_576

# CloudSearchUtils.INVALID_XML_CHARS: anything outside the XML 1.0 range
_INVALID_XML_CHARS = re.compile(
    "[^\\u0009\\u000A\\u000D\\u0020-\\uD7FF\\uE000-\\uFFFD]"
)
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$")


def cs_doc_id(url: str) -> str:
    """sha512(url) hex — CloudSearchUtils.getID (≤128 chars guaranteed)."""
    return hashlib.sha512(url.encode()).hexdigest()


def cs_clean_field_name(name: str) -> str:
    """cleanFieldName: lowercase, illegal chars → '_', length 3-64."""
    lowered = re.sub(r"[^a-z_0-9]", "_", name.lower())
    if not 3 <= len(lowered) <= 64:
        raise ValueError(
            f"Field name must be between 3 and 64 chars: {lowered}"
        )
    return lowered


def cs_strip_non_char_codepoints(value: str) -> str:
    return _INVALID_XML_CHARS.sub("", value)


def build_add_doc(
    url: str,
    metadata: dict[str, list[str]] | None,
    text: str | None,
    field_types: dict[str, str],
    url_field: str = "url",
    text_field: str = "content",
) -> dict | None:
    """One SDF ``add`` operation (CloudSearchIndexerBolt.execute:208-300).

    ``field_types``: the CloudSearch domain schema {field: type}; fields
    absent from it are skipped, ``*-array`` types keep every value, date
    types validate the reference's date format.
    """
    fields: dict = {}
    for raw_name, values in (metadata or {}).items():
        name = cs_clean_field_name(raw_name)
        ftype = field_types.get(name)
        if ftype is None:
            continue
        if len(values) > 1 and "-array" not in ftype.lower():
            values = values[:1]
        kept = []
        for v in values:
            if "date" in ftype.lower():
                if not _DATE_RE.match(v):
                    continue  # unparsable date → dropped
            else:
                v = cs_strip_non_char_codepoints(v)
            kept.append(v)
        if kept:
            fields[name] = kept if "-array" in ftype.lower() else kept[0]
    if url_field:
        name = cs_clean_field_name(url_field)
        if name in field_types:
            fields[name] = cs_strip_non_char_codepoints(url)
    if text_field and text is not None:
        name = cs_clean_field_name(text_field)
        if name in field_types:
            fields[name] = cs_strip_non_char_codepoints(text)
    return {"type": "add", "id": cs_doc_id(url), "fields": fields}


def build_delete_doc(url: str) -> dict:
    """SDF ``delete`` op — the deletion-stream consumer's payload."""
    return {"type": "delete", "id": cs_doc_id(url)}


def batch_sdf_documents(
    ops,
    max_batch_bytes: int = MAX_SIZE_BATCH_BYTES,
    max_doc_bytes: int = MAX_SIZE_DOC_BYTES,
    max_docs: int | None = None,
):
    """Pack SDF ops into JSON-array bodies within the CloudSearch limits
    (addToBatch, CloudSearchIndexerBolt.java:308-345): oversized docs are
    dropped; a batch flushes when adding the next doc would exceed the
    byte cap (or the optional doc-count cap). Yields JSON strings."""
    batch: list[str] = []
    size = 1  # '['
    for op in ops:
        doc = json.dumps(op, sort_keys=True, ensure_ascii=False)
        doc_len = len(doc.encode())
        if doc_len > max_doc_bytes:
            continue
        if batch and (
            size + doc_len + 2 >= max_batch_bytes
            or (max_docs is not None and len(batch) >= max_docs)
        ):
            yield "[" + ",".join(batch) + "]"
            batch, size = [], 1
        batch.append(doc)
        size += doc_len + 1  # ',' separator
    if batch:
        yield "[" + ",".join(batch) + "]"


def write_cloudsearch(
    df,
    endpoint: str,
    field_types: dict[str, str],
    url_field: str = "url",
    text_field: str = "content",
    max_docs_in_batch: int | None = None,
):
    """Gated transport: per-partition POSTs of SDF batches to
    ``{endpoint}/2013-01-01/documents/batch`` — the SDK upload call the
    reference makes, as plain HTTP. Needs a live CloudSearch domain, so
    tests cover the payload + batching layers only."""

    def send_partition(rows):
        import urllib.request

        ops = (
            build_add_doc(
                r["url"],
                r.get("metadata"),
                r.get("text"),
                field_types,
                url_field,
                text_field,
            )
            for r in (row.asDict() for row in rows)
        )
        for body in batch_sdf_documents(ops, max_docs=max_docs_in_batch):
            req = urllib.request.Request(
                f"{endpoint}/2013-01-01/documents/batch",
                data=body.encode(),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=30)

    df.foreachPartition(send_partition)
