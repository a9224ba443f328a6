"""WARC archive read/write — WARCSpout + WARCHdfsBolt re-expressed.

Reference behavior:
  - read: external/warc/.../WARCSpout.java:57-64 replays ``.warc.gz``
    response records as ``(url, content, metadata)`` exactly as if fetched.
  - write: external/warc/.../WARCHdfsBolt.java:38 + WARCRecordFormat.java:49,
    298-433 — WARC/1.0 records, one gzip member per record, payload SHA-1
    digests, warcinfo header, size/time file rotation
    (FileTimeSizeRotationPolicy.java:24).

This is a dependency-free WARC/1.0 subset (warcio isn't in the container):
gzip-member framing, response/request/warcinfo record types, block/payload
digests. Spark integration: read via ``spark.read.format("binaryFile")`` +
``mapInPandas`` record expansion (one archive file per task — WARC members
don't split, matching how the reference reads whole files); write via
``foreachPartition``-style writer producing one rotated ``.warc.gz`` per
partition — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from base64 import b32encode
from dataclasses import dataclass, field

WARC_VERSION = "WARC/1.0"
CRLF = "\r\n"


@dataclass
class WarcRecord:
    rec_type: str  # warcinfo | request | response
    url: str | None
    date: str  # ISO-8601 Z
    headers: dict[str, str] = field(default_factory=dict)
    http_headers: str | None = None  # raw HTTP header block (response/request)
    payload: bytes = b""
    record_id: str | None = None


def _sha1_digest(data: bytes) -> str:
    """WARC digest notation: sha1:BASE32 (WARCRecordFormat.java:70-77)."""
    return "sha1:" + b32encode(hashlib.sha1(data).digest()).decode("ascii")


def write_record(rec: WarcRecord) -> bytes:
    """Serialize one record as a standalone gzip member
    (GzipHdfsBolt.java:32 — per-record gzip so archives are splittable at
    member boundaries and individually seekable)."""
    if rec.http_headers is not None:
        block = rec.http_headers.encode("latin-1") + b"\r\n\r\n" + rec.payload
    else:
        block = rec.payload

    rid = rec.record_id or (
        "<urn:uuid:" + hashlib.md5(
            (rec.date + (rec.url or "") + rec.rec_type).encode()
        ).hexdigest() + ">"
    )
    headers = [
        (WARC_VERSION, None),
        ("WARC-Type", rec.rec_type),
        ("WARC-Date", rec.date),
        ("WARC-Record-ID", rid),
    ]
    if rec.url:
        headers.append(("WARC-Target-URI", rec.url))
    if rec.http_headers is not None:
        headers.append(
            ("Content-Type", "application/http; msgtype=" + rec.rec_type)
        )
    else:
        headers.append(("Content-Type", "application/warc-fields"))
    headers.append(("WARC-Block-Digest", _sha1_digest(block)))
    if rec.rec_type == "response":
        headers.append(("WARC-Payload-Digest", _sha1_digest(rec.payload)))
    for k, v in rec.headers.items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(block))))

    head_lines = [headers[0][0]] + [f"{k}: {v}" for k, v in headers[1:]]
    raw = (CRLF.join(head_lines) + CRLF + CRLF).encode("latin-1") + block + (
        CRLF + CRLF
    ).encode()
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
        gz.write(raw)
    return buf.getvalue()


def warcinfo_record(date: str, software: str = "stormcrawler-spark") -> bytes:
    fields = f"software: {software}{CRLF}format: WARC File Format 1.0{CRLF}"
    return write_record(
        WarcRecord(
            rec_type="warcinfo", url=None, date=date, payload=fields.encode()
        )
    )


def read_records(data: bytes):
    """Iterate WarcRecords from (possibly multi-member gzip) WARC bytes.
    Tolerates plain (uncompressed) archives and skips undecodable tails —
    the reference likewise skips unparsable records
    (external/warc test 'unparsable-date.warc.gz')."""
    if data[:2] == b"\x1f\x8b":
        stream = io.BytesIO(data)
        raw = b""
        while True:
            try:
                with gzip.GzipFile(fileobj=stream) as gz:
                    raw += gz.read()
            except (OSError, EOFError):
                break
            if stream.tell() >= len(data):
                break
        data = raw

    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end == -1:
            return
        head = data[pos:head_end].decode("latin-1", "replace")
        lines = head.split(CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            pos = head_end + 4
            continue
        hdrs: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip()] = v.strip()
        try:
            length = int(hdrs.get("Content-Length", "0"))
        except ValueError:
            return
        block = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # skip trailing CRLFCRLF
        while data[pos : pos + 2] == b"\r\n":
            pos += 2

        http_headers = None
        payload = block
        ctype = hdrs.get("Content-Type", "")
        if ctype.startswith("application/http"):
            split = block.find(b"\r\n\r\n")
            if split != -1:
                http_headers = block[:split].decode("latin-1", "replace")
                payload = block[split + 4 :]
        yield WarcRecord(
            rec_type=hdrs.get("WARC-Type", ""),
            url=hdrs.get("WARC-Target-URI"),
            date=hdrs.get("WARC-Date", ""),
            headers=hdrs,
            http_headers=http_headers,
            payload=payload,
        )


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

WARC_ROW_DDL = (
    "url string, fetch_date string, status_line string, "
    "content binary, content_type string, warc_file string"
)


def read_warc(spark, path: str):
    """WARC replay source: ``.warc[.gz]`` files → DataFrame of response
    records, as if freshly fetched (WARCSpout semantics). binaryFile source
    keeps one archive per task (WARC members don't split mid-file)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for rec in read_records(bytes(row.content)):
                    if rec.rec_type != "response":
                        continue
                    status_line = None
                    ctype = None
                    if rec.http_headers:
                        hl = rec.http_headers.split(CRLF)
                        status_line = hl[0]
                        for line in hl[1:]:
                            k, _, v = line.partition(":")
                            if k.strip().lower() == "content-type":
                                ctype = v.strip()
                    out.append(
                        {
                            "url": rec.url,
                            "fetch_date": rec.date,
                            "status_line": status_line,
                            "content": rec.payload,
                            "content_type": ctype,
                            "warc_file": row.path,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "fetch_date", "status_line", "content",
                    "content_type", "warc_file",
                ],
            )

    return files.select("path", "content").mapInPandas(run, schema=WARC_ROW_DDL)


def write_warc(
    pages,
    out_dir: str,
    date: str = "2024-01-15T00:00:00Z",
    max_bytes_per_file: int = 1 << 30,
    prefix: str = "crawl",
):
    """WARC sink: DataFrame(url, content[, http_headers]) → one or more
    ``.warc.gz`` per partition under ``out_dir`` (WARCHdfsBolt +
    FileTimeSizeRotationPolicy: size-based rotation; time-based rotation is
    the driver loop's per-generation file naming).

    Runs via ``foreachPartition`` — each task streams its partition straight
    to its own file; no shuffle, no driver involvement.
    """
    os.makedirs(out_dir, exist_ok=True)
    has_http = "http_headers" in pages.columns

    def write_partition(it):
        import uuid

        part_id = uuid.uuid4().hex[:8]
        seq = 0
        f = None
        written = 0

        def open_file():
            nonlocal f, written, seq
            name = os.path.join(out_dir, f"{prefix}-{part_id}-{seq:05d}.warc.gz")
            f = open(name, "wb")
            f.write(warcinfo_record(date))
            written = 0
            seq += 1

        for row in it:
            if f is None:  # lazy: empty partitions produce no file
                open_file()
            http = (
                row["http_headers"]
                if has_http and row["http_headers"]
                else f"HTTP/1.1 200 OK{CRLF}Content-Type: text/html"
            )
            rec = write_record(
                WarcRecord(
                    rec_type="response",
                    url=row["url"],
                    date=date,
                    http_headers=http,
                    payload=bytes(row["content"] or b""),
                )
            )
            if written + len(rec) > max_bytes_per_file and written > 0:
                f.close()
                open_file()
            f.write(rec)
            written += len(rec)
        if f is not None:
            f.close()

    pages.foreachPartition(write_partition)
