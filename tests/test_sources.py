"""Seed + WARC source tests (FileSpout/StringTabScheme; WARC round-trip per
FIXTURES.md §7)."""

from __future__ import annotations

import glob
import os

import pytest

from incubator_stormcrawler_spark.sources.warc import (
    WarcRecord,
    read_records,
    write_record,
)


def test_seed_parsing(spark, tmp_path):
    from incubator_stormcrawler_spark.sources.seeds import read_seeds

    seeds = tmp_path / "seeds.txt"
    seeds.write_text(
        "https://a.example/\n"
        "# comment line\n"
        "\n"
        "https://b.example/\tisSitemap=true\tdepth=0\n"
        "https://c.example/\tk=v1\tk=v2\n"
    )
    rows = {r.url: r.metadata for r in read_seeds(spark, str(seeds)).collect()}
    assert set(rows) == {
        "https://a.example/", "https://b.example/", "https://c.example/",
    }
    assert rows["https://a.example/"] in ({}, None) or len(rows["https://a.example/"]) == 0
    assert rows["https://b.example/"]["isSitemap"] == ["true"]
    assert rows["https://b.example/"]["depth"] == ["0"]
    assert rows["https://c.example/"]["k"] == ["v1", "v2"]  # multi-valued


def test_warc_record_roundtrip():
    rec = WarcRecord(
        rec_type="response",
        url="https://a.example/x",
        date="2024-01-15T00:00:00Z",
        http_headers="HTTP/1.1 200 OK\r\nContent-Type: text/html",
        payload=b"<html>hello</html>",
    )
    raw = write_record(rec)
    out = list(read_records(raw))
    assert len(out) == 1
    r = out[0]
    assert r.rec_type == "response"
    assert r.url == "https://a.example/x"
    assert r.payload == b"<html>hello</html>"
    assert r.http_headers.startswith("HTTP/1.1 200 OK")
    assert r.headers["WARC-Payload-Digest"].startswith("sha1:")


def test_warc_multi_member():
    recs = [
        WarcRecord("response", f"https://a.example/{i}", "2024-01-15T00:00:00Z",
                   http_headers="HTTP/1.1 200 OK", payload=f"body{i}".encode())
        for i in range(3)
    ]
    blob = b"".join(write_record(r) for r in recs)
    out = list(read_records(blob))
    assert [r.url for r in out] == [f"https://a.example/{i}" for i in range(3)]
    assert [r.payload for r in out] == [b"body0", b"body1", b"body2"]


def test_warc_spark_roundtrip(spark, tmp_path):
    """write(pages) → read == pages on (url, content) — FIXTURES.md §7."""
    from pyspark.sql import Row
    from incubator_stormcrawler_spark.sources.warc import read_warc, write_warc

    pages = spark.createDataFrame(
        [
            Row(url=f"https://site{i % 3}.example/p{i}",
                content=bytearray(f"<html>page {i}</html>".encode()))
            for i in range(20)
        ]
    ).repartition(3)
    out_dir = str(tmp_path / "warc")
    write_warc(pages, out_dir)
    files = glob.glob(os.path.join(out_dir, "*.warc.gz"))
    assert len(files) == 3  # one per partition

    back = read_warc(spark, os.path.join(out_dir, "*.warc.gz"))
    got = {r.url: bytes(r.content) for r in back.collect()}
    want = {r.url: bytes(r.content) for r in pages.collect()}
    assert got == want
    ct = back.select("content_type").distinct().collect()
    assert [r.content_type for r in ct] == ["text/html"]
