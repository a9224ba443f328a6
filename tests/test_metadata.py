"""Metadata transfer + indexer projection tests
(util/MetadataTransfer.java:124-159; indexing/AbstractIndexerBolt.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.operators.metadata import (
    indexer_projection,
    outlink_metadata,
    persist_metadata,
)


def test_outlink_metadata_transfer(spark):
    df = spark.createDataFrame(
        [
            (
                "https://a.com/parent",
                "https://a.com/child",
                {"depth": ["2"], "seed.id": ["s1"], "secret": ["x"],
                 "crawl.batch": ["b7"]},
            )
        ],
        "source_url string, target_url string, metadata map<string,array<string>>",
    )
    out = outlink_metadata(df, transfer_keys=["seed.*", "crawl.batch"]).collect()[0]
    md = out.metadata
    assert md["seed.id"] == ["s1"]          # glob-transferred
    assert md["crawl.batch"] == ["b7"]      # exact-transferred
    assert "secret" not in md               # not configured → dropped
    assert md["depth"] == ["3"]             # incremented
    assert md["url.path"] == ["https://a.com/parent"]


def test_outlink_metadata_null_and_missing_depth(spark):
    df = spark.createDataFrame(
        [("https://a.com/", "https://a.com/x", None)],
        "source_url string, target_url string, metadata map<string,array<string>>",
    )
    md = outlink_metadata(df, transfer_keys=[]).collect()[0].metadata
    assert md["depth"] == ["1"]


def test_persist_metadata_projection(spark):
    df = spark.createDataFrame(
        [
            (
                "https://a.com/",
                {"_redirTo": ["https://b.com/"], "error.cause": ["robots"],
                 "fetch.error.count": ["2"], "transient.thing": ["x"]},
            )
        ],
        "url string, metadata map<string,array<string>>",
    )
    md = persist_metadata(df).collect()[0].metadata
    assert set(md) == {"_redirTo", "error.cause", "fetch.error.count"}


def test_indexer_projection_contract(spark):
    df = spark.createDataFrame(
        [
            (
                "https://a.com/page",
                "Some long text here",
                {"parse.title": ["T1"], "canonical": ["https://a.com/canon"],
                 "index": ["true"]},
            ),
            (
                "https://a.com/skip",
                "x",
                {"parse.title": ["T2"]},
            ),
        ],
        "url string, text string, metadata map<string,array<string>>",
    )
    out = indexer_projection(
        df,
        mapping={"parse.title": "title"},
        filter_key="index",
        filter_value="true",
        canonical_key="canonical",
        text_max_length=9,
    ).collect()
    assert len(out) == 1  # filter dropped the second doc
    r = out[0]
    assert r.url == "https://a.com/canon"  # canonical override
    assert r.title == "T1"                 # mapping rename
    assert r.text == "Some long"           # trimmed
