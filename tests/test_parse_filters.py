"""Parse-filter chain tests (SURVEY.md §2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.parse.parse_filters import (
    ParseFilterChain,
    collection_tagger,
    csv_to_multivalued,
    domain_metadata,
    ldjson_extract,
    md5_signature,
    mimetype_normalization,
)


@pytest.fixture(scope="module")
def docs(spark):
    html = (
        b"<html><head><script type=\"application/ld+json\">"
        b'{"@type": "Article", "headline": "Big News"}'
        b"</script></head><body>hi</body></html>"
    )
    return spark.createDataFrame(
        [
            Row(url="https://news.example.com/a", content=bytearray(html),
                text="hi", content_type="text/html"),
            Row(url="https://shop.other.org/b.pdf", content=bytearray(b"%PDF"),
                text=None, content_type="application/pdf"),
        ]
    )


def test_md5_signature_and_copy(spark, docs):
    d1 = md5_signature(docs)
    sigs = {r.url: r.signature for r in d1.collect()}
    assert all(len(s) == 32 for s in sigs.values())
    # re-sign with copy: old value moves to signatureOld
    d2 = md5_signature(d1, key_name_copy="signatureOld")
    r = {x.url: x for x in d2.collect()}
    assert r["https://news.example.com/a"].signatureOld == sigs["https://news.example.com/a"]


def test_collection_tagger(docs):
    out = collection_tagger(
        docs,
        {
            "news": {"include": [r"//news\."], "exclude": [r"\.pdf$"]},
            "pdfs": {"include": [r"\.pdf$"]},
        },
    )
    got = {r.url: list(r.collections) for r in out.collect()}
    assert got["https://news.example.com/a"] == ["news"]
    assert got["https://shop.other.org/b.pdf"] == ["pdfs"]


def test_domain_metadata(docs):
    got = {r.url: (r.host, r.domain) for r in domain_metadata(docs).collect()}
    assert got["https://news.example.com/a"] == ("news.example.com", "example.com")


def test_mimetype_normalization(docs):
    got = {r.url: r.format for r in mimetype_normalization(docs).collect()}
    assert got["https://news.example.com/a"] == "HTML"
    assert got["https://shop.other.org/b.pdf"] == "PDF"


def test_csv_to_multivalued(spark):
    df = spark.createDataFrame([Row(tags="a, b ,c")])
    got = csv_to_multivalued(df, "tags").collect()[0].tags
    assert got == ["a", "b", "c"]


def test_ldjson_extract(docs):
    out = ldjson_extract(docs, {"headline": "$.headline", "type": "$['@type']"})
    got = {r.url: (r.headline, r.type) for r in out.collect()}
    assert got["https://news.example.com/a"] == ("Big News", "Article")
    assert got["https://shop.other.org/b.pdf"] == (None, None)


def test_chain_config(docs):
    chain = ParseFilterChain(
        [
            {"class": "MD5SignatureParseFilter"},
            {"class": "DomainParseFilter"},
            {"class": "MimeTypeNormalization"},
            {"class": "CollectionTagger",
             "params": {"collections": {"all": {"include": ["."]}}}},
        ]
    )
    out = chain.apply(docs)
    row = out.where(F.col("url").contains("news")).collect()[0]
    assert row.signature and row.host and row.format == "HTML"
    assert list(row.collections) == ["all"]


def test_language_id_filter(spark):
    from pyspark.sql import Row
    from incubator_stormcrawler_spark.parse.parse_filters import (
        ParseFilterChain,
        language_id,
    )

    df = spark.createDataFrame(
        [Row(url="u1", text="the cat and the dog of a house"),
         Row(url="u2", text="der hund und die katze und das haus"),
         Row(url="u3", text="nothing matching here whatsoever")]
    )
    got = {r.url: (r.lang_pred, r.lang_confidence)
           for r in language_id(df).collect()}
    assert got["u1"][0] == "en" and got["u1"][1] > 0.3
    assert got["u2"][0] == "de"
    assert got["u3"][0] == "und"
    # minProb gate forces low-evidence docs to 'und'
    gated = {r.url: r.lang_pred
             for r in language_id(df, min_confidence=0.9).collect()}
    assert gated == {"u1": "und", "u2": "und", "u3": "und"}
    # registered in the chain
    chain = ParseFilterChain([{"class": "LanguageID"}])
    assert "lang_pred" in chain.apply(df).columns
