"""Parse-filter chain — per-document enrichment after parsing
(core/.../parse/ParseFilters.java:52 loads ``parsefilters.json``; each
filter implements ``filter(url, content, DOM, ParseResult)``,
parse/ParseFilter.java:29).

Spark-first: every filter below is a **column transformation** on the
parsed-docs DataFrame — no DOM object travels between operators; filters
that need structure (XPath-ish extraction, JSON-LD) re-read it from
``content``/``text`` inside native functions where possible. The chain is
therefore a single ``select`` pipeline Catalyst can fuse into one stage.

Filters (reference → here):
  MD5SignatureParseFilter (:48,52-92)     → md5 of content/text with
                                            keyNameCopy for change detection
  CollectionTagger (:67)                  → include/exclude regex sets per
                                            named collection
  DomainParseFilter (:31)                 → host/domain metadata columns
  MimeTypeNormalization (:31)             → coarse format mapping
  CommaSeparatedToMultivaluedMetadata     → split(col, ',')
  LDJsonParseFilter (:41)                 → JSON-LD script extraction +
                                            get_json_object paths
  LanguageID (langid external)            → functions/text.langid_scores
  XPathFilter (:55)                       → regex-based element extraction
                                            (title/meta) native; full XPath
                                            via lxml unavailable → documented
                                            stub raising NotImplementedError
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_key_expr


def md5_signature(
    docs: DataFrame,
    use_text: bool = False,
    key_name: str = "signature",
    key_name_copy: str | None = None,
) -> DataFrame:
    """Page signature for change detection
    (parse/filter/MD5SignatureParseFilter.java:48,52-92): md5 of binary
    content (or text), fallback to the URL; ``key_name_copy`` preserves the
    previous signature column (AdaptiveScheduler pairs them)."""
    src = F.col("text") if use_text else F.col("content").cast("string")
    sig = F.md5(F.coalesce(src, F.col("url")))
    out = docs
    if key_name_copy and key_name in docs.columns:
        out = out.withColumn(key_name_copy, F.col(key_name))
    return out.withColumn(key_name, sig)


def collection_tagger(
    docs: DataFrame,
    collections: dict[str, dict],
    url_col: str = "url",
    out_col: str = "collections",
) -> DataFrame:
    """Tag docs whose URL matches include/exclude regex sets per collection
    (parse/filter/CollectionTagger.java:67). ``collections``:
    {name: {"include": [regex...], "exclude": [regex...]}} → array column
    of matching collection names. Pure rlike chain — codegen'd."""
    url = F.col(url_col)
    tags = []
    for name, spec in collections.items():
        inc = spec.get("include", [])
        exc = spec.get("exclude", [])
        cond = F.lit(False)
        for rx in inc:
            cond = cond | url.rlike(rx)
        for rx in exc:
            cond = cond & ~url.rlike(rx)
        tags.append(F.when(cond, F.lit(name)))
    return docs.withColumn(
        out_col, F.array_compact(F.array(*tags)) if tags else F.array()
    )


def domain_metadata(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Host + paid-level-domain columns
    (parse/filter/DomainParseFilter.java:31). Host is native; PLD here is
    the last-2-labels fast approximation (full PSL via functions.urls)."""
    host = host_key_expr(F.col(url_col))
    return docs.withColumn("host", host).withColumn(
        "domain", F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    )


MIME_FORMAT_MAP = {
    "text/html": "HTML",
    "application/xhtml+xml": "HTML",
    "application/pdf": "PDF",
    "text/plain": "TEXT",
    "application/msword": "DOC",
    "image/jpeg": "IMAGE",
    "image/png": "IMAGE",
    "application/rss+xml": "FEED",
    "application/atom+xml": "FEED",
}


def mimetype_normalization(
    docs: DataFrame, mime_col: str = "content_type", out_col: str = "format"
) -> DataFrame:
    """Coarse format from mime type
    (parse/filter/MimeTypeNormalization.java:31)."""
    mime = F.lower(F.coalesce(F.col(mime_col), F.lit("")))
    expr = F.lit("OTHER")
    for m, fmt in reversed(list(MIME_FORMAT_MAP.items())):
        expr = F.when(mime.startswith(m), F.lit(fmt)).otherwise(expr)
    return docs.withColumn(out_col, expr)


def csv_to_multivalued(
    docs: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """Split a comma-separated value into a multi-valued array
    (parse/filter/CommaSeparatedToMultivaluedMetadata.java:34)."""
    return docs.withColumn(
        out_col or col,
        F.transform(F.split(F.col(col), ","), lambda x: F.trim(x)),
    )


_LDJSON_RE = (
    r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)</script>'
)


def ldjson_extract(
    docs: DataFrame,
    json_paths: dict[str, str] | None = None,
    content_col: str = "content",
) -> DataFrame:
    """JSON-LD extraction (parse/filter/LDJsonParseFilter.java:41): pull the
    first ``<script type="application/ld+json">`` block, then project JSON
    paths ({out_col: '$.path'}) via ``get_json_object`` — all native."""
    raw = F.regexp_extract(F.col(content_col).cast("string"), _LDJSON_RE, 1)
    out = docs.withColumn("ldjson", F.when(raw != "", raw))
    for out_col, path in (json_paths or {}).items():
        out = out.withColumn(out_col, F.get_json_object(F.col("ldjson"), path))
    return out


def xpath_extract(docs: DataFrame, expressions: dict[str, str]) -> DataFrame:
    """XPathFilter (parse/filter/XPathFilter.java:55) — XML fast path.
    Spark ships an ``xpath`` SQL function for well-formed XML (JVM-side,
    codegen); real crawl HTML goes through
    ``parse.xpath_html.xpath_extract_html``, which evaluates the same
    expression subset over a tolerant DOM.

    expressions: {out_col: xpath} applied via F.xpath on content-as-string."""
    out = docs
    xml = F.col("content").cast("string")
    for out_col, xp in expressions.items():
        out = out.withColumn(out_col, F.xpath(xml, F.lit(xp)))
    return out


def language_id(
    docs: DataFrame, text_col: str = "text", min_confidence: float = 0.0
) -> DataFrame:
    """LanguageID parse filter (external/langid/.../LanguageID.java:54,
    89-120): additive columns ``lang_pred``/``lang_confidence``; predictions
    under ``min_confidence`` fall back to 'und' (the minProb gate)."""
    from ..functions.text import STOPWORDS, stopword_hits_expr, token_count_expr

    text = F.col(text_col)
    n_tok = F.greatest(token_count_expr(text), F.lit(1))
    scores = {
        lang: stopword_hits_expr(text, words) for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    conf = F.round(best / n_tok, 4)
    gated = F.when(conf >= min_confidence, pred).otherwise(F.lit("und"))
    return docs.withColumn("lang_pred", gated).withColumn("lang_confidence", conf)


class ParseFilterChain:
    """parsefilters.json-style declarative chain
    (core/.../parse/ParseFilters.java:52): ordered list of
    {"class": name, "params": {...}} applied as DataFrame transforms."""

    REGISTRY = {
        "MD5SignatureParseFilter": md5_signature,
        "CollectionTagger": collection_tagger,
        "DomainParseFilter": domain_metadata,
        "MimeTypeNormalization": mimetype_normalization,
        "CommaSeparatedToMultivaluedMetadata": csv_to_multivalued,
        "LDJsonParseFilter": ldjson_extract,
        "XPathFilter": xpath_extract,
        "LanguageID": language_id,
    }

    def __init__(self, config: list[dict]):
        self.steps = []
        for entry in config:
            fn = self.REGISTRY.get(entry["class"])
            if fn is None:
                raise ValueError(f"unknown parse filter: {entry['class']}")
            self.steps.append((fn, entry.get("params", {})))

    def apply(self, docs: DataFrame) -> DataFrame:
        for fn, params in self.steps:
            docs = fn(docs, **params)
        return docs
