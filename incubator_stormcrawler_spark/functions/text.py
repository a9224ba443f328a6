"""Text-analysis expression builders for the training-data pipeline:
language-ID (stopword heuristic), quality metrics, token counting, document
fingerprinting.

Crawl-side analogs: the langid ParseFilter
(external/langid/.../LanguageID.java:54,89-120) and the MD5 signature
filter (core/.../parse/filter/MD5SignatureParseFilter.java). Here they are
pure column expressions — codegen'd, shuffle-free, and expressible in the
DuckDB oracle — rather than model-backed UDFs. A production deployment can
swap in a pandas_udf fastText/CLD3 scorer with the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword heuristic —
# 16 languages toward the reference detector's breadth (optimaize covers
# 70+; a model-backed pandas_udf slots into the same contract for the
# rest). Each anchor word appears in exactly one language's list so scores
# never tie by construction (asserted in tests/test_properties.py).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "pas"],
    "es": ["el", "los", "las", "y", "no"],
    "pt": ["o", "os", "uma", "não", "com"],
    "it": ["il", "gli", "che", "per", "non"],
    "nl": ["de", "het", "een", "van", "niet"],
    "sv": ["och", "att", "det", "som", "på"],
    "da": ["og", "jeg", "ikke", "til", "er"],
    "pl": ["nie", "się", "jest", "na", "z"],
    "cs": ["že", "aby", "jako", "ale", "si"],
    "ro": ["și", "este", "pentru", "dar", "nu"],
    "tr": ["ve", "bir", "bu", "için", "değil"],
    "id": ["yang", "dan", "tidak", "dengan", "untuk"],
    "fi": ["ja", "on", "ei", "että", "mutta"],
    "ru": ["и", "в", "не", "что", "это"],
}


def tokens_expr(text: Column) -> Column:
    return F.split(text, " ")


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant would swap the
    delimiter for a pattern; corpus here is single-spaced)."""
    return F.size(tokens_expr(text))


def stopword_hits_expr(text: Column, words: list[str]) -> Column:
    toks = tokens_expr(text)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics: token counts, uniqueness, mean token
    length, stopword ratio — the filter features of C4/Gopher-style
    corpus cleaning, as one projection pass."""
    text = F.col(text_col)
    toks = tokens_expr(text)
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    # mean token length without exploding: strip separators, count chars
    mean_len = (F.length(F.regexp_replace(text, " ", "")) / n_tok)
    stop_ratio = stopword_hits_expr(text, STOPWORDS["en"]) / n_tok
    return docs.select(
        "doc_id",
        F.length(text).cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        n_uniq.cast("bigint").alias("n_uniq_tokens"),
        F.round(n_uniq / n_tok, 4).alias("uniq_ratio"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
    )


def langid_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-anchor language ID: score = hits per language, predict
    argmax (ties / zero-evidence → 'und'), mirroring the langid
    ParseFilter's minProb-gated prediction (LanguageID.java:89-120)."""
    text = F.col(text_col)
    n_tok = token_count_expr(text)
    scores = {
        lang: stopword_hits_expr(text, words) for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so earlier languages win ties (when() chains first-match)
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            pred
        )
    out = docs.select(
        "doc_id",
        *[F.col(text_col)],
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
    )
    return out.select(
        "doc_id",
        *[F.col(f"score_{lang}").cast("bigint").alias(f"score_{lang}")
          for lang in STOPWORDS],
        F.round(best / F.greatest(n_tok, F.lit(1)), 4).alias("confidence"),
        pred.alias("lang_pred"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-defined fingerprints: md5 of normalized text plus a prefix
    anchor hash (first 8 tokens) — the cheap batch stand-in for a rolling
    hash; near-identical prefixes collide on ``anchor_hash`` which makes it
    a useful blocking key for incremental dedup."""
    text = F.col(text_col)
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    prefix = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(prefix).alias("anchor_hash"),
    )


# PII patterns kept portable between Java regex (Spark) and RE2 (DuckDB):
# no lookarounds, no backreferences. Conservative by design — a scrub pass
# wants recall on the obvious shapes, with model-backed NER as the
# production swap-in for the long tail.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -]?[0-9]{0,4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass: replace emails / international-format phones /
    IPv4 addresses with typed placeholder tags and count what was removed
    (C4-style corpus hygiene; the counts feed the pipeline report).

    A pure projection — regexp_count + chained regexp_replace, codegen'd,
    no shuffle — so it composes into any scan without a stage break, which
    is exactly what a 100 TB scrub pass needs (it must ride along an
    existing read, never force its own).
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    scrubbed = text
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts, scrubbed.alias("clean_text"))
