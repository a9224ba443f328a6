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

# Per-language stopword anchors for the n-gram/stopword heuristic — 44
# space-tokenized languages toward the reference detector's breadth
# (optimaize covers 70+, LanguageID.java:54; a model-backed pandas_udf
# slots into the same contract for the rest). Each anchor word appears in
# exactly one language's list so scores never tie by construction
# (asserted in tests/test_properties.py). Scripts that don't whitespace-
# tokenize (CJK, Thai) are handled by SCRIPT_RANGES below instead.
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
    "no": ["å", "av", "eller", "etter", "fra"],
    "hu": ["és", "hogy", "nem", "egy", "már"],
    "vi": ["của", "và", "là", "không", "người"],
    "et": ["kui", "oli", "või", "ka", "seda"],
    "lv": ["un", "ir", "ar", "par", "kā"],
    "lt": ["kad", "tai", "bet", "buvo", "iš"],
    "sk": ["sa", "aj", "ktorý", "keď", "iba"],
    "sl": ["in", "pa", "tudi", "kot", "še"],
    "hr": ["koji", "su", "ili", "samo", "bez"],
    "ca": ["amb", "però", "més", "aquest", "seva"],
    "sw": ["ya", "wa", "kwa", "ni", "katika"],
    "tl": ["ang", "ng", "mga", "ito", "hindi"],
    "bg": ["на", "да", "се", "за", "той"],
    "uk": ["і", "та", "це", "як", "він"],
    "el": ["και", "το", "της", "είναι", "που"],
    "he": ["של", "את", "על", "זה", "לא"],
    "ar": ["في", "من", "على", "هذا", "أن"],
    "fa": ["از", "که", "را", "این", "است"],
    "hi": ["है", "के", "में", "की", "और"],
    "bn": ["এবং", "না", "এই", "করে", "থেকে"],
    "ta": ["மற்றும்", "இது", "என்று", "உள்ள", "ஒரு"],
    "af": ["'n", "vir", "baie", "hulle", "gesê"],
    "is": ["að", "ég", "því", "þetta", "hún"],
    "sq": ["që", "një", "për", "është", "shumë"],
    "eu": ["eta", "ez", "dago", "baina", "zen"],
    "cy": ["mae", "ddim", "wedi", "gyda", "ond"],
    "az": ["və", "ilə", "olaraq", "daha", "edir"],
    "sr": ["је", "су", "као", "него", "овај"],
}

# Script-range fallback for documents with zero stopword evidence — the
# whitespace tokenizer can't anchor scripts that don't space-separate
# (CJK, Thai), and it backstops short texts in script-exclusive alphabets.
# ORDERED first-match chain: kana before the CJK-unified block (Japanese
# text mixes kana + kanji; kanji alone reads as zh), Hangul/Thai before it
# too. Character classes are literal unicode ranges, portable between Java
# regex (Spark) and RE2 (DuckDB oracle).
SCRIPT_RANGES = {
    "ja": f"[{chr(0x3040)}-{chr(0x30FF)}]",  # hiragana + katakana
    "ko": f"[{chr(0xAC00)}-{chr(0xD7A3)}]",  # hangul syllables
    "th": f"[{chr(0x0E00)}-{chr(0x0E7F)}]",  # thai
    "zh": f"[{chr(0x4E00)}-{chr(0x9FFF)}]",  # CJK unified ideographs
    "ar": f"[{chr(0x0600)}-{chr(0x06FF)}]",  # arabic
    "he": f"[{chr(0x0590)}-{chr(0x05FF)}]",  # hebrew
    "el": f"[{chr(0x0370)}-{chr(0x03FF)}]",  # greek
    "hi": f"[{chr(0x0900)}-{chr(0x097F)}]",  # devanagari
    "bn": f"[{chr(0x0980)}-{chr(0x09FF)}]",  # bengali
    "ta": f"[{chr(0x0B80)}-{chr(0x0BFF)}]",  # tamil
    "ka": f"[{chr(0x10A0)}-{chr(0x10FF)}]",  # georgian
    "hy": f"[{chr(0x0530)}-{chr(0x058F)}]",  # armenian
    "am": f"[{chr(0x1200)}-{chr(0x137F)}]",  # ethiopic (amharic)
    "si": f"[{chr(0x0D80)}-{chr(0x0DFF)}]",  # sinhala
    "te": f"[{chr(0x0C00)}-{chr(0x0C7F)}]",  # telugu
    "kn": f"[{chr(0x0C80)}-{chr(0x0CFF)}]",  # kannada
    "ml": f"[{chr(0x0D00)}-{chr(0x0D7F)}]",  # malayalam
    "gu": f"[{chr(0x0A80)}-{chr(0x0AFF)}]",  # gujarati
    "pa": f"[{chr(0x0A00)}-{chr(0x0A7F)}]",  # gurmukhi (punjabi)
    "my": f"[{chr(0x1000)}-{chr(0x109F)}]",  # myanmar (burmese)
    "km": f"[{chr(0x1780)}-{chr(0x17FF)}]",  # khmer
    "lo": f"[{chr(0x0E80)}-{chr(0x0EFF)}]",  # lao
    "ru": f"[{chr(0x0400)}-{chr(0x04FF)}]",  # cyrillic (most-common default)
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
    """Language ID: stopword-anchor scores over 44 space-tokenized
    languages, argmax prediction (dict order wins ties), with an ordered
    script-range fallback (SCRIPT_RANGES) for documents with zero stopword
    evidence — covering the non-whitespace scripts (CJK, Thai) and
    script-exclusive alphabets. Mirrors the langid ParseFilter's
    minProb-gated prediction (LanguageID.java:89-120); ~60 predictable
    labels total (44 anchored + script-exclusive alphabets incl. Georgian,
    Armenian, Ethiopic, Sinhala, Telugu, Kannada, Malayalam, Gujarati,
    Gurmukhi, Myanmar, Khmer, Lao). Confidence = stopword hits/token for anchored docs,
    script hits/char for fallback docs.

    Pure codegen'd column expressions on purpose: at 100 TB this pass must
    ride along an existing scan. A fastText/CLD3 pandas_udf slots into the
    same (lang_pred, confidence) contract for the long tail.

    Built as SQL strings (selectExpr), not pyspark.sql.functions
    composition: the 44-language tree is ~2,000 Column-API calls, each a
    py4j round trip, costing ~1.9 s of DRIVER time per query build —
    pure fixed overhead that dominated the sf0.1 bench (1.65 s total for
    0.19 s of execution). One parsed SQL string per projection builds the
    IDENTICAL plan in ~0.2 s. (Fixed cost, so irrelevant at 100 TB — this
    is about honest bench numbers and snappy interactive use.)
    """
    def _q(s: str) -> str:
        """SQL single-quoted string literal (Spark default escaping)."""
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    tcol = f"`{text_col}`"
    toks = f"split({tcol}, ' ')"
    # ALL 44 stopword scores as named projected columns. score = number of
    # DISTINCT anchor words present (array_intersect): native +
    # codegen-able, unlike a filter() lambda which drops the projection to
    # interpreted eval (2.5× slower measured, and no common-subexpression
    # elimination). Distinct-hit scoring separates languages exactly as
    # well as occurrence counts for 5-word anchors. Whole-stage codegen's
    # runtime CSE dedupes the re-inlined copies Catalyst's project
    # collapse creates (an element_at(array(...)) formulation instead
    # overflowed janino's method-size limit and fell back to interpreted).
    score_cols = [
        "cast(size(array_intersect("
        + toks
        + ", array("
        + ", ".join(_q(w) for w in words)
        + f"))) as bigint) AS score_{lang}"
        for lang, words in STOPWORDS.items()
    ]
    scored = docs.selectExpr(
        "doc_id",
        *score_cols,
        f"size({toks}) AS __ntok",
        f"length({tcol}) AS __nchars",
        f"{tcol} AS __text",
    )
    # argmax via array_max over (score, -rank, lang) structs — struct
    # comparison is field-lexicographic: max score first, then the
    # SMALLEST dict rank (via -rank), matching the first-match tie rule
    # of the oracle's CASE chain.
    anchored = (
        "array_max(array("
        + ", ".join(
            f"named_struct('s', score_{lang}, 'r', {-i}, 'l', {_q(lang)})"
            for i, lang in enumerate(STOPWORDS)
        )
        + "))"
    )
    # script fallback: earliest range (kana before CJK etc.) with any hit.
    # The regexp_counts live ONLY inside this expression, which only
    # appears inside the zero-evidence CASE branch below — so they are
    # never computed for stopword-anchored rows, whether or not Catalyst
    # collapses the projections.
    script = (
        "array_max(array("
        + ", ".join(
            "named_struct('h', cast(regexp_count(__text, "
            + _q(SCRIPT_RANGES[lang])
            + f") > 0 as int), 'r', {-i}, 'l', "
            + _q(lang)
            + ", 'n', regexp_count(__text, "
            + _q(SCRIPT_RANGES[lang])
            + "))"
            for i, lang in enumerate(SCRIPT_RANGES)
        )
        + "))"
    )
    # CASE evaluates branches lazily per row, so anchored rows (most of a
    # real corpus) never pay the 23 regex scans. Zero-evidence rows are
    # further pre-gated by a byte-level ASCII test: every SCRIPT_RANGES
    # class is ≥ U+0370, so pure-ASCII text (length == octet_length under
    # UTF-8) cannot match any of them — those rows resolve to 'und' for
    # the price of two length() calls instead of 23 regex scans.
    # Output-identical to the ungated form.
    und = "named_struct('p', 'und', 'c', cast(0.0 as double))"
    res = (
        f"CASE WHEN {anchored}.s > 0 THEN named_struct("
        f"'p', {anchored}.l, 'c', {anchored}.s / greatest(__ntok, 1)) "
        f"WHEN length(__text) <> octet_length(__text) THEN "
        f"CASE WHEN {script}.h > 0 THEN named_struct('p', {script}.l, "
        f"'c', {script}.n / greatest(__nchars, 1)) ELSE {und} END "
        f"ELSE {und} END"
    )
    return scored.selectExpr(
        "doc_id",
        *[f"score_{lang}" for lang in STOPWORDS],
        f"round(({res}).c, 4) AS confidence",
        f"({res}).p AS lang_pred",
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


CARD_CANDIDATE_RE = r"[0-9](?:[ -]?[0-9]){12,18}"

# Luhn checksum as a pure SQL expression over a digits-only string `d`:
# from the rightmost digit, double every second one, subtract 9 when the
# double exceeds 9, and require the sum % 10 == 0. Written in the SQL
# subset shared by Spark and DuckDB (HOF transform/aggregate over an index
# sequence + substr with a computed position) so the oracle runs the
# IDENTICAL check.
_LUHN_SQL = (
    "aggregate(transform(sequence(1, length({d})), i -> "
    "CASE WHEN (length({d}) - i) % 2 = 1 THEN "
    "IF(2 * cast(substring({d}, i, 1) as int) > 9, "
    "2 * cast(substring({d}, i, 1) as int) - 9, "
    "2 * cast(substring({d}, i, 1) as int)) "
    "ELSE cast(substring({d}, i, 1) as int) END), 0, (a, x) -> a + x) "
    "% 10 = 0"
)


def card_audit(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Payment-card audit for corpus hygiene: count 13–19-digit candidate
    runs (space/dash separators allowed) and how many pass the Luhn
    checksum — the verification step that separates real card leakage
    from random digit runs (a plain regex over web text is mostly false
    positives; Luhn-valid hits are the rows a scrub/legal pass must act
    on).

    Pure expressions end to end: candidate extraction, digit stripping,
    and the Luhn fold all run as HOFs inside the projection — no explode,
    no shuffle, rides any scan like ``pii_scrub``.
    """
    from pyspark.sql import functions as F

    # null text audits as empty (0 candidates, 0 valid) — without the
    # coalesce, size(regexp_extract_all(NULL)) is -1/NULL and the two
    # output columns would disagree about how "no text" is represented
    src = f"coalesce({text_col}, '')"
    cand = F.expr(f"regexp_extract_all({src}, '{CARD_CANDIDATE_RE}', 0)")
    digits = "regexp_replace(c, '[ -]', '')"
    luhn = _LUHN_SQL.format(d=digits)
    valid = F.expr(
        f"size(filter(regexp_extract_all({src}, '{CARD_CANDIDATE_RE}',"
        f" 0), c -> length({digits}) BETWEEN 13 AND 19 AND {luhn}))"
    )
    return docs.select(
        id_col,
        F.size(cand).cast("bigint").alias("n_card_candidates"),
        valid.cast("bigint").alias("n_luhn_valid"),
    )


def readability_scores(docs, text_col: str = "text") -> "DataFrame":
    """Flesch reading-ease per document from engine-portable proxies:
    sentences = punctuation-run count ([.!?]+, min 1), words = whitespace
    tokens, syllables = vowel-GROUP count per word (min 1/word — the
    standard dictionary-free approximation). score = 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), rounded; a corpus
    quality signal orthogonal to the length/repetition family (C4 keeps
    prose; Flesch separates prose from listings/boilerplate).

    Pure codegen projections — regexp_count + size, no explode, no UDF —
    so the pass rides any existing scan and the DuckDB oracle computes
    identically (both regex engines agree on these character classes).
    """
    text = F.col(text_col)
    words = F.size(F.split(text, " "))
    sentences = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)
    )
    vowel_groups = F.regexp_count(text, F.lit(r"[aeiouyAEIOUY]+"))
    # every word counts at least one syllable: vowel-less words (numbers,
    # symbols) still get 1 — add the shortfall via the word count minus
    # words containing a vowel group
    words_with_vowels = F.size(
        F.filter(
            F.split(text, " "),
            lambda w: w.rlike("[aeiouyAEIOUY]"),
        )
    )
    syllables = vowel_groups + (words - words_with_vowels)
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )
    return docs.select(
        "doc_id",
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        syllables.cast("bigint").alias("n_syllables"),
        F.round(score, 4).alias("flesch"),
    )
