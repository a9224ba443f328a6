"""Property-based tests (hypothesis) — invariants the example-based suites
can't sweep: normalizer idempotence/robustness, robots parser totality,
merge invariants, simhash banding soundness."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_stormcrawler_spark.functions.urls import (
    BasicURLNormalizer,
    partition_key,
)
from incubator_stormcrawler_spark.protocol.robots import parse_robots_txt

HOSTS = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,6}){1,2}", fullmatch=True)
PATHS = st.from_regex(r"(/[a-zA-Z0-9._~%\-]{0,12}){0,4}", fullmatch=True)
QUERIES = st.from_regex(r"(\?[a-z]{1,5}=[a-zA-Z0-9%]{0,8}(&[a-z]{1,5}=[a-zA-Z0-9%]{0,8}){0,3})?", fullmatch=True)
FRAGS = st.from_regex(r"(#[a-zA-Z0-9]{0,8})?", fullmatch=True)


@st.composite
def urls(draw):
    return (
        draw(st.sampled_from(["http", "https"]))
        + "://"
        + draw(HOSTS)
        + draw(PATHS)
        + draw(QUERIES)
        + draw(FRAGS)
    )


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalizer_idempotent(url):
    """filter(filter(u)) == filter(u) — dedup keys must be stable."""
    n = BasicURLNormalizer()
    once = n.filter(url)
    if once is not None:
        assert n.filter(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalizer_strips_fragment_and_keeps_scheme(url):
    n = BasicURLNormalizer()
    out = n.filter(url)
    if out is not None:
        assert "#" not in out
        assert out.startswith(("http://", "https://"))


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalizer_never_raises(junk):
    BasicURLNormalizer().filter(junk)  # None or str, never an exception


@given(urls())
@settings(max_examples=200, deadline=None)
def test_partition_key_consistent_with_normalizer(url):
    """byHost key survives normalization (politeness must not change)."""
    n = BasicURLNormalizer()
    out = n.filter(url)
    if out is not None:
        assert partition_key(url, "byHost") == partition_key(out, "byHost")


@given(st.text(max_size=400), st.lists(st.sampled_from(["me", "bot", "x"]),
                                       min_size=1, max_size=2))
@settings(max_examples=200, deadline=None)
def test_robots_parser_total(content, agents):
    """Any input parses to usable rules; is_allowed is total."""
    rules = parse_robots_txt(content, agents)
    assert rules.is_allowed("https://h.example/some/path") in (True, False)


@given(st.lists(st.sampled_from(
    ["DISCOVERED", "FETCHED", "FETCH_ERROR", "REDIRECTION", "ERROR"]),
    min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_status_priority_total_order(statuses):
    from incubator_stormcrawler_spark.operators.status_merge import (
        STATUS_PRIORITY,
    )

    best = max(statuses, key=lambda s: STATUS_PRIORITY[s])
    assert STATUS_PRIORITY[best] == max(STATUS_PRIORITY[s] for s in statuses)


@given(st.integers(0, (1 << 32) - 1), st.integers(0, (1 << 32) - 1))
@settings(max_examples=300, deadline=None)
def test_simhash_banding_pigeonhole(a, b):
    """Hamming ≤ 3 ⇒ some byte of the 32-bit signature matches — the
    soundness condition the banded candidate join relies on."""
    ham = bin(a ^ b).count("1")
    bytes_equal = any(((a >> (8 * i)) & 255) == ((b >> (8 * i)) & 255)
                      for i in range(4))
    if ham <= 3:
        assert bytes_equal


def test_stopword_anchors_unique_across_languages():
    """Each anchor word belongs to exactly one language, so argmax scores
    cannot tie between languages on single-language text."""
    from incubator_stormcrawler_spark.functions.text import STOPWORDS

    assert len(STOPWORDS) >= 16
    all_words = [w for ws in STOPWORDS.values() for w in ws]
    assert len(all_words) == len(set(all_words))


def test_langid_multilingual_snippets(spark):
    """Single-language snippets across the 16 supported languages must be
    identified; evidence-free text falls back to 'und'."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.functions.text import langid_scores

    snippets = {
        "en": "the cat sat of the mat and went to sleep",
        "de": "der hund und die katze sind nicht da",
        "fr": "le chien et les chats ne sont pas ici",
        "es": "el perro y los gatos no están aquí",
        "pt": "o cão não está com os gatos uma vez",
        "it": "il cane non è che per gli amici",
        "nl": "de hond het huis een kat van niet",
        "sv": "och katten att det som ligger på mattan",
        "da": "og jeg er ikke til hunden",
        "pl": "nie wiem czy to jest na pewno z nim się",
        "cs": "že aby to bylo jako ale si",
        "ro": "și este pentru dar nu acum",
        "tr": "ve bir bu için değil evet",
        "id": "yang dan tidak dengan untuk kita",
        "fi": "ja on ei että mutta kissa",
        "ru": "и в не что это дом",
        "und": "zzz qqq xxx yyy www",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(snippets.values())]
    )
    got = {r.doc_id: r.lang_pred for r in langid_scores(docs).collect()}
    want = dict(enumerate(snippets))
    assert got == want


def test_langid_extended_languages(spark):
    """Snippets across the round-4 breadth extension: additional
    stopword-anchored languages plus non-Latin scripts."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.functions.text import langid_scores

    snippets = {
        "no": "hunden kom fra byen etter et år eller to av og",
        "hu": "és nem tudom hogy egy macska már itt van",
        "vi": "của tôi và bạn là không có người nào",
        "et": "kui ta oli seal või ka seda nägi",
        "lv": "un tas ir ar mani par to kā vienmēr",
        "lt": "kad tai buvo bet ne iš ten",
        "sk": "sa aj ktorý bol keď iba dnes",
        "sl": "in pa tudi kot še nikoli",
        "hr": "koji su došli ili samo bez njih",
        "ca": "amb els gossos però més aviat aquest la seva",
        "sw": "ya watu wa kijiji kwa sababu ni katika",
        "tl": "ang mga bata ng bayan ito ay hindi",
        "bg": "на котката да се за храна той каза",
        "uk": "і кіт та пес це як він сказав",
        "el": "και το σπίτι της πόλης είναι εδώ που ήταν",
        "he": "של החתול את הבית על הגג זה לא",
        "ar": "في البيت من المدينة على السطح هذا أن",
        "fa": "از خانه که را این است گربه",
        "hi": "है के घर में की बिल्ली और कुत्ता",
        "bn": "এবং না এই বাড়ি করে থেকে বিড়াল",
        "ta": "மற்றும் இது என்று உள்ள ஒரு வீடு",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(snippets.values())]
    )
    got = {r.doc_id: r.lang_pred for r in langid_scores(docs).collect()}
    want = dict(enumerate(snippets))
    assert got == want


def test_langid_script_fallback(spark):
    """Zero-stopword documents in non-whitespace or script-exclusive
    alphabets resolve via the ordered script-range fallback: kana beats the
    CJK-unified block for Japanese (kanji+kana mix), bare han reads zh,
    hangul ko, thai th, anchor-free cyrillic defaults to ru; confidence is
    script-hit density."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.functions.text import langid_scores

    cases = [
        (0, "これは日本語の文章です", "ja"),       # kana + kanji mix
        (1, "中文文本没有空格", "zh"),             # han only
        (2, "한국어 문장 입니다", "ko"),
        (3, "ภาษาไทยไม่มีวรรคตอน", "th"),
        (4, "Просто текст без якорей", "ru"),      # cyrillic, no anchors
        (5, "plain latin words only here", "und"),  # no evidence at all
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, _ in cases]
    )
    rows = {r.doc_id: r for r in langid_scores(docs).collect()}
    for i, _, want in cases:
        assert rows[i].lang_pred == want, (i, rows[i].lang_pred, want)
    # script-detected rows report a hit-density confidence in (0, 1]
    assert 0.0 < rows[0].confidence <= 1.0
    assert rows[5].confidence == 0.0


def test_langid_round4_breadth(spark):
    """Round-4 additions: 7 new stopword-anchored languages and 12
    script-exclusive alphabets resolve correctly."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.functions.text import langid_scores

    anchored = {
        "af": "die hond het 'n been vir hulle baie gesê",
        "is": "að hún sagði ég því þetta væri gott",
        "sq": "që një ditë për të është shumë mirë",
        "eu": "eta gero ez dago baina hor zen behin",
        "cy": "mae hi ddim wedi mynd gyda nhw ond yma",
        "az": "və o ilə birlikdə olaraq daha çox edir",
        "sr": "је пас су стигли као него овај дан",
    }
    scripts = {
        "ka": "კატა სახლში ზის და ელოდება",
        "hy": "կատուն նստած է տանը եւ սպասում է",
        "am": "ድመቷ በቤት ውስጥ ተቀምጣለች",
        "si": "බළලා ගෙදර සිටියි",
        "te": "పిల్లి ఇంట్లో కూర్చుంది",
        "kn": "ಬೆಕ್ಕು ಮನೆಯಲ್ಲಿ ಕುಳಿತಿದೆ",
        "ml": "പൂച്ച വീട്ടിൽ ഇരിക്കുന്നു",
        "gu": "બિલાડી ઘરમાં બેઠી છે",
        "pa": "ਬਿੱਲੀ ਘਰ ਵਿੱਚ ਬੈਠੀ ਹੈ",
        "my": "ကြောင်သည် အိမ်တွင် ထိုင်နေသည်",
        "km": "ឆ្មាអង្គុយនៅផ្ទះ",
        "lo": "ແມວນັ່ງຢູ່ເຮືອນ",
    }
    snippets = {**anchored, **scripts}
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(snippets.values())]
    )
    got = {r.doc_id: r.lang_pred for r in langid_scores(docs).collect()}
    want = dict(enumerate(snippets))
    assert got == want


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_bmp_png_roundtrip_property(w, h, seed):
    """encode→decode is the identity for BOTH real image codecs on
    arbitrary image shapes (every BMP row-padding case, 1-pixel edges)
    and arbitrary pixel content."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(
    st.integers(min_value=1, max_value=2000),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, seed):
    """encode_wav→decode_audio is the identity for arbitrary mono int16
    sample streams of any length."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n).astype("<i2")
    assert np.array_equal(decode_audio(encode_wav(s), None), s)


# ---------------------------------------------------------------------------
# Prefix-filter completeness (jaccard_prefix_pairs' math, swept in pure
# python — the Spark op's equivalence tests pin 3 thresholds on one
# corpus; this sweeps random set systems × thresholds, so a future edit
# to the prefix-length/ceil/length-filter arithmetic can't silently drop
# a qualifying pair)
# ---------------------------------------------------------------------------

from fractions import Fraction


def _prefix_candidates(sets, t: Fraction):
    """Replicates jaccard_prefix_pairs' candidate logic: global (df,
    token) rarity order, prefix length s - ceil(t·s) + 1 via integer
    ceil, length filter min·den >= max·num."""
    num, den = t.numerator, t.denominator
    df = {}
    for s in sets.values():
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    order = {tok: (df[tok], tok) for tok in df}
    prefixes = {}
    for doc, s in sets.items():
        toks = sorted(s, key=lambda x: order[x])
        n = len(s)
        ceil_ts = (num * n + den - 1) // den
        prefixes[doc] = set(toks[: n - ceil_ts + 1])
    cands = set()
    docs = sorted(sets)
    for i, d1 in enumerate(docs):
        for d2 in docs[i + 1:]:
            n1, n2 = len(sets[d1]), len(sets[d2])
            if min(n1, n2) * den < max(n1, n2) * num:
                continue
            if prefixes[d1] & prefixes[d2]:
                cands.add((d1, d2))
    return cands


@given(
    st.lists(
        st.sets(st.integers(0, 25), min_size=1, max_size=12),
        min_size=2, max_size=8,
    ),
    st.sampled_from(["1/2", "11/20", "3/5", "7/10", "4/5"]),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_candidates_complete(set_list, tstr):
    """COMPLETENESS: every pair with true Jaccard ≥ t must appear in the
    prefix-filter candidate set (the verify stage can only REMOVE
    candidates, so a miss here is a silently dropped true pair)."""
    t = Fraction(tstr)
    sets = {i: s for i, s in enumerate(set_list)}
    cands = _prefix_candidates(sets, t)
    docs = sorted(sets)
    for i, d1 in enumerate(docs):
        for d2 in docs[i + 1:]:
            a, b = sets[d1], sets[d2]
            jac = Fraction(len(a & b), len(a | b))
            if jac >= t:
                assert (d1, d2) in cands, (
                    f"missed pair {d1},{d2} J={jac} t={t} "
                    f"sets={a},{b}"
                )


@given(
    st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=40),
    st.integers(2, 40),
)
@settings(max_examples=300, deadline=None)
def test_decayed_rate_fixed_point_exact(cents, window):
    """decayed_rates' integer pipeline (shift-accumulate, one final
    division) equals the EXACT rational Σ v_i·2^−d / 100 at every
    bucket, and the accumulator never leaves int64 at the documented
    headroom."""
    n = len(cents)
    for t in range(n):
        acc = 0
        for d in range(window):
            i = t - d
            if 0 <= i < n:
                acc += cents[i] << (window - 1 - d)
        assert -(2**63) < acc < 2**63
        got = acc / float((1 << (window - 1)) * 100)
        exact = sum(
            Fraction(cents[t - d], 100) * Fraction(1, 2**d)
            for d in range(window)
            if 0 <= t - d < n
        )
        # one IEEE division of an exact integer by an exact double —
        # equal to the rational within one ulp of the quotient
        assert abs(got - float(exact)) <= abs(float(exact)) * 1e-15


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 2**32 - 1),
    st.sampled_from(["noise", "stripes", "constant", "gradient"]),
)
def test_gif_lzw_roundtrip_property(h, w, seed, kind):
    """Pure-Python property sweep of the GIF89a LZW codec: ANY grayscale
    image roundtrips pixel-exactly through encode_gif -> decode_gif —
    shapes, palettes, and content classes chosen to cross the 9->10-bit
    code-width boundary and exercise dictionary growth patterns the
    fixed-fixture test can't enumerate."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(seed % (2**32))
    if kind == "noise":
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    elif kind == "stripes":
        img = np.tile((np.arange(w) * 17) % 256, (h, 1)).astype(np.uint8)
    elif kind == "constant":
        img = np.full((h, w), seed % 256, np.uint8)
    else:
        img = (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(
            np.uint8
        )
    back = decode_gif(encode_gif(img))
    assert back.shape == img.shape
    assert (back == img).all()
