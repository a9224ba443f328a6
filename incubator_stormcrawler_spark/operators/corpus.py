"""Corpus-construction operators: the steps between "crawled docs" and
"training data" — tokenization accounting, deterministic sampling/mixing,
quality filtering, and dedup-cluster resolution.

All pure DataFrame expressions (codegen'd, partial-aggregable) so the
DuckDB oracle can run the identical computation; all deterministic (hash
sampling — no RNG, reproducible across runs/engines/cluster sizes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import warn_if_plan_time_broadcast

# GPT-2-ish pretokenizer shape: contractions | letter-runs | digit-runs |
# punct-runs (whitespace-prefixed). Kept regex-portable between Spark
# (Java regex) and DuckDB (RE2): no lookarounds.
BPEISH_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token accounting both ways: whitespace words and BPE-ish subword
    pieces (the regex family GPT-style tokenizers pretokenize with) —
    the corpus-sizing numbers every training-data pipeline reports."""
    text = F.col(text_col)
    ws = F.size(F.split(text, " "))
    pieces = F.regexp_extract_all(text, F.lit(BPEISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        ws.cast("bigint").alias("n_words"),
        F.size(pieces).cast("bigint").alias("n_bpeish_tokens"),
        F.round(F.size(pieces) / ws, 4).alias("tokens_per_word"),
    )


def hash_bucket_expr(salt: str, id_col: str = "doc_id") -> Column:
    """The shared deterministic sampling bucket: first 4 md5 hex digits of
    (salt|id) as an int in [0, 65536) — engine-portable, stable across
    runs/reshards (every sampling/mixing operator keys off this)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            1, 4,
        ),
        16, 10,
    ).cast("int")


def hash_sample(
    docs: DataFrame,
    fraction: float,
    salt: str = "s1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sampling: keep iff the md5 bucket
    falls under fraction·16^4. Engine-portable and stable — re-running,
    resharding, or switching engines keeps the SAME sample (unlike
    rand()-based sampling)."""
    return docs.where(hash_bucket_expr(salt, id_col) < int(fraction * 65536))


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    salt: str = "mix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Source-weighted mixing: per-source deterministic sampling rates —
    the 'data mixture' step of corpus assembly, as one filter."""
    bucket = hash_bucket_expr(salt, id_col)
    keep = F.lit(False)
    for src, w in weights.items():
        keep = keep | ((F.col(source_col) == src) & (bucket < int(w * 65536)))
    return docs.where(keep)


def quality_reason_expr(
    text: Column,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_uniq_ratio: float = 0.3,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> Column:
    """The C4/Gopher keep/drop decision as a pure Column ('ok' or the
    failing-rule tag) — composable into any scan without a join (the
    clean-funnel query folds it next to the fingerprint in one pass)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    mean_len = F.length(F.regexp_replace(text, " ", "")) / n
    return (
        F.when(n < min_tokens, "too_short")
        .when(n > max_tokens, "too_long")
        .when(uniq_ratio < min_uniq_ratio, "repetitive")
        .when(mean_len < min_mean_token_len, "short_tokens")
        .when(mean_len > max_mean_token_len, "long_tokens")
        .otherwise("ok")
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_uniq_ratio: float = 0.3,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """C4/Gopher-style keep/drop: length bounds, repetition (uniq ratio),
    gibberish (mean token length) — emitted as a ``keep`` flag plus the
    failing-rule tag so filter efficacy is auditable."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    mean_len = F.length(F.regexp_replace(text, " ", "")) / n
    reason = quality_reason_expr(
        text,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_uniq_ratio=min_uniq_ratio,
        min_mean_token_len=min_mean_token_len,
        max_mean_token_len=max_mean_token_len,
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(mean_len, 4).alias("mean_token_len"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def pack_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    num_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-shard packing: assign every document a deterministic global
    byte/token offset and a fixed-token-budget shard id — the step that
    turns a filtered corpus into the fixed-size training files a data
    loader streams.

    Deterministic WITHOUT a global sort: docs hash into ``num_buckets``
    ordered buckets; a window cumsum WITHIN each bucket runs in parallel
    (one shuffle, each partition sorts only its bucket); per-bucket totals
    (``num_buckets`` rows) roll into exclusive prefix offsets and broadcast
    back. global_offset = bucket_offset + within_bucket_cumsum − n_tokens;
    shard = global_offset // budget. The result is identical on any
    cluster size or engine — same property as ``hash_sample``'s
    determinism, applied to ordering. (A single global window would give
    the same answer through ONE partition — the classic scale trap this
    construction avoids.)

    Shards fill to the budget boundary: a doc straddling a boundary goes
    to the shard its offset starts in (byte-offset packing, like WARC /
    tar sharding; the reference's WARC rotation-by-size —
    FileTimeSizeRotationPolicy.java:24 — is the same policy over bytes).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("shard|"), F.col(id_col).cast("string")))
    # null/empty text packs as 0 tokens (split would yield null / [''] and
    # poison the cumsum with nulls or phantom tokens)
    text = F.col(text_col)
    n_tok = F.when(
        text.isNull() | (text == ""), F.lit(0)
    ).otherwise(F.size(F.split(text, " ")))
    base = docs.select(
        F.col(id_col),
        h.alias("h"),
        F.conv(F.substring(h, 1, 4), 16, 10).cast("int").alias("hb"),
        n_tok.cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", F.pmod(F.col("hb"), F.lit(num_buckets)).cast("int"))

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_in_bucket", F.sum("n_tokens").over(w_in))

    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btot"))
        .withColumn("bucket_offset", F.sum("btot").over(w_off) - F.col("btot"))
        .select("bucket", "bucket_offset")
    )

    start = F.col("bucket_offset") + F.col("cum_in_bucket") - F.col("n_tokens")
    return (
        cum.join(F.broadcast(offsets), "bucket")
        .select(
            id_col,
            F.col("bucket"),
            "n_tokens",
            start.alias("global_offset"),
            F.floor(start / F.lit(tokens_per_shard)).cast("bigint").alias("shard_id"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    salt: str = "strat",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quota sampling: the ``n_per_stratum`` docs with the
    smallest salted hash within each stratum — deterministic (same sample on
    any engine/cluster/run) and exact (unlike Bernoulli ``hash_sample``,
    which only hits the quota in expectation). One window shuffle,
    partitioned by stratum; stratum skew splits under AQE.

    The corpus-assembly use: balanced per-language / per-source subsets
    (eval slices, mixture audits) where "about n" isn't good enough.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight: Column | None = None,
    salt: str = "wsample",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass weighted sampling WITHOUT replacement via Sequential
    Poisson / priority sampling (Ohlsson 1998; Duffield-Lund-Thorup 2007):
    each row draws a uniform u and the k smallest ``u / weight`` win, so
    inclusion odds are ≈ proportional to weight — the corpus-assembly
    primitive for quality-weighted subset selection, where Bernoulli
    ``hash_sample`` can't hit an exact k and per-stratum quotas ignore
    weights.

    Determinism & engine portability: u is the first 13 md5 hex digits of
    (salt|id) — 52 bits, exactly representable in a double — and weight is
    an integer, so the ONLY floating-point operation is a single IEEE-754
    division, which is exactly rounded on every engine. DuckDB therefore
    reproduces bit-identical priorities and the identical sample; the
    priority order is additionally tie-broken by id so even a colliding
    division result can't make the cut nondeterministic.

    Plan: pure per-row projection + global top-k — Spark compiles
    ``orderBy(...).limit(k)`` to TakeOrderedAndProject (per-partition heap
    of k, driver merges k·P candidates). No shuffle, no full sort; at
    100 TB the cost is one scan.

    Returns (id, weight, sample_rank) for the k winners, rank 1 = first
    picked. ``weight`` defaults to the document's character length
    (≥ 1) — the usual proxy when sampling token budgets.
    """
    from pyspark.sql import Window

    if weight is None:
        weight = F.greatest(F.length(F.col("text")), F.lit(1))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    pri = u.cast("double") / weight.cast("double")
    return (
        docs.select(
            F.col(id_col),
            weight.cast("bigint").alias("weight"),
            pri.alias("__priority"),
        )
        .orderBy(F.col("__priority").asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "weight",
            F.row_number()
            .over(
                Window.orderBy(F.col("__priority").asc(), F.col(id_col).asc())
            )
            .cast("bigint")
            .alias("sample_rank"),
        )
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the k most frequent BPE-ish pretokens with
    counts and corpus share — the first diagnostic of any tokenizer/corpus
    pairing (and the seed statistic for BPE merge induction).

    One explode + partial-aggregable count + global top-k
    (TakeOrderedAndProject — no full sort); ties break lexicographically
    so the cut is deterministic.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0)
    counts = (
        docs.select(F.explode(pieces).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def bpe_pair_merges(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The BPE-training merge statistic: corpus-wide adjacent symbol-pair
    frequencies over the pretoken vocabulary — the quantity whose argmax IS
    the next BPE merge (Sennrich et al. 2016). Returns the top-k candidate
    merges with their weighted counts.

    Plan shape for 100 TB: pretokens aggregate FIRST (the vocabulary is
    tiny relative to the corpus — millions of types vs trillions of
    tokens), then pairs explode from the VOCAB, not the corpus: the
    expensive per-character explode runs over |vocab| rows weighted by
    count, never over the corpus itself. Both aggregations are partial
    (map-side combine); the top-k is TakeOrderedAndProject.

    One training iteration is this statistic; iterating merges rewrites
    symbol sequences (inherently sequential) and belongs in a driver loop
    over this operator — each step is one cheap vocab-sized job.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0)
    vocab = (
        docs.select(F.explode(pieces).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # adjacent symbol pairs of a token = its 2-char substrings
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("token") - 1),
            lambda i: F.col("token").substr(i, F.lit(2)),
        )
    )
    return (
        vocab.where(F.length("token") >= 2)
        .select(pair.alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document distinctive terms: tf-idf over whitespace tokens, top-n
    per doc (ties broken lexicographically) — the classic keyword/topic
    signal a corpus report attaches to each document (and the anchor-text
    relevance model of search indexing, AbstractIndexerBolt's field
    surface).

    Scale shape: document frequencies aggregate partial-map-side over
    (doc, term) distincts; the tiny term→df table broadcasts back onto the
    exploded corpus, so the corpus shuffles ONCE on (doc_id) for the
    per-doc top-n window. idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn
    convention) — engine-portable arithmetic.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_n)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("tfidf", 4).alias("tfidf"),
            "rank",
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap — the
    segmentation step before embedding (RAG indexing) or sequence packing
    (training). Deterministic: chunk i starts at token 1 + i·stride,
    stride = chunk_tokens − overlap; the tail chunk may be short.

    Pure projection + explode (no shuffle, no UDF): the chunker rides
    along any corpus scan, and the ~chunk_tokens/stride row amplification
    is the only cost — exactly what a 100 TB chunking pass must be.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    piece = F.slice(F.col("__toks"), F.col("start"), chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start_token"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap perplexity proxy of CCNet-style quality
    filtering (docs whose tokens are globally rare score low; boilerplate
    scores high). Two partial-aggregable passes: corpus term counts, then
    a join back onto the exploded corpus and a per-doc mean.

    Scale: the unigram table is vocabulary-sized; Spark broadcasts it when
    it fits and AQE falls back to a shuffled hash join when it doesn't —
    both fine, the corpus shuffles at most once on (doc_id) for the mean.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "term", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    return (
        toks.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "avg_logprob",
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    iterations: int = 4,
    a_col: str = "doc1",
    b_col: str = "doc2",
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: min-label propagation over the
    similarity graph for a fixed iteration count; the cluster id is the
    smallest doc_id reachable (= the keeper). Pairs from any dedup family
    (exact groups, MinHash-LSH candidates, SimHash hamming pairs) feed in.

    Fixed iterations keep it oracle-checkable (unrolled CTEs); components
    here are near-dup chains whose diameter is tiny, so 4 hops converge.
    At web scale swap in the alternating large/small-star algorithm —
    same contract.
    """
    # Truncate the pair-generation lineage BEFORE symmetrizing: the union's
    # two branches are separate subtrees, so without this the (possibly
    # expensive — e.g. shingle self-join) pairs plan executes twice just to
    # build the edge list (measured ~2× on the ngram-fed cluster query).
    edges = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint(eager=False)
    # undirected; cached — every iteration joins it, and without the cache
    # each pass would replay the edge union
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    nodes = sym.select(F.col("a").alias("node")).distinct().cache()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster")
    )


def persist_candidate_pairs(pairs: DataFrame, path: str) -> None:
    """Materialize a dedup candidate-pair table (doc1, doc2, ...) for
    downstream cluster resolution — at 100 TB the pair table is produced
    ONCE by the (expensive) candidate-generation pass and every consumer
    (cluster resolution, keeper selection, audit sampling) reads the
    stored table instead of replaying the shingle/signature self-join.
    Written partitioned by ``crc32(doc1) % 64`` so the cluster stage's
    edge scan parallelizes without a shuffle-for-layout step and a single
    hot doc1 cannot skew one file."""
    (
        pairs.withColumn(
            "bucket", F.crc32(F.col("doc1").cast("string")) % 64
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def load_candidate_pairs(spark, path: str) -> DataFrame:
    """Read a pair table written by ``persist_candidate_pairs`` (drops the
    layout-only bucket column)."""
    return spark.read.parquet(path).drop("bucket")


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥min_hits
    word n-grams with an evaluation set — the standard pre-training hygiene
    pass (GPT-3 used 13-gram overlap; n is a knob because tokenization
    differs).

    Scale shape: the eval side is tiny (benchmarks are thousands of docs)
    → its distinct n-grams broadcast; the corpus side explodes to
    (doc_id, shingle) and inner-joins the broadcast, so the corpus is
    touched in ONE pass with no corpus-side shuffle before the per-doc
    hit count (partial-aggregable groupBy). Returns every corpus doc with
    its hit count and verdict; downstream drops ``contaminated`` rows.
    """
    from incubator_stormcrawler_spark.operators.dedup import with_shingles

    eval_ngrams = (
        with_shingles(eval_docs, n, text_col=text_col, distinct=False)
        .select("shingle")
        .distinct()
    )
    hits = (
        with_shingles(docs, n, text_col=text_col, distinct=True)
        .join(F.broadcast(eval_ngrams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_ngrams"), F.lit(0))
            .cast("bigint")
            .alias("n_hit_ngrams"),
            (F.coalesce(F.col("n_hit_ngrams"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def repetition_metrics(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition: fraction of n-gram
    occurrences belonging to duplicated n-grams, and the share taken by the
    single most frequent n-gram (Rae et al. 2021 §A1.1 "repetition
    signals"; docs past the thresholds are boilerplate/spam).

    One explode + one (doc, gram) count + one per-doc aggregate — every
    groupBy partial-aggregates map-side, and the (doc_id, shingle) count
    feeds the doc-level rollup without a second scan of the text.
    """
    from incubator_stormcrawler_spark.operators.dedup import with_shingles

    gram_counts = (
        with_shingles(docs, n, text_col=text_col, distinct=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = gram_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_occurrences"
        ),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("total"), F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.round(
                F.coalesce(F.col("dup_occurrences") / F.col("total"), F.lit(0.0)), 4
            ).alias("dup_ngram_frac"),
            F.round(
                F.coalesce(F.col("top_cnt") / F.col("total"), F.lit(0.0)), 4
            ).alias("top_ngram_frac"),
        )
    )


def segment_dedup(
    docs: DataFrame,
    segment_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Paragraph-level exact dedup, first occurrence wins — the CCNet /
    RefinedWeb line-dedup pass. Real web corpora split on newlines; this
    corpus carries none, so segmentation is fixed-token (chunk_documents
    with overlap=0) and the unit of dedup is the segment. A segment that
    appears anywhere earlier in (doc_id, chunk_idx) order is dropped
    corpus-wide; output is the surviving segments.

    Plan: the chunker rides the scan (pure explode, no shuffle), then TWO
    hash-partitioned-on-md5 shuffles: a partial-aggregable groupBy picks
    each hash's keeper (min struct(doc_id, chunk_idx)) and a join back on
    the hash marks survivors. Boilerplate-heavy corpora concentrate
    duplicates INTO one hash, but min() partial-aggregates map-side, so a
    hot segment costs one row per map task — no hot reducer; the join-back
    side is the corpus itself, uniformly hashed. That is the 100 TB shape:
    nothing quadratic, nothing driver-side, both shuffle keys uniform.

    ``hash_fn``: md5 (default) keeps the segment hash DuckDB-replayable
    for the oracle; ``xxhash64`` swaps in Spark's codegen hash (same knob
    as the sketch family and substring_dedup — the segment hash is only
    ever compared for equality, so any collision-resistant hash yields
    the identical survivor set; parity-tested). Honest measurement (r9,
    800k docs × 64 tokens, 32-token segments, warmed best-of-3):
    2.35 s md5 vs 2.22 s xxhash64 — 1.06×, i.e. ~parity: like substring
    dedup this operator is bound by the two segment-stream shuffles, not
    the hash; the knob exists for interface consistency across the
    dedup family.
    """
    warn_if_plan_time_broadcast(docs.sparkSession)
    segs = chunk_documents(
        docs,
        chunk_tokens=segment_tokens,
        overlap=0,
        text_col=text_col,
        id_col=id_col,
    ).withColumn(
        "__h",
        F.md5(F.col("chunk_text"))
        if hash_fn == "md5"
        else F.xxhash64(F.col("chunk_text")),
    )
    keeper = segs.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("__k")
    )
    # Unhinted since the r13 broadcast policy (session.py): plan-time
    # auto-broadcast is off engine-wide, so the corpus-sized keeper
    # aggregate can no longer broadcast off its garbage plan-time
    # estimate; AQE keeps the join-back linear (and skew-splittable on a
    # hot boilerplate segment) unless the keeper is measured small.
    return (
        segs.join(keeper, "__h")
        .where(
            (F.col(id_col) == F.col(f"__k.{id_col}"))
            & (F.col("chunk_idx") == F.col("__k.chunk_idx"))
        )
        .select(id_col, "chunk_idx", "chunk_text")
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.8,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    trained on the corpus itself — one step up the CCNet quality ladder
    from ``unigram_logprob``: P(w2|w1) = lam·c(w1,w2)/c(w1·) +
    (1−lam)·c(w2)/N. Repetitive/boilerplate docs score high, incoherent
    token soup scores low, and unlike the unigram proxy this catches
    WORD-ORDER damage (shuffled text keeps its unigram score, loses its
    bigram score).

    Scale: all three count tables (bigram vocab, left-context counts,
    unigram vocab) are vocabulary-sized and partial-aggregable; Spark
    broadcasts them when they fit and AQE shuffles otherwise. The corpus
    stream shuffles once on (doc_id) for the final mean — the same shape
    as unigram_logprob, one extra vocab-sized join. Docs with fewer than
    two tokens have no bigrams and drop out (both engines agree).
    """
    toks_arr = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks_arr.alias("__toks")).where(
        F.size("__toks") >= 2
    )
    bg = (
        base.select(
            F.col(id_col),
            F.col("__toks"),
            # size >= 2 is guaranteed above, so the sequence never inverts
            F.explode(
                F.sequence(F.lit(1), F.size("__toks") - 1)
            ).alias("__i"),
        )
        .select(
            F.col(id_col),
            F.element_at("__toks", F.col("__i")).alias("w1"),
            F.element_at("__toks", F.col("__i") + 1).alias("w2"),
        )
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = (
        docs.select(F.explode(toks_arr).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = uni.agg(F.sum("cu").alias("total"))
    model = (
        c12.join(c1, "w1")
        .join(uni.withColumnRenamed("term", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.log(
                F.lit(lam) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - lam) * F.col("cu") / F.col("total")
            ).alias("logp"),
        )
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            "avg_logprob",
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k document search for a bag of query terms — the
    relevance scoring the reference delegates to its search backends
    (OpenSearch/Solr indexers, external/opensearch/.../IndexerBolt.java),
    expressed natively so the corpus table IS the index. idf uses the
    standard Robertson–Sparck Jones form with +1 flooring
    (ln((N − df + 0.5)/(df + 0.5) + 1), Lucene's non-negative variant).

    Scale: the query-term list is a literal broadcast into the scan
    predicate; tf/doclen are one partial-aggregable pass over the exploded
    matching tokens only (array_intersect pre-filters docs, so untouched
    documents never explode); df is vocabulary-row-sized. One shuffle on
    (doc_id), one TakeOrderedAndProject for the top-k — no global sort.
    """
    qarr = F.array(*[F.lit(t) for t in query_terms])
    toks = F.split(F.col(text_col), " ")
    # doc length from the array (no explode); only docs hitting >= 1 query
    # term continue to the tf explode
    cand = docs.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("dl")
    ).where(F.size(F.array_intersect(toks, qarr)) > 0)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    tf = (
        cand.select(F.col(id_col), "dl", F.explode("__toks").alias("term"))
        .where(F.array_contains(qarr, F.col("term")))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("w"), 4).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )
    from pyspark.sql import Window

    # global top-k via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-k, no single-partition window over the full match set);
    # the rank window then runs over k rows only
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(id_col, "score", "n_terms_hit", "rank")
    )


def inverted_postings(
    docs: DataFrame,
    max_terms: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index posting lists for the ``max_terms`` highest-df
    terms: term → df, total tf, and the doc_id-sorted posting list
    '(doc:tf,...)' — the native-build counterpart of shipping documents to
    an external search indexer (SURVEY §2.9).

    Scale: tf pairs are one partial-aggregable groupBy; the per-term
    posting assembly is collect_list + array_sort INSIDE a term-keyed
    aggregate — each task materializes single-term lists, so memory is
    bounded by the largest posting list (at true web scale, postings
    chunk by doc-range before collect; documented swap point). Term
    selection is TakeOrderedAndProject, no global sort.
    """
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(id_col), "tf"))),
                lambda s: F.concat_ws(":", s[id_col].cast("string"),
                                      s["tf"].cast("string")),
            ),
        ).alias("postings"),
    )
    from pyspark.sql import Window

    # same TakeOrderedAndProject-then-stamp-rank shape as bm25_search:
    # the vocabulary never sorts globally, only the max_terms head does
    top = agg.orderBy(F.col("df").desc(), F.col("term")).limit(max_terms)
    w = Window.orderBy(F.col("df").desc(), F.col("term"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("term", "df", "total_tf", "postings", "rank")
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "tmix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual/multi-source
    rebalancing rule of XLM-R / mT5 corpus assembly): target share of
    source s ∝ (token_share_s)^alpha, alpha < 1 upsampling low-resource
    sources. Downsample-only: per-source keep rate ∝ share^(alpha−1),
    normalized so the most-upweighted source keeps everything; docs are
    kept by the same deterministic md5 bucket as ``hash_sample`` so the
    mixture is reproducible across engines and reshards.

    Two tiny aggregates (per-source token sums — partial-aggregable, one
    row per source) and one broadcast join back; the corpus is never
    shuffled, though THIS reporting operator scans it twice (once for
    the rate aggregate, once for the kept counts) — a production mixing
    pass fuses the second scan's broadcast-rate filter into the
    downstream write instead of counting. Rates round to 6 decimals BEFORE the
    threshold compare so pow()'s ulp-level engine differences cannot
    flip a keep decision. Returns the per-source mixing report (the
    audit artifact a mixing pass must emit); the kept docs are the same
    filter applied to the corpus (see tests).
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    # a zero-token source would hit pow(0, alpha-1) = Infinity and a NaN
    # rate, whose comparison semantics DIFFER between engines (DuckDB
    # sorts NaN high) — exclude it up front: it contributes nothing to
    # the mixture by definition. Mirrored in the oracle.
    ).where(F.col("n_tokens") > 0)
    # truncate lineage: `total` and `rated` both consume per_src, and
    # without this the corpus-wide token aggregate executes twice
    per_src = per_src.localCheckpoint(eager=False)
    total = per_src.agg(F.sum("n_tokens").alias("total_tokens"))
    rated = (
        per_src.join(F.broadcast(total))
        .withColumn("share", F.col("n_tokens") / F.col("total_tokens"))
        .withColumn("w", F.pow(F.col("share"), F.lit(alpha - 1.0)))
    )
    wmax = rated.agg(F.max("w").alias("wmax"))
    rates = (
        rated.join(F.broadcast(wmax))
        .withColumn("rate", F.round(F.col("w") / F.col("wmax"), 6))
        .select("source", "n_docs", "n_tokens",
                F.round("share", 6).alias("share"), "rate")
    )
    kept = (
        docs.select(F.col(source_col).alias("source"), F.col(id_col),
                    hash_bucket_expr(salt, id_col).alias("__b"))
        .join(F.broadcast(rates.select("source", "rate")), "source")
        .where(F.col("__b") < F.floor(F.col("rate") * 65536 + 0.5))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source", "n_docs", "n_tokens", "share", "rate",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int = 8,
    bucket_bits: int = 6,
    text_col: str = "text",
    num_shards: int = 1,
) -> DataFrame:
    """Length-bucketed batching: group documents of similar token counts
    into fixed-size batches so padding waste inside a batch is bounded —
    the batch-assembly step between packing and the training loader.
    Bucket = n_tokens >> bucket_bits (64-token ranges by default); within
    a bucket, docs order by (n_tokens, doc_id) and chop into batches of
    ``batch_size``.

    One shuffle (the per-bucket window). Bucket cardinality is small, so
    at 100 TB a single bucket would be a hot window partition: pass
    ``num_shards > 1`` to salt the window key with a deterministic
    doc-hash shard — batches then never cross shards, the window
    parallelizes freely, and expected padding waste is unchanged (each
    shard still sorts by length). num_shards=1 keeps the output
    oracle-comparable; the sharded path is property-tested instead.
    """
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    base = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.shiftright(n_tok, bucket_bits).alias("bucket"),
    )
    if num_shards > 1:
        base = base.withColumn(
            "shard",
            (F.crc32(F.col("doc_id").cast("string")) % num_shards)
            .cast("int"),
        )
        w = Window.partitionBy("bucket", "shard").orderBy(
            "n_tokens", "doc_id"
        )
    else:
        base = base.withColumn("shard", F.lit(0))
        w = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    return base.select(
        "doc_id",
        "n_tokens",
        F.col("bucket").cast("bigint").alias("bucket"),
        "shard",
        ((F.row_number().over(w) - 1) / batch_size).cast("bigint")
        .alias("batch_in_bucket"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Per-document coverage of the corpus's own top-``vocab_size``
    vocabulary: the OOV-rate quality signal (tokenizer fit, gibberish
    detection). Vocabulary = top tokens by count (count desc, token asc
    ties); per-doc coverage counts token OCCURRENCES inside the vocab.

    The vocab is vocab_size rows — broadcast into the token stream, so
    the corpus explode joins without a shuffle and collapses straight
    back to one row per doc (partial-aggregable)."""
    # truncate lineage: the vocab aggregate AND the coverage join both
    # consume `tok` — without this the corpus explode executes twice
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "").localCheckpoint(eager=False)
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
    )
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    in_vocab = (
        tok.join(F.broadcast(vocab), "token", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_in_vocab"))
    )
    return (
        docs.select("doc_id", n_tok.alias("n_words"))
        .join(in_vocab, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce(F.col("n_in_vocab"), F.lit(0)).cast("bigint")
            .alias("n_in_vocab"),
            F.round(
                F.coalesce(F.col("n_in_vocab"), F.lit(0))
                / F.greatest(F.col("n_words"), F.lit(1)),
                4,
            ).alias("coverage"),
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merges to text — the encode half of the tokenizer
    story (``bpe_pair_merges`` is the training statistic). Classic
    algorithm (Sennrich 2016 / GPT-2): whitespace-pretokenize, split each
    word to characters, repeatedly merge the lowest-rank adjacent pair
    until none applies.

    Iterative merging is not SQL-expressible, so this is a deliberate
    Pandas-UDF stage (Arrow-batched, the sanctioned slow path): merges
    ship to executors once via closure (rank dict, broadcast-sized), and a
    per-batch word cache collapses the Zipf head — each DISTINCT word in a
    batch is encoded once, so throughput tracks unique-word count, not
    token count. Returns (doc_id, n_words, n_pieces, pieces_fp) — the
    fingerprint value-checks batch-shape refactors in tests.
    """
    import hashlib as _hashlib

    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        pieces = list(word)
        while len(pieces) > 1:
            best_i, best_r = -1, None
            for i in range(len(pieces) - 1):
                r = ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            pieces[best_i: best_i + 2] = [
                pieces[best_i] + pieces[best_i + 1]
            ]
        cache[word] = pieces
        return pieces

    @pandas_udf("struct<n_words: bigint, n_pieces: bigint, pieces_fp: string>")
    def enc(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        rows = []
        for t in texts:
            if t is None:
                rows.append((0, 0, ""))
                continue
            words = [w for w in t.split(" ") if w]
            out: list[str] = []
            for w in words:
                out.extend(encode_word(w, cache))
            fp = _hashlib.md5("\x01".join(out).encode()).hexdigest()
            rows.append((len(words), len(out), fp))
        return pd.DataFrame(rows, columns=["n_words", "n_pieces", "pieces_fp"])

    return docs.select(
        "doc_id", enc(F.col(text_col)).alias("__e")
    ).select("doc_id", "__e.n_words", "__e.n_pieces", "__e.pieces_fp")


def star_contraction_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    a_col: str = "doc1",
    b_col: str = "doc2",
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the WEB-SCALE replacement for
    ``dedup_clusters``'s fixed-iteration label propagation: converges in
    O(log² n) rounds on ANY component diameter (label propagation needs
    diameter-many rounds, unbounded on long near-dup chains), and every
    round is one groupBy + one join on uniform keys.

    large-star: every neighbor v > u re-attaches to m = min(Γ⁺(u));
    small-star: every neighbor v ≤ u (plus u) attaches to m. Both keep
    the components invariant; alternating them contracts every tree to a
    star. Terminates when the edge set is stable (checked on a count
    that rides the same job as the iteration's checkpoint — no extra
    pass). Returns (doc_id, cluster) with cluster = the component's
    minimum id, identical contract to ``dedup_clusters``.
    """
    # Canonicalize ONCE and checkpoint BEFORE deriving nodes and the
    # working edge set: both consumers otherwise replay the (possibly
    # expensive — shingle self-join) pair-generation lineage; measured 2×
    # on the jaccard-fed query at sf0.1. Ids keep their NATIVE type —
    # least/greatest/min work for any orderable type (string fingerprints
    # included), preserving the drop-in dedup_clusters contract.
    raw = pairs.select(
        F.least(F.col(a_col), F.col(b_col)).alias("a"),
        F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
    )
    # working edge list: self-loops dropped (their nodes stay in `nodes`
    # and label themselves at the end)
    e = raw.where(F.col("a") != F.col("b"))

    def star(e: DataFrame, large: bool) -> DataFrame:
        # neighborhoods over SYMMETRIC orientation; m = min(Γ(u) ∪ {u}).
        # No distinct here — duplicate edges don't change any min and the
        # double-round dedupes once at its checkpoint (one fewer shuffle
        # per star pass).
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        j = sym.join(m, "a")
        if large:
            out = j.where(F.col("b") > F.col("a")).select(
                F.col("b").alias("x"), F.col("m").alias("y")
            )
        else:
            out = j.where(F.col("b") <= F.col("a")).select(
                F.col("b").alias("x"), F.col("m").alias("y")
            ).union(m.select(F.col("a").alias("x"), F.col("m").alias("y")))
        return out.where(F.col("x") != F.col("y")).select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )

    def sig(df: DataFrame) -> tuple:
        # Convergence fingerprint in ONE tiny aggregate: (edge count,
        # XOR of per-edge xxhash64). Equal edge sets always agree;
        # distinct sets collide with probability ~2^-64 per check (a
        # false 'converged' needs a 64-bit xor collision at matching
        # counts — negligible, and type-agnostic where an id-sum test
        # would require non-negative numeric ids). Replaces a count +
        # exceptAll comparison (two jobs, one a full shuffle) per round.
        r = df.select(
            F.xxhash64(F.col("a"), F.col("b")).alias("hx")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(hx)").alias("x"),
        ).collect()[0]
        return (r[0], r[1])

    prev = None
    converged = False
    for _ in range(max_iterations):
        # lazy checkpoint: sig()'s collect (immediately below) is the
        # action that materializes the round, so each double-round runs
        # ONE job instead of checkpoint-job + sig-job (r14, the same
        # fusion as linkrank._local_checkpoint_tracked; lineage is
        # truncated at call time either way)
        e2 = (
            star(star(e, large=True), large=False)
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = sig(e2)
        e = e2
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged and max_iterations > 0:
        # a non-star edge set would yield silently WRONG labels below —
        # fail loudly instead (O(log² n) rounds converge any real graph;
        # exhausting 20 double-rounds means something is pathological)
        raise RuntimeError(
            f"star contraction did not converge in {max_iterations} "
            f"double-rounds ({e.count()} edges remain)"
        )
    roots = e.groupBy(F.col("b").alias("node")).agg(
        F.min("a").alias("cluster")
    )
    # after contraction every non-root node has exactly one edge to its
    # component min; roots (and isolated nodes) label themselves
    return (
        nodes.join(roots, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("cluster"), F.col("node")).alias("cluster"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    num_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out as one
    deterministic token stream (``pack_shards``'s bucketed-cumsum global
    offsets — no global sort) and cut it into fixed ``seq_len`` training
    sequences. Per doc: the first/last sequence it lands in, how many
    sequences it spans, and its offset within the first — everything a
    loader needs to materialize sequence k by range-scanning docs with
    first_seq ≤ k ≤ last_seq (an offset-range predicate that prunes on
    the shard/offset layout at 100 TB).

    Empty docs (0 tokens) occupy no stream positions: they report their
    insertion point (first_seq = the sequence their offset falls in) and
    span 0 sequences (last_seq = first_seq − 1 convention would be odd;
    they emit n_seqs = 0 and last_seq = first_seq so range scans skip
    them by the n_seqs > 0 predicate).
    """
    packed = pack_shards(
        docs, tokens_per_shard=seq_len, num_buckets=num_buckets,
        text_col=text_col, id_col=id_col,
    )
    start = F.col("global_offset")
    end = start + F.col("n_tokens")  # exclusive
    first_seq = F.floor(start / F.lit(seq_len)).cast("bigint")
    # last sequence touched = floor((end-1)/seq_len) for non-empty docs
    last_seq = F.when(
        F.col("n_tokens") > 0,
        F.floor((end - 1) / F.lit(seq_len)).cast("bigint"),
    ).otherwise(first_seq)
    return packed.select(
        id_col,
        "n_tokens",
        "global_offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1)
        .otherwise(F.lit(0)).cast("bigint").alias("n_seqs"),
        (start - first_seq * seq_len).cast("bigint").alias("offset_in_seq"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog cardinality sketch — DETERMINISTIC variant (md5 hashing +
# an integer CASE-chain rho), so unlike approx_count_distinct the DuckDB
# oracle can rebuild the registers AND the estimate bit-for-bit. The
# point at 100 TB is mergeability: registers are a (group, bucket, max
# rho) table built in ONE partial-aggregable pass — shards sketch
# independently, merge = max per register, and the union's cardinality
# estimate needs no re-scan (the same reason Spark's own
# approx_count_distinct is an HLL++ under the hood; this one trades its
# bias corrections for cross-engine exactness of the pipeline).
# ---------------------------------------------------------------------------

def hll_rho_sql(col: str, max_rho: int = 24) -> str:
    """Integer rho(w): index of the lowest set bit + 1 (capped), as a CASE
    chain both engines evaluate identically — no float log2, whose
    cross-engine rounding could differ."""
    cases = " ".join(
        f"WHEN {col} % {2 ** (i + 1)} = {2 ** i} THEN {i + 1}"
        for i in range(max_rho)
    )
    return f"(CASE WHEN {col} % {2 ** max_rho} = 0 THEN {max_rho + 1} {cases} END)"


def hash48_sql(value_expr: str, hash_fn: str = "md5") -> str:
    """48-bit non-negative hash expression for the sketch family.

    ``md5`` (default) is the ORACLE mode: DuckDB replays
    conv(substring(md5(x),1,12),16,10) bit-for-bit, which is what makes
    every sketch driver-checkable. ``xxhash64`` is the PRODUCTION mode:
    Spark's native 64-bit hash stays inside whole-stage codegen with no
    hex string round-trip — the right call on a 100 TB value stream
    where the oracle isn't in the loop (masked to the same non-negative
    48-bit domain so bucket/rho math is unchanged). Same minwise/HLL
    guarantees either way; only cross-engine replayability differs."""
    if hash_fn == "md5":
        return f"cast(conv(substring(md5({value_expr}), 1, 12), 16, 10) as bigint)"
    if hash_fn == "xxhash64":
        return f"(xxhash64({value_expr}) & 281474976710655)"
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def hll_registers(
    df: DataFrame, group_col: str, value_expr: str, m: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """(group, bucket, M) register table: bucket = low bits of the 48-bit
    hash, M = max rho of the remaining bits. Partial-aggregable;
    merge two sketches with groupBy(group, bucket).max(M). ``hash_fn``:
    md5 = oracle-replayable (default), xxhash64 = codegen production
    path (see hash48_sql)."""
    h = hash48_sql(value_expr, hash_fn)
    return (
        df.selectExpr(
            f"{group_col} as grp",
            f"({h}) % {m} as bucket",
            hll_rho_sql(f"({h}) div {m}") + " as rho",
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("M"))
    )


def merge_hll_registers(stored: DataFrame, new: DataFrame) -> DataFrame:
    """Fold a new generation's (grp, bucket, M) registers into a stored
    sketch: max per (grp, bucket) — HLL's defining merge. Same
    operational contract as ``merge_shard_signatures``: max is
    associative/commutative/idempotent, so per-generation register
    tables (groups × m rows) accumulate without ever re-scanning a
    corpus, and a replayed generation is a no-op."""
    return (
        stored.unionByName(new)
        .groupBy("grp", "bucket")
        .agg(F.max("M").alias("M"))
    )


def _hll_estimate_by(
    registers: DataFrame, group_cols: list, m: int, out_col: str
) -> DataFrame:
    """Shared raw-HLL estimator over any grouping of a register relation —
    the single-group and pairwise-union paths both route here so the
    estimator math cannot drift between them."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    return (
        registers.groupBy(*group_cols)
        .agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("M")))
                + (F.lit(m) - F.count(F.lit(1)))
            ).alias("inv_sum")
        )
        .select(
            *group_cols,
            F.round(
                F.lit(alpha) * F.lit(float(m * m)) / F.col("inv_sum"), 4
            ).alias(out_col),
        )
    )


def hll_estimate(registers: DataFrame, m: int = 64) -> DataFrame:
    """(grp, est_distinct) from a register table. Raw HLL estimator
    alpha_m * m^2 / sum(2^-M_j) with absent registers counting 2^0 = 1;
    every 2^-M term is a dyadic rational, so the sum is EXACT in double
    and the single rounded division is cross-engine stable."""
    return _hll_estimate_by(registers, ["grp"], m, "est_distinct")


def hll_overlap_pairs(
    registers: DataFrame, m: int = 64, materialize: bool = True
) -> DataFrame:
    """(grp_a, grp_b, est_a, est_b, est_union, est_intersection) for every
    unordered pair of groups in a (grp, bucket, M) register table —
    overlap by inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    where the UNION's registers are the elementwise max of the two
    groups' registers (HLL's defining merge property: max per bucket IS
    the sketch of the union — no data re-scan, ever).

    The answer to "how many bigrams/URLs/tokens do crawl N and crawl N−1
    share" at 100 TB: every stage below runs in sketch space —
    num_groups² pair rows, ≤ m registers per group — so cost is
    independent of corpus size once the one partial-aggregable
    ``hll_registers`` pass has run. The pair frame and the member
    explode are broadcast (group-cardinality sides by construction).
    Inclusion–exclusion can go slightly negative on near-disjoint sets
    (two independent ±~1.04/√m estimates subtract); clamped at 0, like
    every practical theta/HLL intersection estimator.

    ``materialize`` (default on) localCheckpoints the register table
    before the fan-out: the pair/est/union stages reference it FIVE
    times, and the STATIC plan replays the full upstream lineage (the
    corpus scan!) per reference — 5 parquet scans, zero ReusedExchange
    nodes. At runtime AQE's shuffle-stage reuse recovers most of those
    replays when the subplans hash identically (measured: the 5-scan
    plan ran ≈ one register pass + pair work), but that recovery is
    adaptive, not guaranteed — any projection drift between references,
    or AQE off, re-runs the corpus pass up to 5×. The register relation
    is sketch-sized (num_groups × m rows), so eager materialization
    makes ONE register pass structural, the same per-generation pattern
    as streaming/crawl_loop.py. Pass False only when the caller
    materializes (or needs a pure-lazy plan, e.g. plan tests over an
    in-memory frame).
    """
    if materialize:
        registers = registers.localCheckpoint(eager=True)
    grps = registers.select("grp").distinct()
    pairs = F.broadcast(
        grps.select(F.col("grp").alias("grp_a"))
    ).join(
        grps.select(F.col("grp").alias("grp_b")),
        F.col("grp_a") < F.col("grp_b"),
    )
    # one row per (pair, member): joins each pair to BOTH groups'
    # registers in a single equi-join, then max-merges per bucket
    members = pairs.select(
        "grp_a",
        "grp_b",
        F.explode(F.array("grp_a", "grp_b")).alias("grp"),
    )
    union_regs = (
        F.broadcast(members)
        .join(registers, "grp")
        .groupBy("grp_a", "grp_b", "bucket")
        .agg(F.max("M").alias("M"))
    )
    union_est = _hll_estimate_by(
        union_regs, ["grp_a", "grp_b"], m, "est_union"
    )
    ests = hll_estimate(registers, m)
    return (
        union_est.join(
            F.broadcast(
                ests.select(
                    F.col("grp").alias("grp_a"),
                    F.col("est_distinct").alias("est_a"),
                )
            ),
            "grp_a",
        )
        .join(
            F.broadcast(
                ests.select(
                    F.col("grp").alias("grp_b"),
                    F.col("est_distinct").alias("est_b"),
                )
            ),
            "grp_b",
        )
        .select(
            "grp_a",
            "grp_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                ),
                4,
            ).alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch — the point-query twin of the HLL above.
# Same deterministic-hash contract (md5 + integer bucket arithmetic) so
# the DuckDB oracle rebuilds the grid AND the estimates bit-for-bit, and
# the same 100 TB property: the grid is a (d, bucket, count) table built
# in ONE partial-aggregable pass, depth*width rows TOTAL regardless of
# corpus size — shards sketch independently, merge = SUM per cell, and a
# frequency estimate for any value needs only the broadcast grid, never a
# re-scan. est(v) = min_d grid[d][h_d(v)] >= true count always (hash
# collisions only ever inflate a cell). Storm-side analog: the metrics
# aggregations the reference pushes to its backends; sketch literature:
# Cormode & Muthukrishnan 2005.
# ---------------------------------------------------------------------------

def _cm_bucket_sql(
    value: str, d: str, width: int, hash_fn: str = "md5"
) -> str:
    """The shared probe: hash('cm'||d||':'||v) folded to 48 bits, mod
    width. md5 (default) has identical text semantics in Spark (conv)
    and DuckDB (0x cast), both verified by the registered oracle;
    xxhash64 is the codegen production mode (see hash48_sql)."""
    return (
        hash48_sql(f"concat('cm', {d}, ':', {value})", hash_fn)
        + f" % {width}"
    )


def countmin_table(
    df: DataFrame, value_expr: str, depth: int = 3, width: int = 128,
    hash_fn: str = "md5",
) -> DataFrame:
    """(d, bucket, c) Count-Min grid over every OCCURRENCE of
    ``value_expr``. One explode of the depth range (depth is 3-5; the
    map-side combine collapses to depth*width rows per partition before
    the single tiny shuffle). Merge two grids: union + sum per (d,
    bucket). ``hash_fn``: md5 = oracle-replayable (default), xxhash64 =
    codegen production path; estimates and grid point-queries must use
    the SAME mode."""
    rows = df.selectExpr(f"({value_expr}) as __v").where(
        F.col("__v").isNotNull()
    )
    probes = rows.select(
        F.col("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).selectExpr(
        "d", _cm_bucket_sql("__v", "d", width, hash_fn) + " as bucket"
    )
    return probes.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


def countmin_estimate(
    grid: DataFrame,
    values: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 128,
    hash_fn: str = "md5",
) -> DataFrame:
    """Point queries against a Count-Min grid: (value, est_count) with
    est_count = min over the depth probe rows. The grid is depth*width
    rows — ALWAYS broadcast; absent cells count 0 (value never sketched).
    """
    probes = values.select(F.col(value_col)).distinct().select(
        F.col(value_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).selectExpr(
        value_col, "d",
        _cm_bucket_sql(value_col, "d", width, hash_fn) + " as bucket"
    )
    return (
        probes.join(F.broadcast(grid), ["d", "bucket"], "left")
        .na.fill({"c": 0})
        .groupBy(value_col)
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    value_expr: str,
    min_count: int,
    depth: int = 3,
    width: int = 128,
    hash_fn: str = "md5",
) -> DataFrame:
    """EXACT heavy hitters — every value occurring >= ``min_count`` times,
    with its exact count — WITHOUT ever grouping the full stream by value.

    The naive ``groupBy(value).count()`` shuffles the entire stream on a
    mostly-distinct key (the long tail IS most of the rows — Zipf), which
    at 100 TB is the single biggest avoidable shuffle in a term-statistics
    pipeline. This operator exploits Count-Min's ONE-SIDED error
    (Cormode & Muthukrishnan 2005: estimates only ever OVER-count): pass 1
    builds the depth×width grid (partial-aggregable, grid-sized output);
    pass 2 re-scans the stream and keeps an occurrence only if its value's
    CM estimate min_d grid[d][h_d(v)] >= min_count — a pure map-side
    filter through ``depth`` BROADCAST joins (the grid is depth×width
    rows, always broadcastable). Every true heavy hitter survives
    (one-sided guarantee ⇒ no false negatives — property-tested); the
    survivors (true hitters + hash-collision stowaways) are the ONLY rows
    that reach the exact groupBy, whose final ``count >= min_count``
    filter evicts the stowaways. Result is EXACTLY the naive answer
    (equivalence-tested) with the shuffle shrunk from the full stream to
    the heavy tail.

    Sizing: undersize ``width`` below the distinct-value count and
    collisions admit more stowaways — correctness is unaffected, only the
    shuffle saving shrinks; ``width ~ distinct/10`` keeps the grid tiny
    while the Zipf head dominates cells. ``hash_fn`` follows the family
    contract: md5 = oracle-replayable default, xxhash64 = codegen
    production mode (same survivor set — the filter only needs SOME
    one-sided sketch).
    """
    rows = df.selectExpr(f"({value_expr}) as __v").where(
        F.col("__v").isNotNull()
    )
    grid = countmin_table(
        rows, "__v", depth=depth, width=width, hash_fn=hash_fn
    )
    probed = rows
    ests = []
    for d in range(depth):
        g = grid.where(F.col("d") == d).select(
            F.col("bucket").alias(f"__b{d}"), F.col("c").alias(f"__c{d}")
        )
        probed = probed.withColumn(
            f"__b{d}", F.expr(_cm_bucket_sql("__v", str(d), width, hash_fn))
        ).join(F.broadcast(g), f"__b{d}", "left")
        # an absent cell means the value was never sketched -> estimate 0
        ests.append(F.coalesce(F.col(f"__c{d}"), F.lit(0)))
    candidates = probed.where(F.least(*ests) >= F.lit(min_count))
    return (
        candidates.groupBy(F.col("__v").alias("value"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .where(F.col("n") >= F.lit(min_count))
    )


def heavy_hitters_sql(
    table_expr: str,
    min_count: int,
    depth: int = 3,
    width: int = 128,
) -> str:
    """DuckDB oracle for :func:`heavy_hitters` (md5 mode): replays the
    grid, the per-occurrence min-probe filter, and the exact survivor
    count. ``table_expr`` must yield one ``v`` column of occurrences."""
    probes = ", ".join(
        f"('0x' || substr(md5('cm' || '{d}' || ':' || v), 1, 12))::BIGINT"
        f" % {width} AS b{d}"
        for d in range(depth)
    )
    grid_joins = " ".join(
        f"LEFT JOIN grid g{d} ON g{d}.d = {d} AND g{d}.bucket = p.b{d}"
        for d in range(depth)
    )
    least = ", ".join(f"coalesce(g{d}.c, 0)" for d in range(depth))
    return f"""
WITH occ AS (SELECT v FROM ({table_expr}) WHERE v IS NOT NULL),
probes AS (
  SELECT v, d,
         ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || v),
                         1, 12))::BIGINT % {width} AS bucket
  FROM occ, unnest(generate_series(0, {depth - 1})) t(d)
),
grid AS (
  SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
  FROM probes GROUP BY 1, 2
),
cand AS (
  SELECT p.v FROM (SELECT v, {probes} FROM occ) p
  {grid_joins}
  WHERE least({least}) >= {min_count}
)
SELECT v AS value, CAST(count(*) AS BIGINT) AS n
FROM cand GROUP BY v HAVING count(*) >= {min_count}
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): pick raw-corpus documents
# whose hashed-ngram profile looks like a TARGET domain. Features are
# hashed word-bigram buckets; a doc's importance weight is the
# log-likelihood ratio log p_target(x)/p_raw(x) = sum over the doc's
# feature occurrences of log(ct_b')/log(cr_b') (add-one smoothed bucket
# counts; the corpus-wide normalizers shift every doc equally).
#
# Cross-engine exactness: the per-bucket log ratio is QUANTIZED to
# integer log2 magnitudes via a CASE-chain bit-length (same trick as
# hll_rho_sql — no float log whose last-ulp could differ between the JVM
# and DuckDB), so the per-doc accumulation is pure BIGINT arithmetic and
# order-independent; the only float op is one final division (score =
# weight / n_feats), rounded once. Production would use double logs —
# the PLAN is identical, only the ratio literal changes.
#
# 100 TB posture: one bigram explode (linear in tokens), two
# partial-aggregable groupBys ((doc,bucket) and (bucket)), the ratio
# table is n_buckets rows — broadcast — and the winner selection is a
# TakeOrderedAndProject, never a global sort.
# ---------------------------------------------------------------------------

def bitlen_sql(col: str, max_bits: int = 40) -> str:
    """Integer bit-length of a POSITIVE value (floor(log2)+1) as a CASE
    chain both engines evaluate identically — the integer log2 quantizer
    shared by dsir_resample and its oracle."""
    cases = " ".join(
        f"WHEN {col} >= {2 ** (i - 1)} THEN {i}"
        for i in range(max_bits, 1, -1)
    )
    return f"(CASE {cases} ELSE 1 END)"


def dsir_resample(
    docs: DataFrame,
    target_pred: str,
    n_buckets: int = 512,
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_n`` raw docs by quantized DSIR importance weight toward
    the subset selected by SQL predicate ``target_pred`` (e.g.
    "lang = 'en'"). Returns (doc_id, n_feats, weight, score) with
    score = weight / n_feats rounded to 4 — ranking is (score DESC,
    doc_id) so the selection is wholly deterministic."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col),
        F.expr(target_pred).cast("int").alias("__is_tgt"),
        toks.alias("__toks"),
    ).where(F.size("__toks") >= 2)
    feats = (
        base.select(
            F.col(id_col),
            "__is_tgt",
            F.explode(
                F.sequence(F.lit(1), F.size("__toks") - 1)
            ).alias("__i"),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            "__is_tgt",
            F.concat(
                F.element_at("__toks", F.col("__i")),
                F.lit(" "),
                F.element_at("__toks", F.col("__i") + 1),
            ).alias("__bg"),
        )
        .selectExpr(
            id_col,
            "__is_tgt",
            "cast(conv(substring(md5(concat('ds:', __bg)), 1, 12), 16, 10)"
            f" as bigint) % {n_buckets} as bucket",
        )
    )
    # bucket stats in ONE pass: raw occurrence count + target occurrence
    # count (target is a subset of raw, so both come from the same scan)
    buckets = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum("__is_tgt").alias("ct"),
    )
    ratio = buckets.selectExpr(
        "bucket",
        f"({bitlen_sql('(ct + 1)')} - {bitlen_sql('(cr + 1)')}) as r",
    )
    # r depends only on the bucket, so the weight sum distributes over
    # feature OCCURRENCES: broadcast the n_buckets-row ratio straight
    # onto the exploded stream and aggregate by doc in one pass. The
    # map-side partial agg collapses the ~tokens-per-doc occurrence rows
    # to one row per doc BEFORE the only full-width shuffle — an earlier
    # groupBy(doc, bucket) intermediate shuffled the entire exploded
    # stream nearly unreduced (mostly-distinct keys) and measured
    # superlinear past 400k docs.
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("r").cast("bigint").alias("weight"),
        )
        .select(
            id_col,
            "n_feats",
            "weight",
            F.round(F.col("weight") / F.col("n_feats"), 4).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), id_col).limit(top_n)


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT word
    n-grams that occur in NO other document — the inverse boilerplate /
    memorization signal of a training corpus (near-1 = original prose;
    near-0 = template chrome, licence banners, mirrored text). The
    quality-filter twin of the dedup family: dedup asks "which PAIRS
    share n-grams", this asks "how much of THIS doc is shared at all",
    one number per doc, no pairwise stage anywhere.

    Returns (doc_id, n_shingles, n_unique, novelty) with novelty =
    round(n_unique / n_shingles, 4) — exact integers up to the one
    rounded division, so the oracle replays it bit-for-bit.

    Scale shape: distinct (doc, shingle) stream → one partial-aggregable
    DF count per shingle → unhinted join-back (the DF relation is
    corpus-sized; the session-level r13 broadcast policy keeps plan-time
    estimates out of the strategy choice — the broadcast trap the r9
    curves caught in jaccard_prefix_pairs — and AQE sizes the join from
    measured bytes) → one groupBy(doc). Two uniform-key shuffles,
    nothing quadratic.
    Docs with fewer than n tokens have no shingles and drop out (both
    engines agree).
    """
    from .dedup import with_shingles

    warn_if_plan_time_broadcast(docs.sparkSession)
    sh = with_shingles(docs, n, text_col, distinct=True, id_expr=id_col,
                       id_alias=id_col)
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    return (
        sh.join(df_t, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("__df") == 1).cast("int"))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_shingles"), 4).alias(
                "novelty"
            ),
        )
    )


def ngram_novelty_sql(n: int = 3) -> str:
    """DuckDB oracle for :func:`ngram_novelty` over the ``documents``
    view: identical shingle formation, DF count, and rounded division."""
    grams = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, {grams} AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
       unnest(generate_series(1, len(toks) - {n - 1})) AS t(i)
),
dfs AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       round(CAST(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS novelty
FROM sh JOIN dfs USING (shingle)
GROUP BY sh.doc_id
"""


def hashed_weight_table(spark, n_buckets: int, salt: str = "lw") -> DataFrame:
    """Deterministic (bucket, w) weight table for the hashed linear
    scorer: w = md5-derived integer micro-units in [-1000, 1000]. A
    stand-in for TRAINED classifier weights (fastText / CCNet-style
    quality filters ship exactly this shape: a hashed-feature -> weight
    vector) that keeps the whole scoring pipeline bit-replayable in the
    oracle; swapping in learned weights is a table swap."""
    return spark.range(n_buckets).selectExpr(
        "cast(id as bigint) as bucket",
        f"cast(conv(substring(md5(concat('{salt}:', cast(id as string))),"
        " 1, 12), 16, 10) as bigint) % 2001 - 1000 as w",
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style linear classifier scoring over hashed bag-of-words
    features — the LEARNED-filter stage of a training-data pipeline
    (CCNet's fastText LM filter, GPT-3's quality classifier): score each
    document by the sum of its tokens' hashed-bucket weights, normalized
    by length.

    (doc_id, n_tokens, raw_score, score) where raw_score =
    Σ_token w[md5(token) % n_buckets] in INTEGER micro-units — exact
    BIGINT arithmetic, so the per-doc sum is order-independent and
    cross-engine stable (float dot products would drift under Spark's
    unordered partial aggregation) — and score = raw_score/n_tokens
    rounded once. Tokens count with multiplicity, as fastText's mean-of-
    embeddings does.

    Scale: explode tokens → broadcast join the n_buckets-row weight dim
    → ONE partial-aggregable groupBy(doc). Map-side combine collapses
    the token stream to one row per doc before the only shuffle; the
    weight table broadcasts at any corpus size. Filtering is then a
    WHERE on score — used with a threshold it is the classifier-based
    twin of ``quality_filter``'s heuristic gates.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10)
                .cast("bigint") % F.lit(n_buckets)
            ).alias("bucket"),
        )
    )
    # LEFT join + coalesce(w, 0): a SPARSE trained table (or a bucket
    # domain narrower than n_buckets) must score unknown tokens 0, not
    # silently drop them from n_tokens — and a doc whose tokens all miss
    # must still emit a row (score 0), or a downstream WHERE-score filter
    # loses the doc without a verdict
    return (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("w"), F.lit(0)))
            .cast("bigint")
            .alias("raw_score"),
        )
        .select(
            id_col,
            "n_tokens",
            "raw_score",
            F.round(F.col("raw_score") / F.col("n_tokens"), 4).alias(
                "score"
            ),
        )
    )
