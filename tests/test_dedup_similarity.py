"""Dedup + similarity operator tests: known-positive detection and
approximate-vs-exact agreement (LSH recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.operators import dedup as dd
from incubator_stormcrawler_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),  # exact dup of 1
        Row(doc_id=3, text=base + " lambda"),  # near dup of 1
        Row(doc_id=4, text="one two three four five six seven eight nine ten"),
        Row(doc_id=5, text="cat dog bird fish mouse horse cow sheep goat pig"),
    ]
    return spark.createDataFrame(rows)


def test_exact_duplicates(docs):
    got = dd.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0].keeper == 1 and got[0].n_docs == 2


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.doc1, r.doc2): r.jaccard for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (2, 3) in pairs and 0.5 < pairs[(2, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_candidates(docs):
    got = {(r.doc1, r.doc2): r.est_sim for r in
           dd.lsh_candidate_pairs(docs, min_est_sim=0.5).collect()}
    assert got.get((1, 2)) == 1.0  # identical sets agree on every hash
    assert (1, 3) in got  # near dup shares ≥1 band w.h.p.
    assert not any((4 in p or 5 in p) for p in got)


def test_simhash_identical_and_distinct(docs):
    s = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    assert s[1] == s[2]
    assert -(1 << 63) <= s[1] < (1 << 63)  # 64-bit signed signature
    assert s[1] != s[4]


def test_simhash_pairs_banding_equals_brute(spark, docs):
    """Banded candidate join must find exactly the all-pairs hamming≤3 set
    (pigeonhole: ≤3 differing bits leave ≥1 of 4 bytes intact)."""
    got = {(r.doc1, r.doc2) for r in dd.simhash_pairs(docs, max_hamming=3).collect()}
    sig = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    ids = sorted(sig)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert got == brute


def test_ngram_jaccard_stop_shingle_cap(spark):
    """max_shingle_df drops boilerplate shingles shared by every doc but
    keeps true near-dup pairs: 30 docs share an identical header (its
    shingles have DF=30 > cap) plus unique bodies; docs 100/101 are real
    near-dups. Uncapped, the header makes all 435 pairs join candidates;
    capped, only the true pair survives with Jaccard on body shingles."""
    header = "site nav home about contact terms privacy copyright"
    rows = [
        Row(doc_id=i, text=header + " " + " ".join(
            f"body{i}w{k}" for k in range(12)))
        for i in range(30)
    ]
    near = "unique alpha beta gamma delta epsilon zeta eta theta iota"
    rows.append(Row(doc_id=100, text=near))
    rows.append(Row(doc_id=101, text=near + " extra"))
    docs = spark.createDataFrame(rows)

    capped = {(r.doc1, r.doc2): r.jaccard for r in dd.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=20).collect()}
    assert (100, 101) in capped  # true near-dup survives the cap
    assert all(d1 >= 100 for d1, _ in capped)  # header pairs gone

    # and the capped join processes far fewer shingle rows: every header
    # shingle (DF=30) is dropped, unique body shingles remain
    uncapped = {(r.doc1, r.doc2) for r in dd.ngram_jaccard_pairs(
        docs, threshold=0.5).collect()}
    assert (100, 101) in uncapped


def test_simhash_band_selectivity_and_recall(spark):
    """The 16-bit banding must be SELECTIVE on a realistic-vocabulary corpus:
    candidates ≪ all-pairs (the 8-bit/32-bit predecessor degenerated to
    ~36% of all-pairs), while still catching planted one-token-edit
    near-dups. Deterministic fixture → exact counts."""
    def tokens(i):
        return [f"w{(i * 37 + k * 101 + (i * k) % 7) % 5000}" for k in range(200)]

    rows = [Row(doc_id=i, text=" ".join(tokens(i))) for i in range(400)]
    for i in range(20):  # planted near-dups: one token replaced
        t = tokens(i)
        t[5] = "zzz_changed"
        rows.append(Row(doc_id=1000 + i, text=" ".join(t)))
    docs = spark.createDataFrame(rows)

    n = 420
    all_pairs = n * (n - 1) // 2
    cand = dd.simhash_band_candidates(dd.simhash(docs)).count()
    assert cand / all_pairs < 0.01  # measured: 58 / 87,990 ≈ 0.07%
    pairs = {(r.doc1, r.doc2) for r in
             dd.simhash_pairs(docs, max_hamming=3).collect()}
    planted = sum(1 for i in range(20) if (i, 1000 + i) in pairs)
    assert planted >= 18  # measured: 19/20 at hamming ≤ 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_lsh_cosine_recall(emb):
    """LSH ANN must recover most of the exact top-5. Random 64-dim data is
    the worst case for sign-LSH (neighbors sit at cosine ~0.3-0.5); the
    default multi-probe config (8 tables × 12 planes, Hamming≤3 probes)
    measured 0.86 recall@5 at sf0.01, so the floor is 0.75 to absorb
    query-subset variance; real clustered embeddings do far better."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in sim.lsh_cosine_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.75, f"LSH recall too low: {recall}"


def test_ivf_cosine_recall_and_pruning(emb):
    """IVF ANN: probing 12 of 32 cells (the round-5 default) must (a)
    actually prune — every query's candidate set is a strict subset of
    the corpus — and (b) keep recall ≥ 0.4 against exact top-5 on
    worst-case random vectors (measured 0.69 at sf0.01; clustered real
    embeddings concentrate neighbors in the probed cells and do far
    better)."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    approx_df = sim.ivf_cosine_topk(emb, queries, k=5)
    approx = {(r.query_id, r.vec_id) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # pruning: rank-5 similarity floors differ from exact for some query
    # only if candidates were dropped; stronger check — candidate cells
    # hold fewer than all vectors
    n = emb.count()
    worst_cell_total = (
        sim.ivf_cosine_topk(emb, queries, k=10**9)
        .groupBy("query_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert worst_cell_total < n - 1, "IVF probed every vector — no pruning"


def test_ivf_clustered_high_recall_at_low_scan(spark):
    """The IVF demonstration the random-vector curve can't give: on
    CLUSTERED embeddings (64 tight md5-derived clusters — the geometry
    real embeddings have), 64 cells × 8 probes must reach recall@5 ≥ 0.9
    while scanning ≤ 25% of the corpus per query (measured: recall 1.00
    at ~12.5% scan). Guards both halves of the recall/cost claim in
    BASELINE.md and the ann_ivf_recall_clustered registry entry."""
    emb = sim.clustered_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in sim.ivf_cosine_topk(
            emb, queries, k=5, n_centroids=64, n_probe=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered IVF recall too low: {recall}"
    stats = sim.ivf_scan_stats(
        emb, queries, n_centroids=64, n_probe=8
    ).collect()
    worst = max(r.scan_frac for r in stats)
    assert worst <= 0.25, f"clustered IVF scans too much: {worst}"


def test_cosine_topk_self_excluded_and_ranked(emb):
    queries = emb.where(F.col("vec_id") < 3)
    rows = sim.cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.vec_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.sim))
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == [1, 2, 3, 4, 5]
        sims = [x[1] for x in rs]
        assert sims == sorted(sims, reverse=True)


def test_dedup_clusters_chain(spark):
    """Label propagation resolves pair chains into one cluster with the
    min doc_id as keeper."""
    from pyspark.sql import Row
    from incubator_stormcrawler_spark.operators.corpus import dedup_clusters

    pairs = spark.createDataFrame(
        [Row(doc1=1, doc2=5), Row(doc1=5, doc2=9), Row(doc1=20, doc2=21)]
    )
    got = {r.doc_id: r.cluster for r in dedup_clusters(pairs, 4).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20}


def test_dedup_clusters_from_persisted_pairs(spark, sf_dir, tmp_path):
    """Pipeline shape at 100 TB: the candidate-generation pass runs ONCE
    and materializes the pair table; cluster resolution reads the STORED
    pairs instead of replaying the shingle self-join. Clusters from the
    stored table must equal clusters from the inline pairs (the oracle
    contract of `dedup_clusters`)."""
    from incubator_stormcrawler_spark.operators.corpus import (
        dedup_clusters,
        load_candidate_pairs,
        persist_candidate_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.6,
                                   max_shingle_df=20)
    store = str(tmp_path / "pairs")
    persist_candidate_pairs(pairs, store)
    stored = load_candidate_pairs(spark, store)
    # the stored table IS the pair set (columns preserved, layout dropped)
    assert set(stored.columns) >= {"doc1", "doc2"}
    inline = {(r.doc_id, r.cluster)
              for r in dedup_clusters(pairs, 4).collect()}
    from_store = {(r.doc_id, r.cluster)
                  for r in dedup_clusters(stored, 4).collect()}
    assert from_store == inline
    # and the cluster stage's input is the parquet store, not the shingle
    # self-join: the stored frame's plan is a bare scan with zero
    # aggregates/joins (dedup_clusters localCheckpoints the edge list, so
    # its own final plan shows an ExistingRDD — assert on the input)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan
    assert "Aggregate" not in plan and "Join" not in plan


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    from incubator_stormcrawler_spark.operators.corpus import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    assert a == b  # deterministic
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly the asked fraction
    # nested property: smaller fraction is a subset of larger
    c = {r.doc_id for r in hash_sample(docs, 0.1).select("doc_id").collect()}
    assert c <= a


def test_incremental_exact_dedup(spark):
    """Daily-ingest dedup: new batch splits into fresh vs dupes against the
    existing fingerprint index; within-batch dupes collapse too."""
    from incubator_stormcrawler_spark.operators.dedup import (
        fingerprint_expr,
        incremental_exact_dedup,
    )
    from pyspark.sql import functions as F

    existing = spark.createDataFrame(
        [Row(doc_id=1, text="known old document content")]
    ).select(fingerprint_expr(F.col("text")).alias("fingerprint"))

    batch = spark.createDataFrame(
        [
            Row(doc_id=10, text="known old document content"),   # dup of index
            Row(doc_id=11, text="brand new content alpha"),
            Row(doc_id=12, text="brand new content alpha"),      # in-batch dup
            Row(doc_id=13, text="brand new content beta"),
        ]
    )
    fresh, dupes = incremental_exact_dedup(batch, existing)
    assert {r.doc_id for r in fresh.collect()} == {11, 13}
    assert {r.doc_id for r in dupes.collect()} == {10, 12}


def test_minhash_lsh_band_rows_4(docs):
    """Generalized banding: r=4 (2 bands) still catches exact dups with
    est_sim 1.0 and keeps unrelated docs apart."""
    got = {(r.doc1, r.doc2): r.est_sim for r in
           dd.lsh_candidate_pairs(docs, num_hashes=8, band_rows=4,
                                  min_est_sim=0.5).collect()}
    assert got.get((1, 2)) == 1.0
    assert not any((4 in p or 5 in p) for p in got)


def test_decontaminate_flags_overlap_and_copies(spark, docs):
    from incubator_stormcrawler_spark.operators.corpus import decontaminate

    # eval set = doc 1's text; docs 1 and its exact copy 2 share all
    # 8-grams, near-dup 3 shares the leading 8-gram; 4/5 are clean
    eval_docs = docs.where(F.col("doc_id") == 1)
    got = {r.doc_id: r for r in decontaminate(docs, eval_docs, n=8).collect()}
    assert len(got) == 5
    assert got[1].contaminated and got[2].contaminated and got[3].contaminated
    assert got[2].n_hit_ngrams == 3  # 10 tokens -> 3 distinct 8-grams
    assert not got[4].contaminated and got[4].n_hit_ngrams == 0
    assert not got[5].contaminated


def test_decontaminate_short_docs_yield_no_ngrams(spark):
    from incubator_stormcrawler_spark.operators.corpus import decontaminate

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="a b c d e f g h")]
    )
    got = {r.doc_id: r for r in decontaminate(docs, docs, n=8).collect()}
    # doc 1 has < 8 tokens (no 8-grams at all); doc 2 matches itself
    assert got[1].n_hit_ngrams == 0 and not got[1].contaminated
    assert got[2].n_hit_ngrams == 1 and got[2].contaminated


def test_repetition_metrics_known_fractions(spark):
    from incubator_stormcrawler_spark.operators.corpus import repetition_metrics

    docs = spark.createDataFrame(
        [
            # 2-grams: "a b","b a","a b","b a" -> every occurrence dup,
            # top gram covers 2/4
            Row(doc_id=1, text="a b a b a"),
            # all distinct 2-grams
            Row(doc_id=2, text="one two three four"),
            # too short for any 2-gram
            Row(doc_id=3, text="solo"),
        ]
    )
    got = {r.doc_id: r for r in repetition_metrics(docs, n=2).collect()}
    assert got[1].n_ngrams == 4
    assert got[1].dup_ngram_frac == 1.0 and got[1].top_ngram_frac == 0.5
    assert got[2].n_ngrams == 3
    assert got[2].dup_ngram_frac == 0.0
    assert got[3].n_ngrams == 0 and got[3].dup_ngram_frac == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from incubator_stormcrawler_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail alice.b+spam@sub.example.org or call +44 20 7946 0958 "
                "from 192.168.0.1 thanks",
            ),
            Row(doc_id=2, text="no pii here just words"),
        ]
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1 and got[1].n_ipv4 == 1
    assert "<EMAIL>" in got[1].clean_text
    assert "<PHONE>" in got[1].clean_text
    assert "<IPV4>" in got[1].clean_text
    assert "example.org" not in got[1].clean_text
    assert "192.168" not in got[1].clean_text
    assert got[2].n_email == 0 and got[2].clean_text == got[2].clean_text
    assert got[2].clean_text == "no pii here just words"


def test_segment_dedup_first_occurrence_wins(spark):
    from incubator_stormcrawler_spark.operators.corpus import segment_dedup

    # doc 1: segments A B; doc 2: segment A again (dropped) + unique C;
    # doc 3 repeats B twice internally (second copy dropped too)
    seg_a = " ".join(f"a{i}" for i in range(4))
    seg_b = " ".join(f"b{i}" for i in range(4))
    seg_c = " ".join(f"c{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=seg_a + " " + seg_b),
            Row(doc_id=2, text=seg_a + " " + seg_c),
            Row(doc_id=3, text=seg_b + " " + seg_b),
        ]
    )
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in segment_dedup(docs, segment_tokens=4).collect()
    }
    assert got == {
        (1, 0): seg_a,
        (1, 1): seg_b,
        (2, 1): seg_c,
    }


def test_semdedup_drops_intra_cluster_twin_keeps_cross_cluster(spark):
    from incubator_stormcrawler_spark.operators.similarity import semdedup

    # two tight clusters in 4-d; ids 1,2 nearly identical (same cluster →
    # 2 shadowed by 1); id 3 orthogonal-ish in the other cluster survives;
    # id 4 identical to 3 → shadowed by 3
    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.1]),
            Row(vec_id=2, embedding=[1.0, 0.01, 0.0, 0.1]),
            Row(vec_id=3, embedding=[0.0, 1.0, 0.2, 0.0]),
            Row(vec_id=4, embedding=[0.0, 1.0, 0.2, 0.0]),
        ]
    )
    got = {
        r.vec_id: r for r in semdedup(emb, k=2, iterations=2, threshold=0.95).collect()
    }
    assert len(got) == 4
    assert got[1].kept and got[1].dup_of is None
    assert not got[2].kept and got[2].dup_of == 1
    assert got[3].kept
    assert not got[4].kept and got[4].dup_of == 3
    # cluster assignment actually separated the two groups
    assert got[1].cid == got[2].cid
    assert got[3].cid == got[4].cid
    assert got[1].cid != got[3].cid


def test_bigram_logprob_matches_hand_model(spark):
    import math

    from incubator_stormcrawler_spark.operators.corpus import bigram_logprob

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b"),
            Row(doc_id=2, text="b a c"),
            Row(doc_id=3, text="x"),  # <2 tokens: no bigrams, drops out
        ]
    )
    # corpus bigram stream: (a,b)x2 (b,a)x2 (a,c)x1  -> c1: a=3, b=2
    # unigram stream: a=3 b=3 c=1 x=1, N=8
    lam = 0.8
    uni = {"a": 3 / 8, "b": 3 / 8, "c": 1 / 8}
    c12 = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    c1 = {"a": 3, "b": 2}

    def lp(w1, w2):
        return math.log(lam * c12[(w1, w2)] / c1[w1] + (1 - lam) * uni[w2])

    exp1 = round((lp("a", "b") + lp("b", "a") + lp("a", "b")) / 3, 4)
    exp2 = round((lp("b", "a") + lp("a", "c")) / 2, 4)

    got = {r.doc_id: r for r in bigram_logprob(docs, lam=lam).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 3 and got[1].avg_logprob == exp1
    assert got[2].n_bigrams == 2 and got[2].avg_logprob == exp2


def test_substring_dedup_removes_copied_span_keeps_novel_tail(spark):
    import hashlib

    from incubator_stormcrawler_spark.operators.dedup import substring_dedup

    span = " ".join(f"s{i}" for i in range(6))  # 6-token repeated span
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=span + " tail1 tail2"),
            # exact copy of the span + novel tail: span removed, tail kept
            Row(doc_id=2, text=span + " novel1 novel2"),
            # full exact duplicate: removed entirely
            Row(doc_id=3, text=span + " tail1 tail2"),
            # too short for any 6-gram: untouched
            Row(doc_id=4, text="a b c"),
        ]
    )
    got = {r.doc_id: r for r in substring_dedup(docs, window=6).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    assert got[1].n_tokens == 8 and got[1].n_removed == 0
    assert got[1].clean_fp == md5(span + " tail1 tail2")
    # doc 2: grams starting inside the span are dups; the span tokens are
    # covered, novel tail survives
    assert got[2].n_removed == 6
    assert got[2].clean_fp == md5("novel1 novel2")
    # doc 3 duplicates doc 1 entirely -> every token covered
    assert got[3].n_removed == 8 and got[3].clean_fp == md5("")
    assert got[4].n_removed == 0 and got[4].clean_fp == md5("a b c")


def test_bm25_scores_and_ranks(spark):
    import math

    from incubator_stormcrawler_spark.operators.corpus import bm25_search

    # 3 docs; query term 'x': doc1 has 2 hits of 4 tokens, doc2 1 of 4,
    # doc3 none. N=3, df=2, avgdl=4.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="x a x b"),
            Row(doc_id=2, text="x c d e"),
            Row(doc_id=3, text="f g h i"),
        ]
    )
    got = bm25_search(docs, ["x"], k=10).collect()
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    k1, b = 1.2, 0.75

    def w(tf, dl, avgdl=4.0):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].rank == 1 and got[1].rank == 2
    assert got[0].score == round(w(2, 4), 4)
    assert got[1].score == round(w(1, 4), 4)


def test_inverted_postings_sorted_by_doc(spark):
    from incubator_stormcrawler_spark.operators.corpus import (
        inverted_postings,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=2, text="t t u"),
            Row(doc_id=1, text="t v"),
        ]
    )
    got = {r.term: r for r in inverted_postings(docs, max_terms=10).collect()}
    assert got["t"].df == 2 and got["t"].total_tf == 3
    assert got["t"].postings == "1:1,2:2"  # doc-sorted, tf attached
    assert got["t"].rank == 1  # highest df first
    assert got["u"].postings == "2:1"


def test_substring_dedup_matches_python_reference(spark):
    """Differential test: seeded random corpus (small vocab → natural
    collisions) + planted exact/partial copies, checked token-for-token
    against a straightforward Python reference of the same semantics."""
    import hashlib
    import random

    from incubator_stormcrawler_spark.operators.dedup import substring_dedup

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    w = 5
    docs = []
    for did in range(1, 31):
        n = rng.randint(3, 25)
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
    # planted copies: full dup of doc 3, partial copy of doc 7's head
    docs.append((100, docs[2][1]))
    docs.append((101, " ".join(docs[6][1].split(" ")[:10]) + " zz1 zz2"))

    seen = {}
    dup_starts = {}
    for did, text in sorted(docs):
        toks = text.split(" ")
        for p in range(1, len(toks) - w + 2):
            gram = " ".join(toks[p - 1 : p - 1 + w])
            if gram in seen:
                dup_starts.setdefault(did, set()).add(p)
            else:
                seen[gram] = (did, p)
    expected = {}
    for did, text in docs:
        toks = text.split(" ")
        removed = [False] * len(toks)
        last = None
        for p in range(1, len(toks) + 1):
            if p in dup_starts.get(did, set()):
                last = p
            if last is not None and p < last + w:
                removed[p - 1] = True
        kept = [t for t, r in zip(toks, removed) if not r]
        expected[did] = (
            len(toks),
            sum(removed),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_fp)
        for r in substring_dedup(sdf, window=w).collect()
    }
    assert got == expected


def test_winnow_guarantee_and_determinism(spark):
    """Winnowing's core guarantee: two docs sharing a run of >= w+k-1
    tokens share at least one selected fingerprint; and selection is
    deterministic (same doc -> same digest)."""
    from incubator_stormcrawler_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = " ".join(f"s{i}" for i in range(7))  # w+k-1 = 7 shared tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a1 a2 " + shared + " a3 a4"),
            Row(doc_id=2, text="b1 " + shared + " b2 b3 b4"),
            Row(doc_id=3, text="c1 c2 " + shared + " a3 a4"),  # same tail as 1
            Row(doc_id=4, text=" ".join(f"u{i}" for i in range(12))),
        ]
    )
    out = winnow_fingerprints(docs, k=4, w=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # density ~ 2/(w+1) ballpark; must select at least one per full window
    for r in rows.values():
        assert 1 <= r.n_selected <= r.n_grams

    # the shared-run guarantee: re-derive the selected packed sets and
    # check docs 1 and 2 intersect on a fingerprint from the shared run
    import hashlib

    def selected(text, k=4, w=4):
        toks = text.split(" ")
        packed = []
        for p in range(1, len(toks) - k + 2):
            gram = " ".join(toks[p - 1 : p - 1 + k])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:7], 16)
            packed.append((h * 1048576 + p, gram))
        sel = set()
        for s in range(0, len(packed) - w + 1):
            sel.add(min(packed[s : s + w]))
        return sel

    s1 = {g for _, g in selected("a1 a2 " + shared + " a3 a4")}
    s2 = {g for _, g in selected("b1 " + shared + " b2 b3 b4")}
    assert s1 & s2  # at least one shared selected GRAM text


def test_card_audit_luhn_separates_valid_from_noise(spark):
    from incubator_stormcrawler_spark.functions.text import card_audit

    docs = spark.createDataFrame(
        [
            # valid Visa-format (Luhn ok), with separators
            Row(doc_id=1, text="pay 4539 1488 0343 6467 now"),
            # 16 digits, Luhn fails
            Row(doc_id=2, text="ref 1234 5678 9012 3456 x"),
            # valid Amex (15 digits, no separators)
            Row(doc_id=3, text="amex 378282246310005 ok"),
            # too short to be a candidate at all
            Row(doc_id=4, text="pin 1234 end"),
            Row(doc_id=5, text="no digits at all"),
        ]
    )
    got = {r.doc_id: r for r in card_audit(docs).collect()}
    assert got[1].n_card_candidates == 1 and got[1].n_luhn_valid == 1
    assert got[2].n_card_candidates == 1 and got[2].n_luhn_valid == 0
    assert got[3].n_card_candidates == 1 and got[3].n_luhn_valid == 1
    assert got[4].n_card_candidates == 0 and got[4].n_luhn_valid == 0
    assert got[5].n_card_candidates == 0 and got[5].n_luhn_valid == 0


def test_segment_dedup_identity_on_unique_corpus(spark):
    """A corpus with no repeated segments passes through unchanged —
    dedup must never drop novel content."""
    from incubator_stormcrawler_spark.operators.corpus import segment_dedup

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(f"d{i}w{k}" for k in range(9)))
            for i in range(12)
        ]
    )
    got = segment_dedup(docs, segment_tokens=4).collect()
    # every chunk of every doc survives: 12 docs x ceil(9/4)=3 chunks
    assert len(got) == 36


def test_substring_dedup_is_idempotent_on_its_output_semantics(spark):
    """Feeding substring_dedup's surviving text back in removes nothing
    more (the first pass removed every cross-document repeat)."""
    import hashlib

    from incubator_stormcrawler_spark.operators.dedup import substring_dedup

    span = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=span + " a1 a2 a3"),
            Row(doc_id=2, text=span + " b1 b2 b3"),
            Row(doc_id=3, text="c1 c2 c3 c4 c5 c6 c7 c8"),
        ]
    )
    first = {r.doc_id: r for r in substring_dedup(docs, window=8).collect()}
    # doc2 lost the copied span; rebuild the surviving texts and re-run
    survivors = spark.createDataFrame(
        [
            Row(doc_id=1, text=span + " a1 a2 a3"),
            Row(doc_id=2, text="b1 b2 b3"),
            Row(doc_id=3, text="c1 c2 c3 c4 c5 c6 c7 c8"),
        ]
    )
    second = {
        r.doc_id: r for r in substring_dedup(survivors, window=8).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert first[2].clean_fp == md5("b1 b2 b3")
    assert all(r.n_removed == 0 for r in second.values())


def test_temperature_mix_upsamples_low_resource(spark):
    """alpha<1 must give low-token sources a HIGHER keep rate than
    high-token ones, with the top-weighted source keeping everything
    (rate 1.0), and kept counts must match the deterministic hash rule."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import temperature_mix

    rows = []
    did = 0
    for src, n_docs, words in [("big", 200, 40), ("small", 20, 10)]:
        for _ in range(n_docs):
            rows.append(Row(doc_id=did, source=src, text=" ".join(["w"] * words)))
            did += 1
    docs = spark.createDataFrame(rows)
    rep = {r.source: r for r in temperature_mix(docs, alpha=0.5).collect()}
    assert rep["small"].rate == 1.0          # most-upweighted keeps all
    assert rep["big"].rate < rep["small"].rate
    assert rep["small"].n_kept == 20         # rate 1.0 -> every doc kept
    # expected big rate: (share_small/share_big)^0.5
    share_big = 200 * 40 / (200 * 40 + 20 * 10)
    share_small = 1 - share_big
    assert abs(rep["big"].rate - (share_small / share_big) ** 0.5) < 1e-5
    assert 0 < rep["big"].n_kept < 200       # genuinely downsampled


def test_length_bucketed_batches_sharded_scale_path(spark):
    """The num_shards>1 variant (the 100 TB window-skew fix) must keep the
    batching contract: every batch stays within one (bucket, shard), holds
    at most batch_size docs, and at most one batch per group is partial;
    all docs are assigned exactly once."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import (
        length_bucketed_batches,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (5 + i % 90))) for i in range(300)]
    )
    out = length_bucketed_batches(docs, batch_size=8, bucket_bits=5,
                                  num_shards=4).collect()
    assert len(out) == 300 and len({r.doc_id for r in out}) == 300
    from collections import defaultdict

    groups = defaultdict(list)
    for r in out:
        groups[(r.bucket, r.shard, r.batch_in_bucket)].append(r)
    partial_per = defaultdict(int)
    for (b, s, _), rs in groups.items():
        assert len(rs) <= 8
        if len(rs) < 8:
            partial_per[(b, s)] += 1
    assert all(v == 1 for v in partial_per.values())
    # within a batch, lengths are contiguous in the shard's sorted order:
    # batch max n_tokens <= next batch's min n_tokens
    per_shard = defaultdict(dict)
    for (b, s, bt), rs in groups.items():
        per_shard[(b, s)][bt] = rs
    for (b, s), batches in per_shard.items():
        for bt in sorted(batches)[:-1]:
            cur_max = max(r.n_tokens for r in batches[bt])
            nxt_min = min(r.n_tokens for r in batches[bt + 1])
            assert cur_max <= nxt_min


def test_vocab_coverage_known_values(spark):
    """Hand-checked coverage: vocab of size 1 = the most frequent token;
    coverage counts occurrences of vocab tokens over ALL whitespace
    positions."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import vocab_coverage

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a b"),   # 3/4 covered by vocab {a}
            Row(doc_id=1, text="b c d e"),   # 0/4
            Row(doc_id=2, text="a b"),       # 1/2
        ]
    )
    got = {r.doc_id: (r.n_words, r.n_in_vocab, r.coverage)
           for r in vocab_coverage(docs, vocab_size=1).collect()}
    assert got == {0: (4, 3, 0.75), 1: (4, 0, 0.0), 2: (2, 1, 0.5)}


def test_bpe_encode_hand_example(spark):
    """Classic BPE on a hand example: merges learned rank order applies
    lowest-rank-first, untouched words stay as characters."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import bpe_encode

    # merges: ('l','o')->0, ('lo','w')->1, ('e','r')->2
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="low lower"),
            Row(doc_id=1, text="ab"),       # no applicable merge
            Row(doc_id=2, text=None),       # null text
        ]
    )
    got = {r.doc_id: (r.n_words, r.n_pieces, r.pieces_fp)
           for r in bpe_encode(docs, merges).collect()}
    # "low" -> l o w -> lo w -> low;  "lower" -> ... -> low e r -> low er
    import hashlib
    fp0 = hashlib.md5("\x01".join(["low", "low", "er"]).encode()).hexdigest()
    fp1 = hashlib.md5("\x01".join(["a", "b"]).encode()).hexdigest()
    assert got[0] == (2, 3, fp0)
    assert got[1] == (1, 2, fp1)
    assert got[2] == (0, 0, "")


def test_star_contraction_long_chain(spark):
    """The web-scale cluster resolver must converge on a LONG chain —
    exactly the case fixed-iteration label propagation cannot handle
    (diameter 30 needs 30 propagation rounds; star contraction does it
    in O(log² n) rounds)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import (
        star_contraction_components,
    )

    chain = [Row(doc1=i, doc2=i + 1) for i in range(30)]       # 0-…-30
    chain += [Row(doc1=100, doc2=101)]                          # second comp
    got = {r.doc_id: r.cluster for r in star_contraction_components(
        spark.createDataFrame(chain)).collect()}
    assert all(got[i] == 0 for i in range(31))
    assert got[100] == 100 and got[101] == 100


def test_star_contraction_matches_union_find(spark):
    """Random sparse graph: components must equal a union-find ground
    truth, and isolated pair-free nodes label themselves."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import (
        star_contraction_components,
    )

    edges = [((i * 17) % 97, (i * 43 + 7) % 97) for i in range(60)]
    parent = list(range(97))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            parent[find(a)] = find(b)
    truth = {}
    seen_nodes = {n for e in edges for n in e}
    for n in seen_nodes:
        truth.setdefault(n, min(m for m in seen_nodes
                                if find(m) == find(n)))
    got = {r.doc_id: r.cluster for r in star_contraction_components(
        spark.createDataFrame([Row(doc1=a, doc2=b) for a, b in edges
                               if a != b])).collect()}
    assert got == truth


def test_star_contraction_same_contract_as_label_prop(spark):
    """On short-diameter graphs (the near-dup regime) the two resolvers
    agree exactly — star contraction is a drop-in replacement."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import (
        dedup_clusters,
        star_contraction_components,
    )

    pairs = spark.createDataFrame(
        [Row(doc1=1, doc2=5), Row(doc1=5, doc2=9), Row(doc1=20, doc2=21)]
    )
    lp = {(r.doc_id, r.cluster) for r in dedup_clusters(pairs, 4).collect()}
    sc = {(r.doc_id, r.cluster)
          for r in star_contraction_components(pairs).collect()}
    assert sc == lp


def test_incremental_lsh_matches_full_subset(spark, docs):
    """The incremental near-dup pass (batch vs stored signature index)
    must return EXACTLY the subset of the full-corpus LSH pairs that
    involve a batch doc — re-shingling only the delta changes the cost,
    never the answer."""
    index_docs = docs.where(F.col("doc_id") <= 3)
    batch = docs.where(F.col("doc_id") > 3)
    index_sigs = dd.minhash_signatures(index_docs)
    inc = {(r.doc1, r.doc2, r.est_sim) for r in
           dd.incremental_lsh_dedup(batch, index_sigs).collect()}
    full = {(r.doc1, r.doc2, r.est_sim) for r in
            dd.lsh_candidate_pairs(docs, min_est_sim=0.5).collect()
            if r.doc2 > 3}
    assert inc == full
    assert all(d2 > 3 for _, d2, _ in inc)  # newer side always in batch


def test_incremental_lsh_nonmonotone_ids_and_reingest(spark, docs):
    """Ids carry no recency order: an index doc with a LARGER id than a
    batch near-dup must still pair (emitted as (index, batch)); and a
    doc_id present in both index and batch is a re-ingest whose stale
    index signatures are dropped — NOT a self-duplicate, and its band
    key must not be corrupted by doubled signature rows."""
    # index = {3, 4, 5} (3 is a near-dup of 1/2); batch = {1, 2}
    index_sigs = dd.minhash_signatures(docs.where(F.col("doc_id") >= 3))
    batch = docs.where(F.col("doc_id") <= 2)
    got = {(r.doc1, r.doc2) for r in
           dd.incremental_lsh_dedup(batch, index_sigs).collect()}
    assert (1, 2) in got          # within-batch exact pair, id-ordered
    assert (3, 1) in got and (3, 2) in got  # index-vs-batch, index first
    assert not any(4 in p or 5 in p for p in got)
    # re-ingest: doc 1's signatures ALSO in the index (stale copy) — the
    # result must be identical, with no phantom self-pair
    index_with_overlap = dd.minhash_signatures(
        docs.where((F.col("doc_id") >= 3) | (F.col("doc_id") == 1))
    )
    got2 = {(r.doc1, r.doc2) for r in
            dd.incremental_lsh_dedup(batch, index_with_overlap).collect()}
    assert got2 == got
    assert not any(a == b for a, b in got2)


def test_incremental_lsh_stored_band_keys_identical(spark, docs):
    """The delta-bounded path: passing the PERSISTED (doc_id, b, bkey)
    band-key table (``index_bands``) must reproduce the on-the-fly
    result exactly — including the re-ingest rule (a doc_id in both
    index and batch drops its STORED band keys, so its fresh batch
    bands stand alone). This is the steady-state crawl-loop plan that
    replaces the store-sized banding groupBy with scan + join."""
    index_docs = docs.where((F.col("doc_id") >= 3) | (F.col("doc_id") == 1))
    index_sigs = dd.minhash_signatures(index_docs)
    index_bands = dd.band_keys(index_sigs)
    batch = docs.where(F.col("doc_id") <= 2)
    baseline = {(r.doc1, r.doc2, r.est_sim) for r in
                dd.incremental_lsh_dedup(batch, index_sigs).collect()}
    banded = {(r.doc1, r.doc2, r.est_sim) for r in
              dd.incremental_lsh_dedup(
                  batch, index_sigs, index_bands=index_bands
              ).collect()}
    assert banded == baseline
    assert (3, 1) in {(a, b) for a, b, _ in banded}
    # a doc_id seen ONLY in the band store (sigs missing — a torn store)
    # can band-match but contributes no v1 rows, so its est_sim group is
    # empty and it silently drops rather than corrupting the rerank
    torn_bands = index_bands.unionByName(
        dd.band_keys(dd.minhash_signatures(batch)).where(F.lit(False))
    )
    still = {(r.doc1, r.doc2, r.est_sim) for r in
             dd.incremental_lsh_dedup(
                 batch, index_sigs, index_bands=torn_bands
             ).collect()}
    assert still == baseline


def test_star_contraction_string_ids(spark):
    """Ids keep their native type: string doc ids (URL fingerprints — the
    id type dedup_clusters accepts) must resolve identically, with the
    component min under lexicographic order as the cluster label."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import (
        star_contraction_components,
    )

    pairs = spark.createDataFrame(
        [Row(doc1="urlB", doc2="urlA"), Row(doc1="urlB", doc2="urlC"),
         Row(doc1="x2", doc2="x1")]
    )
    got = {r.doc_id: r.cluster
           for r in star_contraction_components(pairs).collect()}
    assert got == {"urlA": "urlA", "urlB": "urlA", "urlC": "urlA",
                   "x1": "x1", "x2": "x1"}


def test_pack_sequences_stream_invariants(spark):
    """The packed token stream must be gap-free and non-overlapping:
    sorted by global_offset, each doc starts exactly where the previous
    ended; sequence coordinates are consistent with the offsets; empty
    docs occupy no stream positions (n_seqs=0)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (i % 37))) for i in range(200)]
        + [Row(doc_id=1000, text=None)]
    )
    rows = sorted(pack_sequences(docs, seq_len=32).collect(),
                  key=lambda r: (r.global_offset, r.doc_id))
    pos = 0
    for r in rows:
        if r.n_tokens == 0:
            assert r.n_seqs == 0
            continue
        assert r.global_offset == pos   # gap-free, non-overlapping
        pos += r.n_tokens
        assert r.first_seq == r.global_offset // 32
        assert r.last_seq == (r.global_offset + r.n_tokens - 1) // 32
        assert r.n_seqs == r.last_seq - r.first_seq + 1
        assert r.offset_in_seq == r.global_offset - r.first_seq * 32
    total = sum(r.n_tokens for r in rows)
    assert pos == total  # stream length == token total
    # NOTE: docs with text=None pack as 0 tokens ('' splits to 1 token in
    # Spark, None to null — pack_shards coalesces both to 0)


def test_bloom_unseen_exact_under_saturation(spark):
    """bloom_unseen must equal the plain LEFT ANTI join even when the
    bitmap is tiny enough to saturate (m_bits=64 over 300 seen keys →
    nearly every probe is a false positive): false positives only push
    rows into the exact residual join; false negatives are impossible.
    Also checked: a large bitmap (no saturation) and candidates fully
    disjoint from / fully contained in the seen-set."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import bloom_unseen

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(300)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(150, 450)]
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    for m_bits in (64, 1 << 16):
        got = sorted(
            r.key for r in bloom_unseen(seen, cands, "key",
                                        m_bits=m_bits).collect()
        )
        assert got == expected, f"m_bits={m_bits}"
    # fully disjoint: everything is definite-new
    disj = spark.createDataFrame([Row(key=f"x{i}", payload=i)
                                  for i in range(50)])
    assert bloom_unseen(seen, disj, "key").count() == 50
    # fully contained: nothing survives
    cont = spark.createDataFrame([Row(key=f"k{i}", payload=i)
                                  for i in range(50)])
    assert bloom_unseen(seen, cont, "key").count() == 0


def test_bloom_unseen_plan_is_mapside_prefilter(spark):
    """The scale contract: the bitmap enters the candidate side as
    BROADCAST joins only (k=3 probes → 3 BroadcastHashJoins), the exact
    membership check is ONE LeftAnti, and no SortMergeJoin appears — the
    definite-new branch never shuffles."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import bloom_unseen

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(100)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(50, 200)]
    )
    plan = bloom_unseen(seen, cands, "key")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("LeftAnti") == 1
    # the ONLY shuffle join allowed is the exact LeftAnti residue; every
    # probe join must be broadcast
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "LeftAnti" in line


def test_bloom_unseen_sharded_equals_not_in(spark):
    """bloom_unseen_sharded(n_shards>1) == plain LEFT ANTI == unsharded
    bloom_unseen, including under per-shard saturation (m_bits=64), and a
    1-shard sharded run degenerates to the plain form."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_unseen,
        bloom_unseen_sharded,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(300)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(150, 450)]
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    for n_shards in (1, 4):
        for m_bits in (64, 1 << 12):
            for bres in (False, True):  # r9: both residue forms exact
                got = sorted(
                    r.key
                    for r in bloom_unseen_sharded(
                        seen, cands, "key", n_shards=n_shards,
                        m_bits=m_bits, broadcast_residue=bres,
                    ).collect()
                )
                assert got == expected, (n_shards, m_bits, bres)
    assert expected == sorted(
        r.key for r in bloom_unseen(seen, cands, "key").collect()
    )


def test_bloom_sharded_candidates_hash_to_exactly_one_shard(spark):
    """The shard split is a PARTITION of the candidate set: the per-shard
    branch row counts sum to the candidate count (total) and each key
    appears in exactly one branch (disjoint) — so no candidate is probed
    twice or dropped by the split."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from incubator_stormcrawler_spark.operators.dedup import _shard_expr

    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(500)]
    )
    n_shards = 4
    shard_of = _shard_expr("key", n_shards)
    branch_keys = [
        {r.key for r in cands.where(shard_of == s).collect()}
        for s in range(n_shards)
    ]
    assert sum(len(b) for b in branch_keys) == 500
    assert len(set().union(*branch_keys)) == 500
    # every shard id lands in [0, n_shards)
    bad = cands.where((shard_of < 0) | (shard_of >= n_shards)).count()
    assert bad == 0
    # the split is non-degenerate at this size: every branch is populated
    assert all(branch_keys)


def test_bloom_sharded_plan_broadcasts_each_shard(spark):
    """Scale contract of the sharded form: EVERY shard branch enters the
    plan as broadcast probe joins (n_shards * k BroadcastHashJoins — no
    single broadcast ever carries the whole bitmap), the exact residue is
    still ONE LeftAnti, and no probe join shuffles."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_unseen_sharded,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(100)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(50, 200)]
    )
    n_shards, k = 4, 3
    plan = (
        bloom_unseen_sharded(seen, cands, "key", n_shards=n_shards, k=k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= n_shards * k
    # Catalyst pushes the single residual anti join THROUGH the branch
    # union (one LeftAnti per branch against a reused exchange of the
    # seen side) — either shape is the same exact residue check, so
    # accept 1 or n_shards; anything else means the rewrite broke
    assert plan.count("LeftAnti") in (1, n_shards)
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "LeftAnti" in line


def test_bloom_reserved_namespace_collision_raises(spark):
    """A candidates column inside the reserved __bf_ namespace must be
    rejected loudly — withColumn would otherwise silently overwrite it
    with a probe position (the pre-r8 p0/wi0 names had exactly that
    silent-corruption mode)."""
    import pytest
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import bloom_unseen

    seen = spark.createDataFrame([Row(key="a")])
    cands = spark.createDataFrame([Row(key="b", __bf_p0=1)])
    with pytest.raises(ValueError, match="__bf_"):
        bloom_unseen(seen, cands, "key")


def test_bloom_unseen_broadcast_equals_not_in(spark):
    """bloom_unseen_broadcast == plain LEFT ANTI (incl. under bitmap
    saturation), and it accepts a prebuilt bitmap_array interchangeable
    with bloom_bitmap's rows (same md5 positions)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_bitmap_array,
        bloom_unseen_broadcast,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(300)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(150, 450)]
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    for m_bits in (64, 1 << 12):
        got = sorted(
            r.key
            for r in bloom_unseen_broadcast(
                seen, cands, "key", m_bits=m_bits
            ).collect()
        )
        assert got == expected, f"m_bits={m_bits}"
    arr = bloom_bitmap_array(seen, "key", m_bits=1 << 12)
    got = sorted(
        r.key
        for r in bloom_unseen_broadcast(
            seen, cands, "key", m_bits=1 << 12, bitmap_array=arr
        ).collect()
    )
    assert got == expected


def test_bloom_broadcast_residue_never_shuffles_seen(spark):
    """broadcast_residue=True: equality with LEFT ANTI holds AND the plan
    contains no SortMergeJoin — the seen set is only SCANNED (map-side
    LeftSemi against the broadcast residue keys), never shuffled; the
    only exchanges left are the small residue-key distincts."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_unseen_broadcast,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(300)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(150, 450)]
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    res = bloom_unseen_broadcast(
        seen, cands, "key", m_bits=1 << 12, broadcast_residue=True
    )
    assert sorted(r.key for r in res.collect()) == expected
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_jaccard_prefix_equals_full_self_join(spark):
    """The AllPairs/PPJoin prefix rewrite must be EXACT: identical result
    set to ngram_jaccard_pairs across thresholds on a corpus with planted
    overlaps of varying strength (J ≈ 0.43 / 0.65 / 0.85)."""
    from incubator_stormcrawler_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.range(600).selectExpr(
        "id as doc_id",
        "concat_ws(' ', transform(sequence(0, 39), j -> "
        "substr(md5(cast(case when mod(id, 7) = 0 and j < 25 then id - 1 "
        "when mod(id, 11) = 0 and j < 32 then id - 2 "
        "when mod(id, 13) = 0 and j < 36 then id - 3 "
        "else id end as string) || '-' || cast(j as string)), 1, 6))) "
        "as text",
    )
    for thr in ("0.5", "0.55", "0.7"):
        exact = set(
            map(tuple, ngram_jaccard_pairs(docs, n=3, threshold=float(thr)).collect())
        )
        pref = set(
            map(tuple, jaccard_prefix_pairs(docs, n=3, threshold=thr).collect())
        )
        assert pref == exact, f"threshold {thr}"
    assert exact  # the corpus must actually plant pairs


def test_jaccard_prefix_threshold_boundary(spark):
    """Hand-built boundary: two 10-shingle docs sharing exactly 7 →
    J = 7/13 ≈ 0.5385. Included at t=0.5, excluded at t=0.55 — and the
    integer-ceil prefix math keeps the t=0.5385-adjacent pair complete
    (a float ceil would shorten the prefix and drop it)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    base = [f"w{i}" for i in range(12)]          # 12 tokens → 10 shingles
    other = base[:9] + ["x1", "x2", "x3"]        # shares 7 of 10 shingles
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(base)), Row(doc_id=2, text=" ".join(other))]
    )
    lo = jaccard_prefix_pairs(docs, n=3, threshold="0.5").collect()
    assert len(lo) == 1 and lo[0].jaccard == round(7 / 13, 4)
    hi = jaccard_prefix_pairs(docs, n=3, threshold="0.55").collect()
    assert hi == []


def test_jaccard_prefix_indexes_fewer_shingles(spark):
    """The point of the rewrite: the self-joined prefix relation must be
    strictly smaller than the full shingle relation (at t=0.7 each doc
    indexes ≈ 30% of its shingles + 1)."""
    from incubator_stormcrawler_spark.operators.dedup import (
        jaccard_prefix_pairs,
        with_shingles,
    )

    docs = spark.range(300).selectExpr(
        "id as doc_id",
        "concat_ws(' ', transform(sequence(0, 39), j -> "
        "substr(md5(cast(id as string) || '-' || cast(j as string)), 1, 6)))"
        " as text",
    )
    total = with_shingles(docs, 3).count()
    out = jaccard_prefix_pairs(docs, n=3, threshold="0.7")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    out.count()
    # prefix length for s=38, t=0.7-1/5000: 38 - ceil(26.5924) + 1 = 12
    # → 12/38 ≈ 32% of the full relation feeds the self-join
    prefix_rows = 300 * 12
    assert prefix_rows < total * 0.35


def test_jl_clustered_high_recall_at_low_scan(spark):
    """The JL two-stage path's quality claim: on clustered embeddings a
    16→6 projection shortlisting 50 of 2000 (2.5% of the corpus) must
    reach recall@5 ≥ 0.9 (measured 1.00) — the third ANN family's
    clustered-geometry half, next to its honest random-vector worst case
    (~0.35 at 10% shortlist, see ann_jl_recall)."""
    emb = sim.clustered_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in sim.jl_cosine_topk(
            emb, queries, k=5, out_dim=6, seed=8, shortlist=50, in_dim=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered JL recall too low: {recall}"


def test_jl_topk_beats_random_shortlist_and_plan(spark):
    """On the random embeddings table the JL shortlist must beat the
    random-shortlist baseline by ≥ 2× (shortlist/corpus expected recall),
    and the plan must broadcast the query projections (no shuffle join
    on the corpus-side shortlist stage, no cartesian against a
    non-broadcast side)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    n = emb.count()
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    jl = sim.jl_cosine_topk(emb, queries, k=5, out_dim=8, seed=8,
                            shortlist=50)
    approx = {(r.query_id, r.vec_id) for r in jl.collect()}
    recall = len(exact & approx) / len(exact)
    baseline = 50 / (n - 1)
    assert recall >= 2 * baseline, (recall, baseline)
    plan = jl._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # corpus × broadcast queries


def test_containment_pairs_asymmetric(spark):
    """The case Jaccard structurally misses: doc A (12 tokens) quoted
    verbatim inside doc B (60 tokens). J ≈ 10/56 ≈ 0.18, but C(A→B) =
    1.0 — only the (A contained-in B) direction fires, with exact sizes;
    two unrelated docs produce nothing."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    page = quote + " " + " ".join(f"p{i}" for i in range(48))
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=quote), Row(doc_id=2, text=page),
         Row(doc_id=3, text=other)]
    )
    rows = containment_pairs(docs, n=3, threshold="0.7").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.contained, r.container) == (1, 2)
    assert r.containment == 1.0
    assert r.n_contained == 10 and r.n_container == 58
    # and Jaccard at the same threshold sees nothing
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.7).collect() == []


def test_containment_threshold_boundary_and_cap(spark):
    """Exact-rational threshold: 7 of 10 shingles contained → C = 0.7
    kept at t=0.7, dropped at t=0.75; the stop-shingle cap keeps the
    result exact over remaining sets (planted pair survives)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        containment_pairs,
    )

    a = [f"w{i}" for i in range(12)]              # 10 shingles
    b = a[:9] + [f"x{i}" for i in range(20)]      # contains 7 of them
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(a)), Row(doc_id=2, text=" ".join(b))]
    )
    lo = containment_pairs(docs, n=3, threshold="0.7").collect()
    assert [(r.contained, r.container, r.containment) for r in lo] == [
        (1, 2, 0.7)
    ]
    hi = containment_pairs(docs, n=3, threshold="0.75").collect()
    assert hi == []


def test_minhash_production_hash_mode(spark):
    """Doc-level MinHash-LSH under hash_fn='xxhash64': every exact
    duplicate pairs at est_sim 1.0 in BOTH modes (identical shingle sets
    agree on every slot regardless of the hash family), and
    vocab-disjoint docs never pair. Deliberately NOT asserted: equality
    of the two modes' full 1.0-sets — an 8-slot estimate can read 1.0
    on a J≈0.7 pair with probability J^8 per family, so the lucky tail
    is hash-dependent by construction."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    def text(i, vocab="w"):
        return " ".join(f"{vocab}{(i * 3 + j) % 50}" for j in range(30))

    rows = (
        [Row(doc_id=i, text=text(i)) for i in range(20)]
        + [Row(doc_id=100 + i, text=text(i)) for i in range(20)]  # exact dups
        + [Row(doc_id=200 + i, text=text(i, "z")) for i in range(5)]
    )
    docs = spark.createDataFrame(rows)
    out = {}
    for fn in ("md5", "xxhash64"):
        pairs = lsh_candidate_pairs(
            docs, num_hashes=8, band_rows=2, min_est_sim=0.9, hash_fn=fn
        ).collect()
        got = {(r.doc1, r.doc2): r.est_sim for r in pairs}
        # every exact-dup pair captured at 1.0, in BOTH modes
        for i in range(20):
            assert got.get((i, 100 + i)) == 1.0, (fn, i)
        # vocab-disjoint docs never pair: no pair may cross the
        # w-vocab (< 200) / z-vocab (>= 200) boundary at all
        assert not any(
            (d1 < 200) != (d2 < 200) for d1, d2 in got
        ), fn
        out[fn] = {k for k, v in got.items() if v == 1.0}
    # the true-duplicate pairs sit in both modes' 1.0-sets
    must = {(i, 100 + i) for i in range(20)}
    assert must <= out["md5"] and must <= out["xxhash64"]


def test_substring_dedup_hash_modes_identical(spark):
    """hash_fn='xxhash64' hashes the token-slice array instead of the
    space-joined md5 string; the OUTPUT must be identical — h only
    gates first-occurrence equality. (Measured ~parity at 400k docs:
    the SMJ join-back dominates this operator, not the hash — recorded
    in the docstring so nobody expects the MinHash-sized win here.)"""
    from incubator_stormcrawler_spark.operators.dedup import substring_dedup

    docs = spark.range(2000).selectExpr(
        "id as doc_id",
        "case when id % 4 = 0 and id > 0 then concat('p', cast(id as string),"
        " ' ', concat_ws(' ', transform(sequence(0, 39), j ->"
        " substr(md5(cast(id - 1 as string) || cast(j as string)), 1, 6))))"
        " else concat_ws(' ', transform(sequence(0, 39), j ->"
        " substr(md5(cast(id as string) || cast(j as string)), 1, 6))) end"
        " as text",
    )
    a = substring_dedup(docs, hash_fn="md5").orderBy("doc_id").collect()
    b = substring_dedup(docs, hash_fn="xxhash64").orderBy("doc_id").collect()
    assert a == b and len(a) == 2000
    assert any(r.n_removed > 0 for r in a)  # the planted copies were hit


def test_segment_dedup_hash_modes_identical(spark):
    """hash_fn='xxhash64' swaps the DuckDB-replayable md5 segment hash
    for Spark's codegen hash; the SURVIVOR SET must be identical — the
    hash only gates exact-equality grouping. Same parity contract as
    substring_dedup/MinHash; completes the knob across the dedup family
    (the r8 verdict's last md5-only item)."""
    from incubator_stormcrawler_spark.operators.corpus import segment_dedup

    # 500 docs, 2 segments each; every 5th doc repeats doc (id-1)'s first
    # segment, and doc 7 repeats its own first segment internally
    docs = spark.range(500).selectExpr(
        "id as doc_id",
        "concat_ws(' ', "
        " case when id % 5 = 0 and id > 0 then"
        "  concat_ws(' ', transform(sequence(0, 7), j ->"
        "   substr(md5(cast(id - 1 as string) || 's0' || cast(j as string)), 1, 6)))"
        " else"
        "  concat_ws(' ', transform(sequence(0, 7), j ->"
        "   substr(md5(cast(id as string) || 's0' || cast(j as string)), 1, 6)))"
        " end,"
        " case when id = 7 then"
        "  concat_ws(' ', transform(sequence(0, 7), j ->"
        "   substr(md5(cast(id as string) || 's0' || cast(j as string)), 1, 6)))"
        " else"
        "  concat_ws(' ', transform(sequence(0, 7), j ->"
        "   substr(md5(cast(id as string) || 's1' || cast(j as string)), 1, 6)))"
        " end) as text",
    )
    key = ["doc_id", "chunk_idx"]
    a = segment_dedup(docs, segment_tokens=8, hash_fn="md5")
    b = segment_dedup(docs, segment_tokens=8, hash_fn="xxhash64")
    ra = sorted((r.doc_id, r.chunk_idx, r.chunk_text) for r in a.collect())
    rb = sorted((r.doc_id, r.chunk_idx, r.chunk_text) for r in b.collect())
    assert ra == rb
    dropped = 1000 - len(ra)
    # 99 cross-doc repeats (ids 5,10,...,495) + doc 7's internal repeat
    assert dropped == 100


def test_bloom_unseen_broadcast_sharded_equals_not_in(spark):
    """The r9 array-broadcast sharded form == plain LEFT ANTI, across
    shard counts, per-shard saturation (m_bits=64), and both residue
    forms. This is the 100 TB member of the family: each shard bitmap is
    ONE TorrentBroadcast of a dense numpy array that executors pull
    lazily per branch — no n_shards x k HashedRelation builds (the
    join-form's failure mode, which OOMed an 8 GB driver at 16M keys on
    the r9 scale curve)."""
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_unseen_broadcast_sharded,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(300)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(150, 450)]
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    for n_shards in (1, 4):
        for m_bits in (64, 1 << 12):
            for bres in (False, True):
                got = sorted(
                    r.key
                    for r in bloom_unseen_broadcast_sharded(
                        seen, cands, "key", n_shards=n_shards,
                        m_bits=m_bits, broadcast_residue=bres,
                    ).collect()
                )
                assert got == expected, (n_shards, m_bits, bres)


def test_bloom_broadcast_sharded_reuses_prebuilt_arrays(spark):
    """bitmap_arrays from bloom_bitmap_array_sharded is interchangeable
    with the internally-built one (the cross-generation amortized asset),
    and a wrong shard count is rejected loudly."""
    import pytest
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.operators.dedup import (
        bloom_bitmap_array_sharded,
        bloom_unseen_broadcast_sharded,
    )

    seen = spark.createDataFrame([Row(key=f"k{i}") for i in range(200)])
    cands = spark.createDataFrame(
        [Row(key=f"k{i}", payload=i) for i in range(100, 300)]
    )
    arrays = bloom_bitmap_array_sharded(seen, "key", 4, m_bits=1 << 10)
    got = sorted(
        r.key
        for r in bloom_unseen_broadcast_sharded(
            seen, cands, "key", n_shards=4, m_bits=1 << 10,
            bitmap_arrays=arrays,
        ).collect()
    )
    expected = sorted(
        r.key for r in cands.join(seen, "key", "left_anti").collect()
    )
    assert got == expected
    with pytest.raises(ValueError):
        bloom_unseen_broadcast_sharded(
            seen, cands, "key", n_shards=8, m_bits=1 << 10,
            bitmap_arrays=arrays,
        )
