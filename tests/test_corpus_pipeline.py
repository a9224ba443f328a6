"""End-to-end corpus release pipeline — the LLM-training-data user
story composed from the individual operators, with exact row accounting
at every stage: raw crawl text in, quality-filtered / exact-deduped /
near-deduped (production xxhash64 MinHash) / decontaminated packed
shards out. Each operator has its own oracle or unit tests; THIS test
pins that they compose — column contracts line up, keepers survive,
and nothing is dropped or duplicated across stage boundaries."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.operators.corpus import (
    dedup_clusters,
    decontaminate,
    pack_shards,
    quality_filter,
)
from incubator_stormcrawler_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
)


def _good_text(i: int) -> str:
    return " ".join(f"good{i}x{j}" for j in range(40))


def _corpus(spark):
    eval_run = " ".join(f"eval{j}" for j in range(10))
    rows = (
        # 100 clean keepers, pairwise-disjoint vocabulary
        [Row(doc_id=i, text=_good_text(i)) for i in range(100)]
        # 20 repetition spam (uniq_ratio 1/30) -> quality drop
        + [Row(doc_id=100 + i, text=" ".join(["spam"] * 30))
           for i in range(20)]
        # 10 too-short -> quality drop
        + [Row(doc_id=120 + i, text="tiny doc with five tokens")
           for i in range(10)]
        # 20 exact duplicates of keepers 0..19 -> exact-dedup drop
        + [Row(doc_id=200 + i, text=_good_text(i)) for i in range(20)]
        # 10 near duplicates of keepers 0..9 (last 2 tokens differ)
        + [Row(doc_id=300 + i,
               text=" ".join(
                   [f"good{i}x{j}" for j in range(38)] + ["mut1", "mut2"]
               ))
           for i in range(10)]
        # 5 contaminated: 30 unique tokens + a 10-token eval run
        + [Row(doc_id=400 + i,
               text=" ".join(f"cont{i}x{j}" for j in range(30))
               + " " + eval_run)
           for i in range(5)]
    )
    eval_docs = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(f"eval{j}" for j in range(20)))]
    )
    return spark.createDataFrame(rows), eval_docs


def test_corpus_release_pipeline(spark):
    docs, eval_docs = _corpus(spark)
    assert docs.count() == 165

    # 1. heuristic quality gate: spam + short drop, everything else keeps
    q = quality_filter(docs)
    kept = docs.join(
        q.where(F.col("keep")).select("doc_id"), "doc_id"
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert all(100 <= d < 130 for d in
               {r.doc_id for r in docs.select("doc_id").collect()}
               - kept_ids)
    assert len(kept_ids) == 135  # 165 - 20 spam - 10 short

    # 2. exact dedup: copies collapse onto the min-id keeper
    from incubator_stormcrawler_spark.operators.dedup import fingerprint_expr

    groups = exact_duplicates(kept)
    loser_ids = {
        r.doc_id
        for r in kept.select(
            "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
        )
        .join(groups, "fingerprint")
        .where(F.col("doc_id") != F.col("keeper"))
        .collect()
    }
    assert loser_ids == {200 + i for i in range(20)}
    survivors = kept.join(
        spark.createDataFrame(
            [Row(doc_id=d) for d in sorted(loser_ids)]
        ),
        "doc_id",
        "left_anti",
    )
    assert survivors.count() == 115

    # 3. near-dup dedup in PRODUCTION hash mode: mutated copies cluster
    #    with their source; keeper = min doc_id = the original
    pairs = lsh_candidate_pairs(
        survivors, num_hashes=8, band_rows=2, min_est_sim=0.7,
        hash_fn="xxhash64",
    )
    clusters = dedup_clusters(pairs)
    near_losers = {
        r.doc_id
        for r in clusters.where(
            F.col("doc_id") != F.col("cluster")
        ).collect()
    }
    assert near_losers == {300 + i for i in range(10)}
    survivors = survivors.join(
        spark.createDataFrame([Row(doc_id=d) for d in sorted(near_losers)]),
        "doc_id",
        "left_anti",
    )
    assert survivors.count() == 105

    # 4. decontamination: the planted eval run (10 tokens -> three
    #    8-grams) flags exactly the contaminated docs
    verdicts = decontaminate(survivors, eval_docs, n=8)
    contaminated = {
        r.doc_id
        for r in verdicts.where(F.col("contaminated")).collect()
    }
    assert contaminated == {400 + i for i in range(5)}
    release = survivors.join(
        spark.createDataFrame([Row(doc_id=d) for d in sorted(contaminated)]),
        "doc_id",
        "left_anti",
    )
    assert release.count() == 100
    assert {r.doc_id for r in release.select("doc_id").collect()} == set(
        range(100)
    )

    # 5. shard packing: exactly one row per released doc, offsets tile
    #    [0, total_tokens) with no gaps or overlaps, shard = offset//budget
    packed = pack_shards(release, tokens_per_shard=500).collect()
    assert len(packed) == 100
    assert all(r.n_tokens == 40 for r in packed)
    offsets = sorted(r.global_offset for r in packed)
    assert offsets == [40 * i for i in range(100)]
    assert all(
        r.shard_id == r.global_offset // 500 for r in packed
    )
    assert {r.shard_id for r in packed} == set(range(8))  # 4000 tokens
