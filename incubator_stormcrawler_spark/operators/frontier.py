"""Frontier query — the reference's core "query": which URLs are due next,
diversified per politeness key.

Reference semantics (all equivalent):
  - SQL spout window query: ``rank() over (partition by host order by
    nextfetchdate desc, url) ... where ranking <= maxDocsPerBucket ...
    LIMIT maxNumResults`` (external/sql/.../SQLSpout.java:120-139)
  - OpenSearch terms-agg + top-N per bucket + optional global bucket sort
    (external/opensearch/.../persistence/AggregationSpout.java:99-181)

Spark-first shape: a single Window ``row_number`` over the frontier scan.
At 100 TB the scan is the cost center, so the operator is written to let
Catalyst push ``next_fetch_date <= now`` and the bucket-shard predicate into
the parquet/Delta scan (PushedFilters), prune to the needed columns, and do
the grouped top-k with one shuffle on ``key``. With AQE, skewed hosts
(Zipf-distributed) split automatically. If the frontier table is stored
partitioned by ``bucket`` (pmod(hash(key), n) — mirrors
sql/StatusUpdaterBolt.java:157-163), the shard predicate becomes partition
pruning and each generation touches only its shard's files.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def frontier_topk(
    frontier: DataFrame,
    now: datetime | str,
    max_per_bucket: int = 5,
    max_results: int | None = 100,
    key_col: str = "key",
    bucket: int | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Grouped top-k over the frontier: up to ``max_per_bucket`` URLs per
    politeness key, earliest ``next_fetch_date`` first, overall capped at
    ``max_results``.

    Ties broken by ``url`` so results are deterministic (the reference orders
    by ``(nextfetchdate, url)`` too — SQLSpout.java:126-131; note the
    reference sorts nextfetchdate DESC within a bucket only as an OpenSearch
    artifact; the SQL spout's documented intent is "oldest due first", which
    is what we implement).

    ``bucket``/``num_buckets``: shard the query like the reference's
    spout-per-bucket sharding (SQLSpout.java:84-90) — lets N concurrent
    generations each own a disjoint frontier shard.

    Skew: on Spark ≥ 3.5 this plain declarative form is ALREADY
    skew-proof — Catalyst's InsertWindowGroupLimit rewrites the
    rank-filter into a PARTIAL WindowGroupLimit before the exchange, so
    every map task keeps only ``max_per_bucket`` rows per key locally
    and a mega-host (95% of a 64M-row frontier on one key in the r7
    A/B) ships ≤ k rows per map task across the shuffle — the salting
    trick, engine-native. Plan-asserted in tests/test_plans.py; measured
    faster than the hand-salted two-phase variant at every scale tried
    (SCALING.json `skewed_topk_ab`). ``frontier_topk_salted`` remains
    for engines without the rule.
    """
    due = frontier.where(F.col("next_fetch_date") <= F.lit(now))
    if bucket is not None:
        due = due.where(F.col("bucket") == F.lit(bucket))
    elif num_buckets is not None:
        due = due.where(F.col("bucket") < F.lit(num_buckets))

    w = Window.partitionBy(key_col).orderBy(
        F.col("next_fetch_date").asc(), F.col("url").asc()
    )
    ranked = due.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= F.lit(max_per_bucket)
    )
    if max_results is not None:
        # Global cap needs a total order; (next_fetch_date, url) keeps it
        # deterministic. At scale this is a TakeOrderedAndProject, not a full
        # sort: Spark plans limit+orderBy as a per-partition top-k + merge.
        ranked = ranked.orderBy(
            F.col("next_fetch_date").asc(), F.col("url").asc()
        ).limit(max_results)
    return ranked


def frontier_topk_salted(
    frontier: DataFrame,
    now: datetime | str,
    max_per_bucket: int = 5,
    max_results: int | None = 100,
    key_col: str = "key",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant grouped top-k: identical result to ``frontier_topk``,
    different physical plan.

    A Zipf-heavy frontier has hosts with millions of due URLs; a plain
    window puts each whole host on one task. Two-phase instead:

      1. local top-k per (key, salt) where salt = a deterministic hash of
         the url into ``salt_buckets`` — the giant host's queue splits
         across ``salt_buckets`` tasks, each keeping only k rows;
      2. global top-k per key over the ≤ k·salt_buckets survivors.

    Phase 1 shuffles on (key, salt) — skew bounded by 1/salt_buckets;
    phase 2 shuffles ≤ k·salt_buckets rows per key. Correct because the
    per-key top-k is contained in the union of per-salt top-ks.

    SUPERSEDED on Spark ≥ 3.5: InsertWindowGroupLimit gives the plain
    ``frontier_topk`` a map-side partial top-k per key (the same trick,
    without this variant's second shuffle), and the r7 skew A/B measured
    plain FASTER at 16M and 64M rows with 95% of URLs on one host
    (SCALING.json). Kept for engines without the rule, and as the
    explicit form of the plan the rule synthesizes.
    """
    due = frontier.where(F.col("next_fetch_date") <= F.lit(now))
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    w_local = Window.partitionBy(key_col, "salt").orderBy(
        F.col("next_fetch_date").asc(), F.col("url").asc()
    )
    survivors = (
        due.withColumn("salt", salt)
        .withColumn("lrn", F.row_number().over(w_local))
        .where(F.col("lrn") <= F.lit(max_per_bucket))
        .drop("salt", "lrn")
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("next_fetch_date").asc(), F.col("url").asc()
    )
    ranked = survivors.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= F.lit(max_per_bucket)
    )
    if max_results is not None:
        ranked = ranked.orderBy(
            F.col("next_fetch_date").asc(), F.col("url").asc()
        ).limit(max_results)
    return ranked


def frontier_topk_bucket_ordered(
    frontier: DataFrame,
    now: datetime | str,
    max_buckets: int = 10,
    max_per_bucket: int = 5,
    key_col: str = "key",
) -> DataFrame:
    """OpenSearch AggregationSpout semantics (AggregationSpout.java:140-154):
    choose the ``max_buckets`` most-urgent politeness keys (ordered by their
    earliest due date), then take up to ``max_per_bucket`` URLs from each.

    Two partial-aggregable passes: per-key min(next_fetch_date) → top-N keys
    (a tiny broadcast), then the grouped top-k restricted to those keys —
    the per-key aggregate shuffles O(#keys), never O(#rows).
    """
    due = frontier.where(F.col("next_fetch_date") <= F.lit(now))
    urgency = (
        due.groupBy(key_col)
        .agg(F.min("next_fetch_date").alias("min_nfd"))
        .orderBy(F.col("min_nfd").asc(), F.col(key_col).asc())
        .limit(max_buckets)
        .select(key_col)
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("next_fetch_date").asc(), F.col("url").asc()
    )
    return (
        due.join(F.broadcast(urgency), key_col)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.lit(max_per_bucket))
    )


def apply_host_budget(
    frontier: DataFrame, max_fetched_per_host: int, key_col: str = "key"
) -> DataFrame:
    """Crawl-budget governor: hosts that already have ≥ N FETCHED pages
    stop receiving new DISCOVERED fetches (their refetches continue).

    The per-host count is a partial-aggregable groupBy; the budget check
    broadcasts (#hosts rows) back onto the frontier — no frontier shuffle.
    This is the operational knob crawls use to stop hub sites from eating
    the whole fetch budget.
    """
    counts = (
        frontier.where(F.col("status") == "FETCHED")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_fetched"))
        .where(F.col("n_fetched") >= max_fetched_per_host)
        .select(key_col)
    )
    over_budget = F.broadcast(counts.withColumn("over", F.lit(True)))
    return (
        frontier.join(over_budget, key_col, "left")
        .where(
            F.col("over").isNull() | (F.col("status") != "DISCOVERED")
        )
        .drop("over")
    )


def status_counts(frontier: DataFrame) -> DataFrame:
    """Per-status URL counts — the reference's ``StatusMetricsBolt``
    (external/opensearch/.../metrics/StatusMetricsBolt.java): periodic
    ``count(*) group by status`` over the status store.

    Map-side partial aggregation makes this one narrow shuffle of ≤5 rows
    per partition regardless of frontier size.
    """
    return frontier.groupBy("status").agg(F.count(F.lit(1)).alias("num_urls"))


def next_fetch_histogram(frontier: DataFrame, bucket_minutes: int = 60) -> DataFrame:
    """Due-date histogram: how many URLs become due per time bucket.

    Operational query for sizing generations (the reference sizes via
    ``max.buckets`` × ``urls.per.bucket``; at 100 TB you want to know the
    due-backlog before picking batch size).
    """
    secs = bucket_minutes * 60
    return (
        frontier.where(F.col("status") != F.lit("ERROR"))
        .groupBy(
            (
                F.floor(F.unix_timestamp(F.col("next_fetch_date")) / F.lit(secs))
                * F.lit(secs)
            )
            .cast("timestamp")
            .alias("due_bucket")
        )
        .agg(F.count(F.lit(1)).alias("num_urls"))
    )


def frontier_topk_rank_ordered(
    frontier: DataFrame,
    ranks: DataFrame,
    now: datetime | str,
    max_buckets: int = 10,
    max_per_bucket: int = 5,
    key_col: str = "key",
    rank_col: str = "rank",
    node_col: str = "node",
    max_results: int | None = None,
) -> DataFrame:
    """Link-evidence-prioritized frontier: choose the ``max_buckets``
    politeness keys with the HIGHEST rank score (PageRank / TrustRank /
    OPIC over the host graph), then the grouped top-k within those keys —
    the link-analysis twin of ``frontier_topk_bucket_ordered``'s urgency
    ordering. Reference analog: the AggregationSpout's configurable
    bucket-sort field (AggregationSpout.java:140-154) and
    PriorityURLBuffer's re-prioritized key release (urlbuffer/
    PriorityURLBuffer.java:40) — theirs reorders by observed acks, ours
    by computed link evidence, which is how OPIC-style crawlers focus
    fetch capacity on high-value hosts.

    Keys absent from ``ranks`` score 0 (discovered-but-unranked hosts
    still crawl, last). Scale shape: per-key min is NOT needed — the
    bucket choice is one broadcast-sized join of the key set against the
    rank table (#hosts rows, partial-aggregable distinct), then the
    windowed top-k runs only over the chosen keys; the frontier itself
    is never shuffled for the bucket choice.

    ``max_results`` caps the generation like the plain ``frontier_topk``
    path — without it the batch is max_buckets × max_per_bucket and a
    smaller configured generation size would be silently exceeded.
    Higher-ranked hosts win the cap (rank desc, then key/rn/url for a
    total deterministic order); the cap runs over the already-bounded
    ≤ max_buckets·max_per_bucket rows, so it is a TakeOrderedAndProject
    on a tiny relation, never a global sort of the frontier.
    """
    due = frontier.where(F.col("next_fetch_date") <= F.lit(now))
    keys = due.select(key_col).distinct()
    scored = (
        keys.join(
            ranks.select(
                F.col(node_col).alias(key_col),
                F.col(rank_col).alias("__key_rank"),
            ),
            key_col,
            "left",
        )
        .select(
            key_col,
            F.coalesce(F.col("__key_rank"), F.lit(0.0)).alias("key_rank"),
        )
        .orderBy(F.col("key_rank").desc(), F.col(key_col).asc())
        .limit(max_buckets)
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("next_fetch_date").asc(), F.col("url").asc()
    )
    out = (
        due.join(F.broadcast(scored), key_col)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.lit(max_per_bucket))
        .withColumn("key_rank", F.round(F.col("key_rank"), 6))
    )
    if max_results is not None:
        out = out.orderBy(
            F.col("key_rank").desc(),
            F.col(key_col).asc(),
            F.col("rn").asc(),
            F.col("url").asc(),
        ).limit(max_results)
    return out


def host_health(
    frontier: DataFrame,
    now: datetime | str,
    key_col: str = "key",
) -> DataFrame:
    """Per-host operational dashboard row — the host-grained companion to
    StatusMetricsBolt's global per-status counts (external/opensearch/
    .../metrics/StatusMetricsBolt.java): url count, status mix, error
    escalation pressure (max error_count vs the max.fetch.errors=3
    threshold), due backlog and earliest due date. The table crawl
    operators actually page through when a host misbehaves.

    ONE partial-aggregable groupBy on the politeness key — host
    cardinality output, any scale; no joins, no windows.
    """
    is_due = F.col("next_fetch_date") <= F.lit(now)
    return frontier.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum((F.col("status") == "FETCHED").cast("int")).alias("n_fetched"),
        F.sum((F.col("status") == "DISCOVERED").cast("int")).alias(
            "n_discovered"
        ),
        F.sum((F.col("status") == "FETCH_ERROR").cast("int")).alias(
            "n_fetch_error"
        ),
        F.sum((F.col("status") == "ERROR").cast("int")).alias("n_error"),
        F.max("error_count").alias("max_error_count"),
        F.sum(is_due.cast("int")).alias("n_due"),
        F.min(F.when(is_due, F.col("next_fetch_date"))).alias("next_due"),
    )


def fetch_forecast(
    frontier: DataFrame,
    delays: DataFrame,
    now: datetime | str,
    horizon_s: int = 300,
    default_delay_s: float = 5.0,
    key_col: str = "key",
) -> DataFrame:
    """Politeness-limited throughput forecast: how many pages can each
    host actually yield in the next ``horizon_s`` seconds?

    The reference serializes fetches per politeness key and honors
    robots crawl-delay (FetcherBolt.java:191-245 — one in-flight fetch
    per queue, ``fetcher.server.delay``/robots ``Crawl-delay`` between
    them), so a host's ceiling over a horizon is the fetch train
    t = 0, d, 2d, …: ``floor(horizon/d) + 1`` fetches — regardless of
    how many URLs are due. The realizable forecast per host is
    ``least(due_backlog, ceiling)``; summing it is the honest generation
    size under politeness (the due histogram alone overcounts hot
    hosts). Crawl operators use exactly this to pick generation cadence
    and spot delay-bound hosts (where due >> ceiling, the host — not
    the cluster — is the bottleneck).

    ``delays`` is a (key, crawl_delay_s) dim — robots-derived, host
    cardinality — BROADCAST into the due-count aggregate; hosts missing
    from it fall back to ``default_delay_s`` (the reference's
    ``fetcher.server.delay``). Plan: one partial-aggregable groupBy over
    the frontier + one broadcast left join; host-cardinality output at
    any scale.
    """
    due = (
        frontier.where(F.col("next_fetch_date") <= F.lit(now))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_due"))
    )
    d = F.coalesce(F.col("crawl_delay_s"), F.lit(float(default_delay_s)))
    # robots 'Crawl-delay: 0' (and malformed negatives) mean NO politeness
    # bound — capacity is the backlog itself, never a division by zero
    # (ANSI mode would otherwise fail the whole generation-sizing query
    # on one bad dim row) and never negative
    ceiling = F.when(
        d <= 0, F.col("n_due")
    ).otherwise(
        (F.floor(F.lit(float(horizon_s)) / d) + F.lit(1)).cast("bigint")
    )
    return due.join(F.broadcast(delays), key_col, "left").select(
        key_col,
        "n_due",
        d.alias("crawl_delay_s"),
        ceiling.alias("capacity"),
        F.least(F.col("n_due"), ceiling).alias("forecast"),
    )
