"""Link analysis — PageRank-style ranking over the crawl's link graph.

Crawl engines prioritize the frontier by link evidence (OPIC/PageRank
descendants); the reference leaves prioritization to ``nextFetchDate``
ordering, so this is a beyond-reference operator: feed the outlinks table
(source_url, target_url) in, get a rank per URL to blend into the frontier
query's ordering.

Spark shape: the classic iterative join — ranks ⋈ edges on src, grouped
sum on dst — run for a fixed number of iterations. Each iteration is one
shuffle; the edges DataFrame is reused across iterations (cache it for
real workloads), and a fixed iteration count keeps the computation
deterministic and oracle-checkable (the DuckDB oracle unrolls the same
iterations as chained CTEs).

Variant: unnormalized PageRank, ``r_{k+1}(v) = (1-d) + d·Σ_{u→v}
r_k(u)/outdeg(u)``; nodes without in-links settle at ``1-d``. Dangling
nodes (no out-links) contribute nothing — matching the plain formulation
an unrolled SQL oracle can express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_rank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous updates from rank 1.0."""
    # Pre-join rank-independent state once and cache: each iteration reuses
    # (edges ⋈ outdeg) and nodes; ranks localCheckpoint per iteration to cut
    # lineage — without it, iteration k replays all k-1 predecessors.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e.join(outdeg, "src").cache()
    ranks = nodes.withColumn("rank", F.lit(1.0))

    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round(F.col("rank"), 6).alias("rank"))


def unrolled_pagerank_sql(
    edges_cte: str, iterations: int = 5, damping: float = 0.85
) -> str:
    """The DuckDB oracle: the same fixed-iteration PageRank unrolled as
    chained CTEs over an ``edges(src, dst)`` CTE supplied by the caller."""
    d = damping
    parts = [
        f"{edges_cte}",
        "e AS (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0 AS rank FROM nodes)",
    ]
    for k in range(iterations):
        parts.append(
            f"c{k} AS (SELECT e.dst AS node, sum(r{k}.rank / outdeg.outdeg) AS contrib"
            f" FROM e JOIN r{k} ON e.src = r{k}.node"
            f" JOIN outdeg ON e.src = outdeg.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT nodes.node,"
            f" {1.0 - d} + {d} * coalesce(c{k}.contrib, 0.0) AS rank"
            f" FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
    )


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — the complementary link
    signal to PageRank: a page is a good AUTHORITY if good hubs point at
    it, a good HUB if it points at good authorities. Frontier blending
    uses authority for content pages, hub for index/listing pages.

    Deliberately UNNORMALIZED with a small fixed iteration count: starting
    from hub=1, every score stays an exact INTEGER (auth = sum of
    in-neighbor hubs, hub = sum of out-neighbor auths), so the computation
    is bit-identical on any engine, any partitioning — no floating-point
    normalization sums to drift. Rankings are invariant to the missing
    normalization (it's a positive scalar per iteration); with default
    iterations=2 scores are bounded by ~deg^4, far inside bigint range.

    Shape: per iteration two edge⋈score joins + partial-aggregable sums —
    the same one-shuffle-per-side pattern as link_rank; scores
    localCheckpoint per iteration to cut lineage.
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    hub = nodes.withColumn("h", F.lit(1).cast("bigint"))
    auth = None
    for _ in range(iterations):
        auth = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("n"))
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            nodes.join(auth, nodes.node == auth.n, "left")
            .select(
                "node", F.coalesce(F.col("a"), F.lit(0)).cast("bigint").alias("a")
            )
            .localCheckpoint(eager=False)
        )
        hub = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("n"))
            .agg(F.sum("a").alias("h"))
        )
        hub = (
            nodes.join(hub, nodes.node == hub.n, "left")
            .select(
                "node", F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("h")
            )
            .localCheckpoint(eager=False)
        )
    return auth.join(hub, "node").select(
        "node", F.col("a").alias("authority"), F.col("h").alias("hub")
    )


def unrolled_hits_sql(edges_cte: str, iterations: int = 2) -> str:
    """The identical unnormalized-integer HITS unrolled as chained CTEs."""
    if iterations < 1:
        raise ValueError("unrolled_hits_sql: iterations must be >= 1")
    parts = [
        edges_cte,
        "e AS (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)",
    ]
    for it in range(iterations):
        parts.append(
            f"a{it + 1} AS (SELECT nodes.node,"
            f" CAST(coalesce(s.a, 0) AS BIGINT) AS a FROM nodes"
            f" LEFT JOIN (SELECT e.dst AS node, sum(h{it}.h) AS a"
            f" FROM e JOIN h{it} ON e.src = h{it}.node GROUP BY e.dst) s"
            f" USING (node))"
        )
        parts.append(
            f"h{it + 1} AS (SELECT nodes.node,"
            f" CAST(coalesce(s.h, 0) AS BIGINT) AS h FROM nodes"
            f" LEFT JOIN (SELECT e.src AS node, sum(a{it + 1}.a) AS h"
            f" FROM e JOIN a{it + 1} ON e.dst = a{it + 1}.node"
            f" GROUP BY e.src) s USING (node))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT a{iterations}.node, a{iterations}.a AS authority,
       h{iterations}.h AS hub
FROM a{iterations} JOIN h{iterations} USING (node)
"""
    )
