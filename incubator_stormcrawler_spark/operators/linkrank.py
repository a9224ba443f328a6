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
