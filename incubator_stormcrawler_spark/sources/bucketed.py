"""Bucketed-table layout: the co-located join technique for repeated
fact-to-fact joins at 100 TB.

A shuffle join on (key) moves BOTH sides across the cluster every time the
join runs. When the same join recurs (frontier ⋈ status history every
generation, corpus ⋈ dedup verdicts every pipeline pass), writing both
tables bucketed by the join key with the SAME bucket count makes Spark's
scan expose a compatible output partitioning — the join plans with NO
Exchange on either side, forever after, at the cost of one bucketed write.

The reference's analog is its per-backend routing (OpenSearch `_routing`,
SQL bucket columns — e.g. external/opensearch/.../StatusUpdaterBolt.java's
routing by politeness key); here the layout lives in the table format
itself and Catalyst consumes it declaratively.

`tests/test_plans.py::test_bucketed_join_has_no_exchange` asserts the
zero-shuffle plan actually materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by ``key``.

    Both sides of a recurring join must use the SAME ``num_buckets``;
    Spark then treats the bucket id as a co-partitioning and elides the
    exchange. ``path`` keeps the data outside the default warehouse
    (external table), so callers control storage layout and cleanup.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (plain
    ``spark.read.parquet`` on the path would lose the bucketing spec and
    reintroduce the shuffle)."""
    return spark.table(table)
