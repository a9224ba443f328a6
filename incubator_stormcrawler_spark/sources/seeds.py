"""Seed injection — FileSpout + StringTabScheme
(core/.../spout/FileSpout.java:52,133-169;
core/.../util/StringTabScheme.java:28,31-62).

Line format: ``url[\\tkey=value]*``; blank/comment lines skipped
(FileSpout.java:147-149); repeated keys accumulate multi-values (the
Metadata contract). The whole thing is ``spark.read.text`` + native
splits — the reference's round-robin line sharding is Spark's file
partitioning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_seed_line_native(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Native-expression StringTabScheme: line → (url, metadata).

    metadata = MAP<STRING, ARRAY<STRING>> aggregated from ``k=v`` fields;
    repeated keys merge their values (multi-valued Metadata semantics).
    """
    line = F.trim(F.col(line_col))
    parts = F.split(line, "\t")
    url = F.element_at(parts, 1)
    kvs = F.filter(
        F.slice(parts, 2, 1_000_000),
        lambda p: F.instr(p, "=") > 0,
    )
    pairs = F.transform(
        kvs,
        lambda p: F.struct(
            F.substring_index(p, "=", 1).alias("k"),
            F.substr(p, F.instr(p, "=") + 1, F.lit(1 << 30)).alias("v"),
        ),
    )
    # group values by key: distinct keys → array_agg of matching values
    keys = F.array_distinct(F.transform(pairs, lambda s: s["k"]))
    metadata = F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(pairs, lambda s: s["k"] == k), lambda s: s["v"]
            ),
        ),
    )
    return (
        df.where((line != "") & ~line.startswith("#"))
        .select(url.alias("url"), metadata.alias("metadata"))
        .where(F.col("url").isNotNull() & (F.col("url") != ""))
    )


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed file(s) → DataFrame(url, metadata) ready for the frontier MERGE
    as DISCOVERED rows (SURVEY.md §3.2)."""
    return parse_seed_line_native(spark.read.text(path))
