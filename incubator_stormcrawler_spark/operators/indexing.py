"""Sinks — the indexer side of the pipeline (SURVEY.md §2.9).

- ``IndexTable``: the OpenSearch/Solr/SQL IndexerBolt contract
  (external/opensearch/.../bolt/IndexerBolt.java:81-123) against a local
  versioned parquet table: upsert docs by doc id, apply the ``deletion``
  stream (DeletionBolt.java:53-58 — ERROR'd docs leave the index).
  On a cluster the same DataFrames go to ``df.write.format("opensearch")``
  or ``foreachBatch`` bulk writers; the projection and deletion semantics
  live here, the transport is swappable.
- ``ContentCache``: the S3 content cache (external/aws/.../s3/S3Cacher.java,
  S3CacheChecker.java): content-addressed store keyed by sha256(url);
  ``split_cached`` partitions a fetch batch into cache hits (skip refetch)
  and misses — expressed as a real join, exactly the "implicit join" the
  reference hides in a bolt (SURVEY.md §2.10 joins).
- ``write_jdbc``: SQL IndexerBolt (external/sql/.../IndexerBolt.java:39)
  as a thin JDBC writer, import/driver-gated.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import sha256_doc_id_expr


class _VersionedTable:
    """Same atomic snapshot scheme as streaming/frontier_table.py, schema-
    agnostic."""

    def __init__(self, path: str, ddl: str):
        self.path = path
        self.ddl = ddl
        os.makedirs(path, exist_ok=True)

    def _pointer(self):
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def read(self, spark: SparkSession) -> DataFrame:
        v = self.current_version()
        if v == 0:
            return spark.createDataFrame([], self.ddl)
        return spark.read.parquet(os.path.join(self.path, f"v{v:06d}"))

    def commit(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v{v:06d}"))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer())
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= v - 3:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
        return v


INDEX_DDL = "doc_id string, url string, title string, text string"


class IndexTable:
    """Document index with upsert + deletion semantics.

    doc id = sha256(url) (AbstractStatusUpdaterBolt.java:251-253 uses the
    same identity for status docs). Upsert = anti-join old against new ids
    then union — one shuffle, broadcast-able when the batch is small.
    """

    def __init__(self, path: str):
        self.table = _VersionedTable(path, INDEX_DDL)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)

    def upsert(self, docs: DataFrame) -> int:
        """docs: DataFrame(url, title, text) — newest wins per URL."""
        spark = docs.sparkSession
        new = docs.select(
            sha256_doc_id_expr(F.col("url")).alias("doc_id"),
            "url",
            F.col("title") if "title" in docs.columns else F.lit(None).alias("title"),
            F.col("text") if "text" in docs.columns else F.lit(None).alias("text"),
        ).dropDuplicates(["doc_id"])
        old = self.read(spark)
        kept = old.join(new.select("doc_id"), "doc_id", "left_anti")
        return self.table.commit(kept.unionByName(new))

    def delete(self, urls: DataFrame) -> int:
        """Apply the deletion stream (DeletionBolt): drop docs whose URL
        went terminal-ERROR."""
        spark = urls.sparkSession
        ids = urls.select(sha256_doc_id_expr(F.col("url")).alias("doc_id"))
        return self.table.commit(
            self.read(spark).join(ids, "doc_id", "left_anti")
        )


CACHE_DDL = "cache_key string, url string, content binary, stored_at string"


class ContentCache:
    """Content-addressed page cache (S3Cacher/S3CacheChecker semantics):
    store fetched bytes once, skip refetching cached URLs."""

    def __init__(self, path: str):
        self.table = _VersionedTable(path, CACHE_DDL)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)

    def store(self, pages: DataFrame, stored_at: str = "2024-01-15") -> int:
        new = pages.select(
            sha256_doc_id_expr(F.col("url")).alias("cache_key"),
            "url",
            "content",
            F.lit(stored_at).alias("stored_at"),
        ).dropDuplicates(["cache_key"])
        old = self.read(pages.sparkSession)
        kept = old.join(new.select("cache_key"), "cache_key", "left_anti")
        return self.table.commit(kept.unionByName(new))

    def split_cached(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(hits, misses): hits carry cached content — the S3CacheChecker
        join; misses proceed to the fetcher."""
        spark = batch.sparkSession
        cache = self.read(spark).select(
            "cache_key", F.col("content").alias("cached_content")
        )
        keyed = batch.withColumn(
            "cache_key", sha256_doc_id_expr(F.col("url"))
        )
        hits = (
            keyed.join(F.broadcast(cache), "cache_key")
            .drop("cache_key")
            .withColumnRenamed("cached_content", "content")
        )
        misses = keyed.join(cache.select("cache_key"), "cache_key", "left_anti").drop(
            "cache_key"
        )
        return hits, misses


def write_console(docs: DataFrame, n: int = 20) -> None:
    """StdOutIndexer (core/.../indexing/StdOutIndexer.java:35)."""
    docs.show(n, truncate=80)


def write_jdbc(
    docs: DataFrame, jdbc_url: str, table: str, mode: str = "append", **options
) -> None:
    """SQL IndexerBolt (external/sql/.../IndexerBolt.java:39): plain JDBC
    batch writes — Spark batches per partition like the reference's 1000-row
    insert batches. Requires a JDBC driver on the classpath; raises a clear
    error otherwise."""
    docs.write.mode(mode).options(**options).jdbc(jdbc_url, table)
