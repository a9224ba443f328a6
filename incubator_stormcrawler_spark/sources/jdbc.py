"""JDBC frontier store and indexer sink — the reference's ``external/sql``
module, re-expressed Spark-first and exercised end-to-end against the
embedded Derby that ships with Spark.

Reference parity (provenance, not copied code):

- **SQLSpout** (external/sql/.../SQLSpout.java:120-140): a ranked window
  query over the ``urls`` table — ``rank() over (partition by host order by
  nextfetchdate desc, url)`` with a ``nextfetchdate <= now`` filter, an
  optional ``bucket = N`` shard constraint, ``maxDocsPerBucket`` and a
  global ``LIMIT``. Here the table is read through ``spark.read.jdbc``
  partitioned on ``bucket`` (one DB cursor per shard — the exact role of
  the reference's one-spout-per-bucket deployment) and the SAME
  ``frontier_topk`` operator the parquet frontier uses runs on top, so the
  query semantics live in one place.
- **StatusUpdaterBolt** (external/sql/.../StatusUpdaterBolt.java:103-110):
  per-row ``REPLACE INTO`` / ``INSERT IGNORE`` batches. Spark JDBC has no
  upsert, and row-at-a-time upserts are the wrong shape for a bulk engine
  anyway: the store merges updates into the frontier with
  ``merge_status_updates`` (one distributed plan) and commits the merged
  table via a staged table + ``RENAME TABLE`` swap — the SQL analogue of
  the parquet ``FrontierTable``'s versioned-snapshot pointer flip. Readers
  mid-swap see the old complete table, never a half-written one.
- **IndexerBolt** (external/sql/.../IndexerBolt.java:90-120) and
  **MetricsConsumer** (external/sql/.../metrics/MetricsConsumer.java:49-60):
  batched inserts into an index/metrics table — ``write_jdbc`` in
  ``operators/indexing.py`` (Spark batches per partition, like the
  reference's 1000-row insert batches).

Scale notes. The partitioned read (``partitionColumn=bucket``) is what
makes this a 1000-executor pattern: N concurrent range-scans against the
DB instead of one cursor funneling the whole table through the driver.
Filter pushdown applies — ``frontier_topk``'s ``next_fetch_date <= now``
predicate reaches the DB as a WHERE clause on the indexed ``nextfetchdate``
column (tableCreation.script:38 adds that index), so a mostly-not-due
frontier transfers only the due fraction. The staged-swap commit writes
with per-partition parallelism. The real bottleneck at 100 TB is the DB
itself — the reference's own docs steer big crawls to OpenSearch; this
backend exists for the SQL-deployment parity case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import NUM_FRONTIER_BUCKETS

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# Mirrors external/sql/tableCreation.script:26-34 (url PK, status,
# nextfetchdate, bucket, host) plus the engine's error_count escalation
# column (the reference keeps the error count inside serialized metadata;
# a typed column lets the DB index and the merge push it down).
FRONTIER_TABLE_DDL = (
    "url VARCHAR(2048) NOT NULL PRIMARY KEY, "
    "status VARCHAR(16), "
    "nextfetchdate TIMESTAMP, "
    "error_count INT, "
    "host VARCHAR(256), "
    "bucket INT"
)

# engine column <-> SQL column (reference names: nextfetchdate, host)
_TO_SQL = {"next_fetch_date": "nextfetchdate", "key": "host"}
_FROM_SQL = {v: k for k, v in _TO_SQL.items()}


def _rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    for a, b in mapping.items():
        if a in df.columns:
            df = df.withColumnRenamed(a, b)
    return df


class JdbcFrontierStore:
    """Crawl frontier persisted in a JDBC database.

    ``read`` → DataFrame (engine column names), partitioned on ``bucket``;
    ``commit`` → staged-table atomic swap. DDL helpers use a direct
    ``java.sql.DriverManager`` connection through the running JVM — no
    extra Python DB driver needed.
    """

    def __init__(
        self,
        spark: SparkSession,
        jdbc_url: str,
        table: str = "urls",
        driver: str = DERBY_DRIVER,
        num_partitions: int = 4,
    ):
        self.spark = spark
        self.jdbc_url = jdbc_url
        self.table = table
        self.driver = driver
        self.num_partitions = num_partitions

    # ---- DDL through the JVM ------------------------------------------

    def _connect(self):
        """One JVM-side connection path for every non-Spark statement:
        ``Class.forName(self.driver)`` first (DriverManager's service
        loader misses drivers that don't self-register — Derby happens to,
        but the DataFrame read/write paths already pass ``driver``
        explicitly and the raw paths must match), then getConnection."""
        jvm = self.spark.sparkContext._jvm
        jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.jdbc_url)

    def _execute(self, *statements: str, transactional: bool = False) -> None:
        conn = self._connect()
        try:
            if transactional:
                conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                for sql in statements:
                    st.execute(sql)
                st.close()
                if transactional:
                    conn.commit()
            except Exception:
                if transactional:
                    # roll back so close() doesn't raise ERROR 25001 over
                    # an open transaction and mask the real failure
                    try:
                        conn.rollback()
                    except Exception:
                        pass
                raise
        finally:
            conn.close()

    def _table_exists(self, name: str) -> bool:
        conn = self._connect()
        try:
            rs = conn.getMetaData().getTables(None, None, name.upper(), None)
            found = rs.next()
            rs.close()
            return found
        finally:
            conn.close()

    def create(self) -> None:
        """CREATE TABLE mirroring tableCreation.script:26-38 (indexes on
        bucket + nextfetchdate; Derby auto-indexes the PK)."""
        self._execute(
            f"CREATE TABLE {self.table} ({FRONTIER_TABLE_DDL})",
            f"CREATE INDEX {self.table}_b ON {self.table} (bucket)",
            f"CREATE INDEX {self.table}_t ON {self.table} (nextfetchdate)",
        )

    # ---- read / write --------------------------------------------------

    def read(self) -> DataFrame:
        """Partitioned parallel scan: one range-scan per bucket slice, the
        Spark analogue of SQLSpout.java:85-93's one-instance-per-bucket
        sharding. Predicates pushed by later operators reach the DB."""
        df = self.spark.read.jdbc(
            self.jdbc_url,
            self.table,
            column="bucket",
            lowerBound=0,
            upperBound=NUM_FRONTIER_BUCKETS,
            numPartitions=self.num_partitions,
            properties={"driver": self.driver},
        )
        # Derby reports unquoted identifiers uppercase; engine names are
        # lowercase
        df = df.toDF(*[c.lower() for c in df.columns])
        return _rename(df, _FROM_SQL)

    def seed(self, frontier: DataFrame) -> None:
        """Initial load (the reference seeds via an injector topology)."""
        if not self._table_exists(self.table):
            self.create()
        _rename(frontier, _TO_SQL).write.mode("append").option(
            "driver", self.driver
        ).option("truncate", "true").jdbc(self.jdbc_url, self.table)

    def commit(self, merged: DataFrame) -> None:
        """Replace the frontier with ``merged`` atomically.

        Spark JDBC cannot upsert (StatusUpdaterBolt.java:108's REPLACE
        INTO), and overwrite-in-place would truncate the very table the
        lazy ``merged`` plan still reads. Stage-and-swap instead:
        write to ``<table>_staging``, then ``RENAME TABLE`` twice. The
        rename pair is two catalog operations — a reader sees the old or
        the new table, never a partial write.
        """
        staging, old = f"{self.table}_staging", f"{self.table}_old"
        for t in (staging, old):
            if self._table_exists(t):
                self._execute(f"DROP TABLE {t}")
        self._execute(f"CREATE TABLE {staging} ({FRONTIER_TABLE_DDL})")
        _rename(merged, _TO_SQL).select(
            "url", "status", "nextfetchdate", "error_count", "host", "bucket"
        ).write.mode("append").option("driver", self.driver).jdbc(
            self.jdbc_url, staging
        )
        self._execute(
            f"RENAME TABLE {self.table} TO {old}",
            f"RENAME TABLE {staging} TO {self.table}",
            f"DROP TABLE {old}",
        )

    # ---- exactly-once batch bookkeeping --------------------------------

    def _ensure_meta(self) -> None:
        meta = f"{self.table}_meta"
        if not self._table_exists(meta):
            self._execute(
                f"CREATE TABLE {meta} "
                "(k INT PRIMARY KEY, batch_id VARCHAR(200))",
                f"INSERT INTO {meta} VALUES (0, NULL)",
            )

    def last_batch_id(self) -> str | None:
        """Batch id recorded by the last merge_commit transaction (None
        before any batch-tagged commit).

        Single-slot scope (same one-writer sequential contract as
        ``FrontierTable.commit``): the mark holds only the MOST RECENT
        batch, so a replay of any batch other than the latest re-applies.
        That is exactly the crawl loop's shape — one status-updater writer
        per table, batches committed in order, only the in-flight batch
        can be replayed after a crash (Delta's txnAppId/txnVersion keeps
        the same per-writer latest-version slot)."""
        meta = f"{self.table}_meta"
        if not self._table_exists(meta):
            return None
        conn = self._connect()
        try:
            st = conn.createStatement()
            rs = st.executeQuery(f"SELECT batch_id FROM {meta} WHERE k = 0")
            out = rs.getString(1) if rs.next() else None
            rs.close()
            st.close()
            return out
        finally:
            conn.close()

    def merge_commit(
        self,
        updates: DataFrame,
        now: str,
        batch_id: str | None = None,
        **merge_kwargs,
    ) -> list[int]:
        """Pruned incremental MERGE — the SQL twin of
        ``FrontierTable.merge_commit``'s partition-pruned plan (and of what
        a lakehouse ``MERGE INTO`` with source-derived partition predicates
        compiles to):

          1. touched buckets = distinct ``bucket(host(url))`` of the update
             batch (metadata-sized collect, ≤ NUM_FRONTIER_BUCKETS ints);
          2. the frontier read is filtered to those buckets — the predicate
             is PUSHED to the DB (indexed ``bucket`` column,
             tableCreation.script:37), so untouched bucket slices never
             leave the database (plan-audited in tests/test_jdbc.py);
          3. ``merge_status_updates`` runs on the pruned slice only;
          4. commit = stage the merged slice, then ONE DB transaction
             deletes the touched buckets, inserts the staged rows, and
             records ``batch_id`` in ``<table>_meta`` — readers see the
             old or the new slice, never half of one, and the batch mark
             is atomic WITH the data (Delta's txnAppId/txnVersion idiom
             in SQL).

        Crash-restart contract (mirrors FrontierTable.merge_commit):
        a crash before the transaction leaves only a staging table the
        retry rebuilds; a retry after the transaction (ack lost) is a
        NO-OP because ``<table>_meta`` already carries this batch_id —
        error_count cannot escalate twice for one generation. Tested at
        both crash points in tests/test_jdbc.py.

        Returns the touched bucket ids ([] for a quiet or replayed batch).
        """
        from ..functions.urls import bucket_expr, host_key_expr
        from ..operators.status_merge import merge_status_updates

        if batch_id is not None:
            import re as _re

            if not _re.fullmatch(r"[A-Za-z0-9._:-]{1,200}", batch_id):
                raise ValueError(f"invalid batch_id: {batch_id!r}")
            self._ensure_meta()
            if self.last_batch_id() == batch_id:
                return []

        # null urls can't key the PRIMARY-KEY store (and would violate the
        # NOT NULL constraint at the staging append) — drop them up front.
        # Unparseable-but-non-null urls are fine: host_key_expr returns ''
        # for them, which hashes to a real bucket like any other key.
        updates = updates.where(F.col("url").isNotNull())
        # pin the updates plan: the touched-bucket collect and the staging
        # write below must see the SAME rows (a re-read source could change
        # between the two actions and stage rows into never-deleted buckets)
        updates = updates.localCheckpoint(eager=False)
        # bucket_expr over a non-null url is always non-null (even an
        # unparseable host hashes via ''), so no null-guard is needed here
        touched = sorted(
            r.b
            for r in updates.select(
                bucket_expr(host_key_expr(F.col("url"))).alias("b")
            )
            .distinct()
            .collect()
        )
        if not touched:
            return []  # quiet batch: nothing to merge, no table mutation
        pruned = self.read().where(F.col("bucket").isin(touched))
        merged = merge_status_updates(pruned, updates, now, **merge_kwargs)

        staging = f"{self.table}_staging"
        if self._table_exists(staging):
            self._execute(f"DROP TABLE {staging}")
        self._execute(f"CREATE TABLE {staging} ({FRONTIER_TABLE_DDL})")
        _rename(merged, _TO_SQL).select(
            "url", "status", "nextfetchdate", "error_count", "host", "bucket"
        ).write.mode("append").option("driver", self.driver).jdbc(
            self.jdbc_url, staging
        )
        in_list = ",".join(str(b) for b in touched)
        txn = [
            f"DELETE FROM {self.table} WHERE bucket IN ({in_list})",
            f"INSERT INTO {self.table} SELECT * FROM {staging}",
        ]
        if batch_id is not None:
            txn.append(
                f"UPDATE {self.table}_meta SET batch_id = '{batch_id}' "
                "WHERE k = 0"
            )
        self._execute(*txn, transactional=True)
        self._execute(f"DROP TABLE {staging}")
        return touched

    def count(self) -> int:
        df = self.spark.read.jdbc(
            self.jdbc_url, self.table, properties={"driver": self.driver}
        )
        return df.count()
