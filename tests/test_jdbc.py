"""SQL backend exercised end-to-end against embedded Derby (ships with
Spark) — the reference's external/sql module: SQLSpout's ranked frontier
query, StatusUpdaterBolt persistence, IndexerBolt batch writes. No
driver-gating: these tests run the real JDBC read/write paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.operators.frontier import frontier_topk
from incubator_stormcrawler_spark.operators.indexing import write_jdbc
from incubator_stormcrawler_spark.operators.status_merge import (
    merge_status_updates,
)
from incubator_stormcrawler_spark.sources.jdbc import (
    DERBY_DRIVER,
    JdbcFrontierStore,
)

NOW = "2024-05-01 00:00:00"


def _seed_frontier(spark, n=200, hosts=20):
    return spark.range(n).selectExpr(
        "'https://h' || cast(mod(id, {h}) as string) || '.example/p' ||"
        " cast(id as string) AS url".format(h=hosts),
        "case when mod(id, 4) = 0 then 'FETCHED' else 'DISCOVERED' end"
        " AS status",
        "timestamp'2024-04-30 00:00:00' + make_interval(0,0,0,0,0,0,"
        " cast(mod(id, 100) * 900 as int)) AS next_fetch_date",
        "cast(0 as int) AS error_count",
        "'h' || cast(mod(id, {h}) as string) || '.example' AS key".format(
            h=hosts
        ),
        "cast(mod(id, 10) as int) AS bucket",
    )


@pytest.fixture(scope="module")
def store(spark):
    s = JdbcFrontierStore(
        spark, "jdbc:derby:memory:frontierdb;create=true", table="urls"
    )
    s.seed(_seed_frontier(spark))
    return s


def test_jdbc_frontier_roundtrip_identical(spark, store):
    """What goes in comes back out, bit-for-bit, through the partitioned
    JDBC scan (engine column names restored)."""
    expected = _seed_frontier(spark)
    got = store.read()
    assert sorted(got.columns) == sorted(expected.columns)
    assert got.count() == 200
    sym_diff = got.select(*sorted(got.columns)).exceptAll(
        expected.select(*sorted(got.columns))
    )
    assert sym_diff.count() == 0


def test_jdbc_read_is_partitioned(store):
    """SQLSpout.java:85-93 runs one spout per bucket; the Spark analogue is
    a partitionColumn=bucket parallel scan — N concurrent DB cursors."""
    df = store.read()
    assert df.rdd.getNumPartitions() == 4
    assert "JDBCRelation" in df._jdf.queryExecution().simpleString()


def test_jdbc_pushdown_reaches_db(store):
    """frontier_topk's due-date filter must appear as a pushed JDBC
    predicate (the DB indexes nextfetchdate — tableCreation.script:38),
    not a post-scan Spark filter over the full table transfer."""
    plan = (
        store.read()
        .where(F.col("next_fetch_date") <= F.lit(NOW).cast("timestamp"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "NEXTFETCHDATE" in plan.upper()
    assert "LessThanOrEqual(NEXTFETCHDATE" in plan


def test_jdbc_frontier_topk_matches_dataframe_path(spark, store):
    """The SAME frontier operator over the JDBC table and over the
    in-memory DataFrame must pick the same generation — the SQLSpout ranked
    query (SQLSpout.java:120-140) has one implementation, two storages."""
    via_jdbc = frontier_topk(store.read(), NOW, max_per_bucket=2,
                             max_results=30)
    via_df = frontier_topk(_seed_frontier(spark), NOW, max_per_bucket=2,
                           max_results=30)
    assert [r.url for r in via_jdbc.collect()] == [
        r.url for r in via_df.collect()
    ]


def test_jdbc_commit_swap_merges_updates(spark, store):
    """StatusUpdaterBolt.java:103-110 upserts row-at-a-time; the bulk
    analogue is merge_status_updates + staged RENAME swap. After commit the
    table holds the merged next generation (new URL inserted, fetched URL
    rescheduled, unchanged rows untouched)."""
    updates = spark.createDataFrame(
        [
            ("https://h0.example/p0", "FETCHED"),  # existing, refetched
            ("https://new.example/x", "DISCOVERED"),  # brand new
        ],
        "url string, status string",
    )
    merged = merge_status_updates(store.read(), updates, NOW)
    store.commit(merged)
    after = store.read()
    assert after.count() == 201
    new_row = after.where(F.col("url") == "https://new.example/x").collect()
    assert new_row and new_row[0].status == "DISCOVERED"
    fetched = after.where(F.col("url") == "https://h0.example/p0").collect()[0]
    assert fetched.status == "FETCHED" and str(fetched.next_fetch_date) > NOW
    # untouched row survived the swap verbatim
    keep = after.where(F.col("url") == "https://h1.example/p1").collect()[0]
    assert keep.status == "DISCOVERED" and keep.error_count == 0


def test_write_jdbc_indexer_batch(spark):
    """IndexerBolt.java:90-120: batched inserts of indexed docs. Spark
    writes per-partition batches; read back and compare values."""
    url = "jdbc:derby:memory:indexdb;create=true"
    docs = spark.createDataFrame(
        [("https://a.example/", "Title A", "text a"),
         ("https://b.example/", "Title B", "text b")],
        "url string, title string, text string",
    )
    write_jdbc(
        docs, url, "docs", mode="overwrite", driver=DERBY_DRIVER,
        createTableColumnTypes=(
            "url VARCHAR(2048), title VARCHAR(512), text VARCHAR(4096)"
        ),
    )
    back = spark.read.jdbc(url, "docs", properties={"driver": DERBY_DRIVER})
    rows = {r.url: (r.title, r.text) for r in back.collect()}
    assert rows == {
        "https://a.example/": ("Title A", "text a"),
        "https://b.example/": ("Title B", "text b"),
    }


def test_jdbc_pruned_merge_commit(spark):
    """StatusUpdaterBolt's persistence as a partition-pruned MERGE against
    the DB (the SQL twin of FrontierTable.merge_commit): only the bucket
    slices touched by the update batch are read — with the bucket predicate
    PUSHED to the DB scan — merged, and swapped in one transaction;
    untouched buckets never leave the database. Result must equal the
    unpruned full merge."""
    from incubator_stormcrawler_spark.functions.urls import (
        bucket_expr,
        host_key_expr,
    )

    s = JdbcFrontierStore(
        spark, "jdbc:derby:memory:mergedb;create=true", table="urls"
    )
    # coherent layout: bucket derived from the politeness key, the
    # invariant merge_commit prunes on
    base = _seed_frontier(spark).withColumn(
        "bucket", bucket_expr(F.col("key"))
    )
    s.seed(base)

    updates = spark.createDataFrame(
        [
            ("https://h3.example/p3", "FETCHED"),
            ("https://h3.example/new1", "DISCOVERED"),
            ("https://h7.example/p7", "FETCH_ERROR"),
        ],
        "url string, status string",
    )
    touched_expected = sorted(
        r.b
        for r in updates.select(
            bucket_expr(host_key_expr(F.col("url"))).alias("b")
        )
        .distinct()
        .collect()
    )

    # plan audit: the pruned scan pushes the bucket predicate into the DB
    plan = (
        s.read()
        .where(F.col("bucket").isin(touched_expected))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "BUCKET" in plan.upper()

    # semantics: pruned merge == full merge (computed before the mutation)
    expected = {
        r.url: (r.status, r.error_count)
        for r in merge_status_updates(s.read(), updates, NOW).collect()
    }
    touched = s.merge_commit(updates, NOW)
    assert touched == touched_expected
    got = {r.url: (r.status, r.error_count) for r in s.read().collect()}
    assert got == expected
    assert got["https://h3.example/p3"][0] == "FETCHED"
    assert "https://h3.example/new1" in got


def test_jdbc_merge_commit_quiet_batch_is_noop(spark):
    """An empty update batch (or all-unparseable URLs → null buckets) must
    be a no-op commit, not a SQL syntax error from 'bucket IN ()'."""
    s = JdbcFrontierStore(
        spark, "jdbc:derby:memory:quietdb;create=true", table="urls"
    )
    from incubator_stormcrawler_spark.functions.urls import bucket_expr

    s.seed(_seed_frontier(spark, n=20).withColumn(
        "bucket", bucket_expr(F.col("key"))
    ))
    before = s.count()
    empty = spark.createDataFrame([], "url string, status string")
    assert s.merge_commit(empty, NOW) == []
    assert s.count() == before


def test_jdbc_merge_commit_crash_restart_idempotent(spark, monkeypatch):
    """Exactly-once for the SQL backend, both crash points (the JDBC twin
    of FrontierTable's test): a crash BEFORE the swap transaction leaves
    only a staging table the retry rebuilds; a retry AFTER the committed
    transaction (lost ack) is a no-op because <table>_meta carries the
    batch_id atomically with the data — FETCH_ERROR escalation cannot
    double-apply."""
    s = JdbcFrontierStore(
        spark, "jdbc:derby:memory:crashdb;create=true", table="urls"
    )
    from incubator_stormcrawler_spark.functions.urls import bucket_expr

    s.seed(_seed_frontier(spark).withColumn(
        "bucket", bucket_expr(F.col("key"))
    ))
    updates = spark.createDataFrame(
        [("https://h3.example/p3", "FETCH_ERROR"),
         ("https://h3.example/new1", "DISCOVERED")],
        "url string, status string",
    )

    def snapshot():
        return sorted(
            (r.url, r.status, r.error_count) for r in s.read().collect()
        )

    # crash point 1: staging written, swap transaction dies
    real_execute = JdbcFrontierStore._execute

    def dying_execute(self, *statements, transactional=False):
        if transactional:
            raise RuntimeError("simulated crash before swap txn")
        return real_execute(self, *statements, transactional=transactional)

    before = snapshot()
    monkeypatch.setattr(JdbcFrontierStore, "_execute", dying_execute)
    with pytest.raises(RuntimeError, match="simulated crash"):
        s.merge_commit(updates, NOW, batch_id="gen-1")
    monkeypatch.setattr(JdbcFrontierStore, "_execute", real_execute)
    assert snapshot() == before  # table untouched
    assert s._table_exists("urls_staging")  # the partial leftover

    touched = s.merge_commit(updates, NOW, batch_id="gen-1")  # retry
    assert touched != []
    after = snapshot()
    errs = {u: (st, e) for u, st, e in after}
    assert errs["https://h3.example/p3"] == ("FETCH_ERROR", 1)
    assert "https://h3.example/new1" in errs

    # crash point 2: committed but ack lost — same batch_id is a no-op
    assert s.merge_commit(updates, NOW, batch_id="gen-1") == []
    assert snapshot() == after
    assert s.last_batch_id() == "gen-1"

    # a new batch still applies, escalating exactly once more
    touched = s.merge_commit(
        updates.where(F.col("status") == "FETCH_ERROR"), NOW,
        batch_id="gen-2",
    )
    assert touched != []
    errs = {u: (st, e) for u, st, e in snapshot()}
    assert errs["https://h3.example/p3"] == ("FETCH_ERROR", 2)

    # malformed batch ids are rejected before touching SQL
    with pytest.raises(ValueError, match="invalid batch_id"):
        s.merge_commit(updates, NOW, batch_id="x'; DROP TABLE urls--")
