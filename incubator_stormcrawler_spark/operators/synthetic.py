"""Deterministic synthetic crawl tables derived from the driver's TPC-H-ish
parquet (TESTDATA.md), buildable identically in Spark and DuckDB.

The driver's correctness gate compares our Spark queries against DuckDB SQL
over the same parquet files — but the crawl-side operators (frontier query,
status merge, scheduling) need crawl-shaped tables (FIXTURES.md §1-2). So we
derive ``frontier`` from ``orders`` and ``status_updates`` from ``lineitem``
using only functions that produce bit-identical results in both engines:
``md5``, ``substr``, ``ascii``, ``mod``, string concat, and fixed-timestamp
arithmetic. No randomness, no wall-clock.

Layout mirrors FIXTURES.md §1: url/status/next_fetch_date/error_count/key/
bucket with the 2200-01-01 "never" sentinel
(external/sql/.../StatusUpdaterBolt.java:50) and bucket sharding à la
``pmod(hash(key), n)`` (sql/StatusUpdaterBolt.java:157-163) — here
``mod(hex32(md5(key)),10)`` so DuckDB agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_input

# Fixed "now" for all scheduling math — determinism across engines and runs.
NOW = "2024-01-15 00:00:00"
# next_fetch_date base: NOW - 7 days; offsets span 14 days → ~half the
# frontier is "due" at NOW (mirrors FIXTURES.md §1 uniform [now-7d, now+7d]).
NFD_BASE = "2024-01-08 00:00:00"
# Pandas-representable "never" sentinel (< 2262-04-11 ns cap); mirrors the
# reference's 3000-01-01 (external/sql/.../StatusUpdaterBolt.java:50).
NEVER = "2200-01-01 00:00:00"
NUM_HOSTS = 100
NUM_BUCKETS = 10


def _host_expr_sql(keyexpr: str) -> str:
    return f"'host' || cast(mod({keyexpr}, {NUM_HOSTS}) as string) || '.example'"


def synthetic_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier table derived from ``orders``.

    Column derivations (all mod-based on o_orderkey so DuckDB matches):
      host   = mod(o_orderkey, 100)
      status = mod(o_orderkey, 100) → 60% DISCOVERED / 25% FETCHED /
               8% FETCH_ERROR / 5% REDIRECTION / 2% ERROR (FIXTURES.md §1)
      next_fetch_date = NFD_BASE + mod(o_orderkey*7, 20160) minutes
                        (ERROR rows → the never sentinel)
      error_count     = 1 + mod(o_orderkey, 2) on FETCH_ERROR rows else 0
      bucket          = mod(first-32-hash-bits(md5(key)), 10)
    """
    orders = read_input(spark, f"{sf_dir}/orders.parquet")
    return orders.selectExpr(
        "o_orderkey",
        f"'https://host' || cast(mod(o_orderkey, {NUM_HOSTS}) as string) || "
        "'.example/p' || cast(o_orderkey as string) as url",
        "case"
        " when mod(o_orderkey, 100) < 60 then 'DISCOVERED'"
        " when mod(o_orderkey, 100) < 85 then 'FETCHED'"
        " when mod(o_orderkey, 100) < 93 then 'FETCH_ERROR'"
        " when mod(o_orderkey, 100) < 98 then 'REDIRECTION'"
        " else 'ERROR' end as status",
        f"case when mod(o_orderkey, 100) >= 98 then timestamp '{NEVER}'"
        f" else timestampadd(MINUTE, cast(mod(o_orderkey * 7, 20160) as int),"
        f" timestamp '{NFD_BASE}') end as next_fetch_date",
        "case when mod(o_orderkey, 100) >= 85 and mod(o_orderkey, 100) < 93"
        " then 1 + cast(mod(o_orderkey, 2) as int) else 0 end as error_count",
        f"{_host_expr_sql('o_orderkey')} as key",
        f"cast(mod(cast(conv(substr(md5({_host_expr_sql('o_orderkey')}), 1, 8),"
        f" 16, 10) as bigint), {NUM_BUCKETS}) as int) as bucket",
    ).drop("o_orderkey")


FRONTIER_CTE = f"""
frontier AS (
  SELECT
    'https://host' || cast(mod(o_orderkey, {NUM_HOSTS}) as varchar) ||
      '.example/p' || cast(o_orderkey as varchar) AS url,
    CASE
      WHEN mod(o_orderkey, 100) < 60 THEN 'DISCOVERED'
      WHEN mod(o_orderkey, 100) < 85 THEN 'FETCHED'
      WHEN mod(o_orderkey, 100) < 93 THEN 'FETCH_ERROR'
      WHEN mod(o_orderkey, 100) < 98 THEN 'REDIRECTION'
      ELSE 'ERROR' END AS status,
    CASE WHEN mod(o_orderkey, 100) >= 98 THEN TIMESTAMP '{NEVER}'
      ELSE TIMESTAMP '{NFD_BASE}' + to_minutes(mod(o_orderkey * 7, 20160))
      END AS next_fetch_date,
    CASE WHEN mod(o_orderkey, 100) >= 85 AND mod(o_orderkey, 100) < 93
      THEN 1 + cast(mod(o_orderkey, 2) as int) ELSE 0 END AS error_count,
    'host' || cast(mod(o_orderkey, {NUM_HOSTS}) as varchar) || '.example' AS key,
    cast(mod(('0x' || substr(md5('host' || cast(mod(o_orderkey, {NUM_HOSTS}) as varchar)
      || '.example'), 1, 8))::bigint, {NUM_BUCKETS}) as int) AS bucket
  FROM orders
)
"""


def synthetic_status_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One generation's status emissions, derived from ``lineitem``.

    ~30% of rows target NEW urls (suffix ``x<linenumber>`` — exercises the
    merge's insert-if-absent path); the rest hit existing frontier URLs via
    the l_orderkey FK. Statuses from mod(l_partkey, 100):
    55% DISCOVERED / 25% FETCHED / 15% FETCH_ERROR / 5% REDIRECTION.
    """
    li = read_input(spark, f"{sf_dir}/lineitem.parquet")
    return li.selectExpr(
        f"'https://host' || cast(mod(l_orderkey, {NUM_HOSTS}) as string) || "
        "'.example/p' || cast(l_orderkey as string) || "
        "case when mod(l_partkey, 10) < 3 then 'x' || cast(l_linenumber as string)"
        " else '' end as url",
        "case"
        " when mod(l_partkey, 100) < 55 then 'DISCOVERED'"
        " when mod(l_partkey, 100) < 80 then 'FETCHED'"
        " when mod(l_partkey, 100) < 95 then 'FETCH_ERROR'"
        " else 'REDIRECTION' end as status",
    )


UPDATES_CTE = f"""
status_updates AS (
  SELECT
    'https://host' || cast(mod(l_orderkey, {NUM_HOSTS}) as varchar) ||
      '.example/p' || cast(l_orderkey as varchar) ||
      CASE WHEN mod(l_partkey, 10) < 3
        THEN 'x' || cast(l_linenumber as varchar) ELSE '' END AS url,
    CASE
      WHEN mod(l_partkey, 100) < 55 THEN 'DISCOVERED'
      WHEN mod(l_partkey, 100) < 80 THEN 'FETCHED'
      WHEN mod(l_partkey, 100) < 95 THEN 'FETCH_ERROR'
      ELSE 'REDIRECTION' END AS status
  FROM lineitem
)
"""
