"""Crawl metrics — the reference's metric surface as aggregations.

Reference: fetched_perSec / bytes_fetched_perSec in 10 s buckets
(FetcherBolt.java:859-863, util/PerSecondReducer.java), per-doc averages
(fetch_time, bytes_fetched, FetcherBolt.java:668-674), per-status counts
(StatusMetricsBolt). All partial-aggregable groupBys — one narrow shuffle
each, any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_second_rates(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    bucket_secs: int = 10,
) -> DataFrame:
    """PerSecondReducer: events/sec (and value/sec) per time bucket."""
    secs = F.unix_timestamp(F.col(ts_col))
    bucket = (F.floor(secs / bucket_secs) * bucket_secs).cast("timestamp")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.count(F.lit(1)) / F.lit(bucket_secs), 4).alias("per_sec"),
    ]
    if value_col:
        aggs.append(
            F.round(F.sum(value_col) / F.lit(bucket_secs), 4).alias(
                f"{value_col}_per_sec"
            )
        )
    return events.groupBy(bucket.alias("bucket")).agg(*aggs)


def fetch_metrics(fetched: DataFrame) -> DataFrame:
    """Per-key fetch outcome metrics from a generation's fetch results:
    counts per status, bytes fetched, mean content size — the dashboard
    row the reference exports per fetcher instance."""
    return fetched.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum((F.col("status") == "FETCHED").cast("int")).alias("n_fetched"),
        F.sum((F.col("status") == "FETCH_ERROR").cast("int")).alias("n_errors"),
        F.sum(
            F.when(F.col("content").isNotNull(), F.length(F.col("content")))
            .otherwise(F.lit(0))
        ).alias("bytes_fetched"),
    )


def decayed_rates(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "event_type",
    grain: str = "hour",
    window: int = 32,
) -> DataFrame:
    """Exponentially-decayed per-bucket rate — the smoothing the
    reference's dashboards apply on top of PerSecondReducer's raw
    buckets: ``decayed(t) = Σ_{d=0..window-1} v(t−d) · 2^−d`` (half-life
    = one bucket, truncated at ``window`` lags where weights < 2^-31
    vanish anyway).

    Engineered for BIT-EXACT cross-engine reproduction, which a naive
    float recurrence can't give (per-group accumulation order differs
    between engines): bucket values are fixed-pointed to integer cents,
    each lag contributes ``cents << (window−1−d)`` — an exact BIGINT —
    and the per-bucket sum of ≤ window integers is order-independent.
    The final scale-back divides by 2^(window−1), an exact power-of-two
    division. Headroom: |Σ| ≤ window · max_cents · 2^31 — at 1e6 cents
    per bucket that is ~7e16, inside int64.

    Scale shape: ONE partial-aggregable groupBy builds the hourly
    buckets; each bucket row explodes into ``window`` (target, lag)
    contributions and ONE more partial-aggregable groupBy sums them —
    work linear in #buckets · window, never in raw event count. (The
    explode targets FUTURE buckets, so missing/empty buckets simply
    receive contributions from their filled predecessors.)
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    # round(x*100, 0) FIRST, then cast: the rounded double is exactly
    # integral so the cast is exact in both engines — casting
    # round(x,2)*100 would truncate 126.999… to 126 on Spark while
    # DuckDB's cast rounds it to 127 (the known double→int trap)
    hourly = events.groupBy(
        F.col(group_col).alias("grp"), bucket.alias("bucket")
    ).agg(
        F.round(F.sum(value_col) * 100, 0).cast("bigint").alias("cents")
    )
    contrib = hourly.select(
        "grp",
        "bucket",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("d"),
    ).select(
        "grp",
        F.timestampadd(grain, F.col("d"), F.col("bucket")).alias("tbucket"),
        F.shiftleft(F.col("cents"), window - 1 - F.col("d")).alias("w"),
    )
    scale = float(1 << (window - 1))
    return (
        contrib.groupBy("grp", "tbucket")
        .agg(F.sum("w").alias("s"))
        .select(
            F.col("grp").alias(group_col),
            F.col("tbucket").alias("bucket"),
            F.round(F.col("s") / F.lit(scale), 6).alias("decayed"),
        )
    )
