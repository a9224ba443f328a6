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
