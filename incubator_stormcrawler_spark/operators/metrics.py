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
    # Fixed-point PER ROW, then integer-sum: each row's round(v·100, 0)
    # is deterministic (same input double → same cents on every engine;
    # rounding BEFORE the cast also dodges the Spark-truncates/
    # DuckDB-rounds double→int trap), and the BIGINT bucket sum is
    # order-independent. Summing doubles first and rounding the total
    # once looked equivalent — and failed on exactly one sf0.01 bucket
    # whose float sum straddled a half-cent under the engines' different
    # accumulation orders.
    hourly = events.groupBy(
        F.col(group_col).alias("grp"), bucket.alias("bucket")
    ).agg(
        F.sum(
            F.round(F.col(value_col) * 100, 0).cast("bigint")
        ).alias("cents")
    )
    contrib = hourly.select(
        "grp",
        "bucket",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("d"),
    ).select(
        "grp",
        F.expr(f"timestampadd({grain}, d, bucket)").alias("tbucket"),
        F.expr(f"shiftleft(cents, {window - 1} - d)").alias("w"),
    )
    # scale-back: 2^(window−1) undoes the shifts, 100 undoes the cents
    # fixed-point. int64→double then ONE correctly-rounded IEEE division
    # by the same literal — bit-identical on every engine, so the value
    # ships UNROUNDED: a round(…, 6) here would re-introduce
    # nondeterminism, because the power-of-two denominator makes exact
    # .5 ties at the 6th decimal representable and engines break those
    # ties differently (measured: one sf0.01 bucket, 266.8846875).
    scale = float((1 << (window - 1)) * 100)
    return (
        contrib.groupBy("grp", "tbucket")
        .agg(F.sum("w").alias("s"))
        .select(
            F.col("grp").alias(group_col),
            F.col("tbucket").alias("bucket"),
            (F.col("s") / F.lit(scale)).alias("decayed"),
        )
    )
