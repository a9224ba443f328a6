"""Time-series relational operators Spark lacks as primitives: as-of join,
range (interval containment) join, and multi-granularity rollup.

These are the "hypertable" query shapes of event/telemetry analytics (the
reference's metrics surface — PerSecondReducer, StatusMetricsBolt — is the
degenerate fixed-window case; see operators/metrics.py). Each is built as a
composition of existing DataFrame ops chosen for the 100 TB regime:

* ``asof_join`` — NOT a join at all physically: union both sides, one
  window pass per key carries the latest right-side row forward
  (``last(..., ignorenulls)``). One shuffle on the key, zero row
  amplification, no range-condition nested loop — the plan a dedicated
  ASOF JOIN operator (DuckDB's, Pandas ``merge_asof``) lowers to when the
  build side doesn't fit memory.
* ``range_join_bucketed`` — equi-bucketization: intervals explode into the
  fixed-width time buckets they cover, points compute their bucket, and the
  range predicate becomes (bucket equality ∧ exact containment filter).
  Catalyst would otherwise plan interval containment as
  BroadcastNestedLoopJoin — O(|points|·|ranges|) — which dies when ranges
  stop fitting in a broadcast. Bucket width trades replication (long
  intervals explode into more buckets) against join selectivity.
* ``rollup_time_grain`` — one shuffle produces every time grain at once
  via ROLLUP grouping sets (day ⊃ hour ⊃ minute), with partial aggregation
  map-side at the finest grain; the continuous-aggregate / hypertable
  rollup shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types


def epoch_micros(ts: Column) -> Column:
    """Exact integer epoch-µs from a TIMESTAMP_NTZ column.

    ``unix_micros`` rejects NTZ (the type the driver's TIMESTAMP(NANOS)
    parquet scans produce), and a double round-trip loses sub-µs precision
    at 2024-epoch magnitudes; timestamp_diff is integer arithmetic, and
    its values checksum-match DuckDB's ``epoch_us`` exactly.
    """
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ts
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` on the same key (inclusive, like DuckDB
    ``ASOF JOIN`` / pandas ``merge_asof(direction='backward')``).

    Physical shape: tag each side, union, and run ONE window over
    (key ORDER BY ts, side) carrying the last non-null right payload
    forward; keep left rows. Right rows order before left rows at equal
    timestamps so a simultaneous right row matches. Rows with no prior
    right row keep a null payload (left outer semantics).

    Scale: one hash-shuffle on ``key`` and a sort within partitions —
    no row amplification, no nested-loop range probe, and skewed keys
    split fine under AQE because the window never crosses keys. With
    ``tolerance_us`` set, matches older than the tolerance are nulled
    out (pandas ``tolerance=`` semantics) — a projection, not a filter,
    so left rows are never dropped.

    Determinism: when several right rows share the same (key, ts), the
    window order falls through to the payload struct itself, so the
    MAXIMUM payload (field-lexicographic) wins — a stable, engine-
    portable tiebreak instead of partition-order luck.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, time_col)
    ]
    payload = F.struct(*[F.col(c) for c in right_payload], F.col(time_col).alias("__rts"))
    # deterministic-tiebreak key: only ORDERABLE payload fields (maps are
    # not sort keys in Spark — including one in the window orderBy would
    # fail at plan time, and a map NESTED inside a struct/array poisons
    # the whole field, so the check recurses). If every payload column is
    # unorderable, the tiebreak degrades to the timestamp only
    # (documented best effort).
    def _orderable(dt) -> bool:
        if isinstance(dt, types.MapType):
            return False
        if isinstance(dt, types.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, types.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    orderable = [
        f.name
        for f in right.select(
            *[F.col(c) for c in right_payload]
        ).schema.fields
        if _orderable(f.dataType)
    ]
    tiebreak = F.struct(
        *[F.col(c) for c in orderable], F.col(time_col).alias("__rts")
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
        tiebreak.alias("__tb"),
    )
    left_cols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        *[F.col(c) for c in left_cols],
    )
    u = r.select("__k", "__t", "__side", "__p", "__tb").unionByName(
        l, allowMissingColumns=True
    )
    w = (
        Window.partitionBy("__k")
        # final "__tb" tiebreak: equal-(ts) right rows order by their
        # orderable payload fields, so last() deterministically picks the
        # max payload (left rows carry a null tiebreak and __side=1 orders
        # them after every simultaneous right row regardless)
        .orderBy("__t", "__side", F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance_us is not None:
        fresh = (
            epoch_micros(F.col("__t")) - epoch_micros(match["__rts"])
        ) <= F.lit(tolerance_us)
        match = F.when(fresh, match)
    return out.select(
        *[F.col(c) for c in left_cols],
        *[match[c].alias(f"r_{c}") for c in right_payload],
        match["__rts"].alias(f"r_{time_col}"),
    )


def bucket_of(ts: Column, width_s: int) -> Column:
    """Fixed-width time bucket id (epoch µs // width). Integer epoch-µs
    are < 2^53, so the double division is exact enough for floor (quotient
    error ~1e-10) and identical across engines."""
    return F.floor(epoch_micros(ts) / F.lit(width_s * 1_000_000)).cast("long")


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    time_col: str = "ts",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Interval-containment join (``start <= ts < end``) via equi-bucket
    decomposition: every range row explodes into the fixed-width buckets
    its interval covers; every point computes its single bucket; a plain
    hash equi-join on bucket id + the exact containment filter gives the
    result.

    Scale: Catalyst plans a raw inequality join as
    BroadcastNestedLoopJoin — fine while ranges broadcast, quadratic death
    after. Bucketization keeps both sides hash-partitioned (shuffle or
    broadcast by size, AQE's call) and bounds work to ranges' true overlap:
    a range of length L costs ceil(L/width)+1 replicated rows. Pick width
    ≈ median range length; hot buckets (many overlapping ranges) split
    under AQE skew handling.
    """
    start_b = bucket_of(F.col(start_col), bucket_width_s)
    # end is exclusive: a range ending exactly on a bucket boundary does
    # not cover that bucket — subtract 1 µs before bucketing
    end_b = F.floor(
        (epoch_micros(F.col(end_col)) - 1) / F.lit(bucket_width_s * 1_000_000)
    ).cast("long")
    # degenerate/inverted intervals (end <= start) match nothing under
    # start <= ts < end, but would make sequence() count DOWNWARD and
    # explode a huge spurious bucket list — drop them before exploding
    exploded = ranges.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket", F.explode(F.sequence(start_b, end_b))
    )
    pts = points.withColumn("__bucket", bucket_of(F.col(time_col), bucket_width_s))
    return (
        pts.join(exploded, "__bucket")
        .where(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def gap_fill(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward — the
    hypertable ``time_bucket_gapfill``/``locf`` shape: per key, every
    bucket between that key's first and last observation exists in the
    output; empty buckets report 0 counts and carry the previous bucket's
    value forward.

    Plan shape: aggregate to buckets FIRST (partial map-side; the corpus
    never explodes), then build the dense spine by exploding
    ``sequence(min, max, 1 grain)`` of the per-key BOUNDS — |keys| rows,
    not |events| — and left-join the sparse aggregates back (broadcast or
    hash by size, AQE's call). The LOCF window partitions by key so skew
    splits; nothing touches the raw corpus twice.
    """
    step = {"hour": "interval 1 hour", "day": "interval 1 day",
            "minute": "interval 1 minute"}[grain]
    bucket = F.date_trunc(grain, F.col(time_col))
    sparse = events.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("v"),
    )
    # the sparse aggregate feeds BOTH the bounds/spine branch and the
    # left join — truncate its lineage so the raw-events scan+aggregate
    # runs once, not once per branch (same pattern as dedup signatures)
    sparse = sparse.localCheckpoint(eager=False)
    spine = (
        sparse.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.expr(f"sequence(lo, hi, {step})")
            ).alias("bucket"),
        )
    )
    joined = spine.join(sparse, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.round(F.coalesce(F.col("v"), F.lit(0.0)), 2).alias("total_value"),
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("locf_value"),
    )


def rollup_time_grain(
    events: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("day", "hour"),
) -> DataFrame:
    """Continuous-aggregate rollup: counts + sums at every time grain in
    one pass — ``ROLLUP(day, hour, ...)`` grouping sets, so the hour rows
    aggregate map-side and the day/total rows reuse the same shuffle.
    Output carries one row per grain combination (coarser grains have null
    finer columns, SQL ROLLUP semantics) plus the grand-total row.
    """
    cols = [
        F.date_trunc(g, F.col(time_col)).alias(g) for g in grains
    ]
    return events.rollup(*cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )


def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Mergeable one-pass quantile ESTIMATES from a fixed-width histogram
    — the 100 TB path when ``events_quantiles``-style exact percentiles
    (a per-group sort) are too expensive: the corpus collapses to
    (group, bin, count) in ONE partial-aggregable pass, shards merge by
    summing counts, and the quantile read-out (cumulative window + linear
    interpolation inside the target bin) runs on the tiny bin table.
    Unlike percentile_approx's GK sketch, the histogram is DETERMINISTIC
    — integer bins and dyadic-free but reproducible double interpolation
    — so the DuckDB oracle rebuilds the estimate exactly.

    Error bound: one bin_width. Estimate for quantile q is
    ``edge + (q*n - cum_below) / bin_count * width`` in the first bin
    whose cumulative count reaches q*n.
    """
    bins = (
        df.select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) / F.lit(bin_width)).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    aggs = [F.max(F.col("total")).alias("n")]
    for q in qs:
        r = F.lit(q) * F.col("total")
        hit = (F.col("cum") >= r) & ((F.col("cum") - F.col("cnt")) < r)
        est = (
            F.col("bin") * F.lit(bin_width)
            + (r - (F.col("cum") - F.col("cnt")))
            / F.col("cnt")
            * F.lit(bin_width)
        )
        name = f"p{int(round(q * 100))}"
        aggs.append(
            F.round(F.max(F.when(hit, est)), 4).alias(f"est_{name}")
        )
    return cum.groupBy("grp").agg(*aggs)
