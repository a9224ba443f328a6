"""Generic relational operator surface (SURVEY.md §2.10).

The reference's dataflow embeds these implicitly (anti-join dedup, broadcast
robots lookup, grouped top-k, per-status counts); our engine exposes them as
first-class DataFrame plans over the driver's TPC-H-ish tables. Each query
here is written so Catalyst produces the plan you'd hand-pick at 100 TB:

- dimension joins are broadcast (``F.broadcast`` on region/nation/supplier),
- aggregations are partial (map-side combine) before the shuffle,
- top-k is window + filter (one shuffle) or orderBy+limit
  (TakeOrderedAndProject — no full sort),
- filters sit directly on the scan so parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..roundparams import RP


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    from ..session import read_input

    return read_input(spark, f"{sf_dir}/{name}.parquet", spread=spread)


# --- exact money arithmetic (r11, the float-summation-order class) ------
# The driver's money columns (l_extendedprice, l_discount, l_tax,
# o_totalprice, c_acctbal) are 2-decimal values stored as doubles. A SUM
# of doubles is ORDER-DEPENDENT in its low bits, and Spark's partial
# aggregation visits rows in a different order than DuckDB, so
# round(sum(...), 2) can land on opposite sides of a half-cent boundary —
# the r11 seed-12 pre-proof tripped exactly this on the Q10 shape (one
# customer's revenue rounded to a different cent in the two engines).
# Casting each operand to DECIMAL before the aggregate makes the sum
# EXACT and order-independent in both engines at any scale: Spark widens
# sum(decimal) precision by 10 and DuckDB goes to DECIMAL(38,s), so
# 10^9-row sums don't overflow where a bigint-cents encoding would.
# Outputs cast back to double (the registry's DESCRIBE sweep rejects
# DECIMAL output columns). product_profit's integer-cents encoding is the
# same idea with a narrower range; these helpers are the general form.
def _money(col):
    """A 2-decimal money column as an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def _pct(col):
    """A 2-decimal rate in [0,1) (discount/tax) as an exact decimal."""
    return F.col(col).cast("decimal(3,2)")


def _rev_exact():
    """l_extendedprice * (1 - l_discount), exact (scale 4)."""
    return _money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _pct("l_discount")
    )


def _dsum(expr, scale: int = 2):
    """Exact decimal sum surfaced as a rounded double. Round the DECIMAL
    FIRST, then cast: both engines round decimals half-away-from-zero
    (probed), while rounding the double detour diverges on half-cent
    boundaries (Spark rounds the shortest decimal rendering, DuckDB the
    binary value — an exact ...595 sum came back 307843.60 vs .59)."""
    return F.round(F.sum(expr), scale).cast("double")


def _dratio(num, den, scale: int):
    """Cross-engine-deterministic rounded ratio of two EXACT (decimal)
    aggregates — the division-path twin of :func:`_dsum` (the r11 ADVICE
    residual). Given identical exact operands, ``num/den`` is ONE IEEE
    double op and bit-identical in Spark and DuckDB; the only divergence
    left is ``round(q, s)`` itself, which Spark evaluates on q's
    shortest-decimal rendering and DuckDB on its binary value — opposite
    sides of a half-ulp boundary, the same class as the seed-12 sum
    landmine. So round WITHOUT round(): ``floor(q * 10^s + 0.5) / 10^s``
    is three more IEEE ops in a fixed order, identical in both engines by
    construction (ratios here are non-negative, so floor(x+0.5) IS
    half-up). The oracle SQL interpolates the SAME formula."""
    p = float(10 ** scale)
    q = num.cast("double") / den.cast("double")
    return F.floor(q * F.lit(p) + F.lit(0.5)) / F.lit(p)


def load_events(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """events table with a true TIMESTAMP ``ts``.

    The driver's parquet stores TIMESTAMP(NANOS), which Spark cannot read
    natively — without ``spark.sql.legacy.parquet.nanosAsLong`` every scan
    throws PARQUET_TYPE_ILLEGAL. The conf is runtime-settable, so set it
    here defensively (the caller's session may not come from our
    session.py); nanos then arrive as longs and convert to microsecond
    timestamps at the scan — the cast composes with column pruning.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events", spread=spread)
    if dict(ev.dtypes).get("ts") in ("bigint", "long"):
        # integer division — ts/1000 in double arithmetic loses precision
        # at 1.7e18 ns (ulp is 256 ns there), which can shift a value by
        # ±1 µs vs DuckDB's exact ns→µs truncation
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: wide aggregate over lineitem.

    One shuffle over a tiny key space; every agg is partial-aggregable so
    the shuffle moves O(#groups) rows per partition at any scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _rev_exact()
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + _pct("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(RP["q1_cutoff"]))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _dsum(_money("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 order revenue for one market segment.

    customer is the small side — broadcast; the orders⋈lineitem join
    shuffles on orderkey; final top-10 is TakeOrderedAndProject.
    """
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == RP["q3_segment"]
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < RP["q3_date"]
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > RP["q3_date"]
    )
    revenue = F.sum(_rev_exact())
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation where customer and supplier share
    the nation. All dimension joins broadcast; one real shuffle (orderkey).
    """
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = F.sum(_rev_exact())
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name").isin(*RP["q5_regions"]))
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter+sum — tests predicate pushdown; the scan
    should read 3 columns and skip row groups on shipdate."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= RP["q6_start"])
            & (F.col("l_shipdate") < RP["q6_end"])
            & (F.col("l_discount") >= float(RP["q6_disc_lo"]))
            & (F.col("l_discount") <= float(RP["q6_disc_hi"]))
            & (F.col("l_quantity") < RP["q6_qty"])
        )
        .agg(
            _dsum(_money("l_extendedprice") * _pct("l_discount")).alias(
                "revenue"
            )
        )
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k window — same physical shape as the frontier query,
    exercised on a relational table (rank/filter, one shuffle)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def customer_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation + HAVING + CASE banding over a join."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        _dsum(_money("o_totalprice")).alias("total_spend"),
        F.count(F.lit(1)).alias("num_orders"),
    )
    band = (
        F.when(F.col("total_spend") >= 1000000, "platinum")
        .when(F.col("total_spend") >= 300000, "gold")
        .otherwise("standard")
    )
    return (
        per_cust.where(F.col("num_orders") >= 2)
        .withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            # total_spend values are cent-exact; summing them as DECIMAL
            # keeps the average's dividend identical in both engines, and
            # _dratio makes the rounded quotient engine-deterministic too
            _dratio(
                F.sum(F.col("total_spend").cast("decimal(18,2)")),
                F.count(F.lit(1)),
                2,
            ).alias("avg_spend"),
        )
    )


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-ops surface: anti-join (the reference's discovered-URL dedup
    shape, AbstractStatusUpdaterBolt.java:150-161, as a relational op) —
    customers who never placed a 1-URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def nations_by_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct set-op: nations having customers or suppliers with
    positive account balance."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    a = cust.where(F.col("c_acctbal") > 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = supp.where(F.col("s_acctbal") > 0).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return a.union(b).distinct()


# -- events (the streaming-shaped batch surface) ---------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch twin of the Structured-Streaming
    windowed agg in streaming/): events per hour per type + value sum."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection (30 min): lag + cumulative sum —
    the classic two-window sessionizer, one shuffle on user_id."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    sessions = ev.withColumn("session_id", sess_id)
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("bigint").alias("num_sessions"),
            F.sum("num_events").alias("num_events"),
            F.round(F.max("session_value"), 2).alias("max_session_value"),
        )
    )


def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation per event type (p50/p95/p99) — the
    latency-dashboard aggregate; exact (sort-based) rather than sketched,
    matching DuckDB's quantile_cont interpolation bit-for-bit."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user, the
    FIRST timestamp of each step; a user converts a step only if its first
    occurrence is at-or-after the previous step's first occurrence — the
    standard product-analytics funnel, as two partial-aggregable groupBys
    (per-user min-when, then one global conditional count). No joins, no
    windows; at 100 TB the per-user aggregate is the only shuffle.
    """
    ev = load_events(spark, sf_dir)
    first_of = lambda t: F.min(
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t1"),
        first_of("click").alias("t2"),
        first_of("purchase").alias("t3"),
    )
    step2 = (
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & (F.col("t2") >= F.col("t1"))
    )
    step3 = step2 & F.col("t3").isNotNull() & (F.col("t3") >= F.col("t2"))
    return per_user.agg(
        F.count_if(F.col("t1").isNotNull()).alias("users_view"),
        F.count_if(step2).alias("users_view_click"),
        F.count_if(step3).alias("users_full_funnel"),
        F.round(
            F.count_if(step2) / F.count_if(F.col("t1").isNotNull()), 4
        ).alias("view_to_click_rate"),
        F.round(F.count_if(step3) / F.count_if(step2), 4).alias(
            "click_to_purchase_rate"
        ),
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface (LDJsonParseFilter-alike): extract props.k,
    aggregate by its decile. The per-row JSON parse is the one events
    shape heavy enough to pay for spreading a single-row-group scan
    (r14 A/B: 0.31 -> 0.47 s unspread; every other events query is
    faster unspread)."""
    ev = load_events(spark, sf_dir, spread=True)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy((F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share for one ship month — the
    classic big-fact × small-dim join. part must BROADCAST (the plan
    audit asserts it); the promo share is one conditional aggregate over
    the joined stream, no second pass."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = _rev_exact()
    zero = F.lit(0).cast("decimal(22,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= RP["q14_start"])
            & (F.col("l_shipdate") < RP["q14_end"])
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _dratio(
                F.lit(100).cast("decimal(3,0)")
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ),
                F.sum(rev),
                4,
            ).alias("promo_pct"),
            _dsum(rev).alias("total_revenue"),
        )
    )


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunctive brand/size/quantity predicates over
    the part-lineitem join, revenue per brand. The OR-of-ANDs predicate
    can only be evaluated post-join, but the per-side conjuncts
    (quantity bound, size bound) push into the scans and part still
    broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = _rev_exact()
    brands = RP["q19_brands"]
    qlos, qhis = RP["q19_qty_los"], RP["q19_qty_his"]
    sizes = RP["q19_sizes"]
    arms = [
        (F.col("p_brand") == brands[i])
        & (F.col("p_size") <= sizes[i])
        & (F.col("l_quantity") >= qlos[i])
        & (F.col("l_quantity") <= qhis[i])
        for i in range(3)
    ]
    cond = arms[0] | arms[1] | arms[2]
    return (
        li.where(
            (F.col("l_quantity") >= min(qlos))
            & (F.col("l_quantity") <= max(qhis))
        )
        .join(F.broadcast(part.where(F.col("p_size") <= max(sizes))),
              F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .groupBy("p_brand")
        .agg(
            _dsum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (event_type, day): every marginal plus the
    grand total in ONE exchange — the OLAP companion of the time-grain
    ROLLUP (`timeseries.rollup_time_grain`); Catalyst expands the
    grouping-set expansion BEFORE the shuffle so partial aggregation
    still applies to all 4 groupings."""
    ev = load_events(spark, sf_dir)
    return (
        ev.cube(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents: floor(x*100 + 0.5) per row, BIGINT sum —
            # a double sum's result depends on partition order, and the
            # CUBE margins aggregate enough rows that round(sum, 2) flips
            # its last digit between engines; integer sums are
            # order-independent
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("total_cents"),
        )
    )


def events_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity across event types: Pearson correlation of
    hourly volumes for every type pair — the "which signals move
    together" query of ops dashboards and the batch twin of streaming
    correlation monitors.

    Determinism: correlation is computed from the five INTEGER co-moment
    sums (n, Sx, Sy, Sxy, Sxx, Syy) rather than an engine's corr()
    accumulator — integer sums are exact and order-independent, so both
    engines produce bit-identical inputs to one final double expression.
    Scale: the hourly grid is |hours × types| (tiny relative to raw
    events, one partial-aggregable pass); the pair join is over the grid,
    not the events.

    Semantics: the inner join on hour correlates over the INTERSECTION of
    each pair's active hours — an hour where one type had zero events is
    excluded, not counted as 0. That biases Pearson upward for sparse
    pairs relative to full-series correlation; it is the deliberate
    contract here (both engines implement it identically). For
    full-series semantics, gap-fill zero-count hours from the joint hour
    spine first (``timeseries.gap_fill``) and correlate the dense grid.
    """
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = hourly.select(
        "hour", F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    b = hourly.select(
        "hour", F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    m = (
        a.join(b, "hour")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("na").alias("sx"),
            F.sum("nb").alias("sy"),
            F.sum(F.col("na") * F.col("nb")).alias("sxy"),
            F.sum(F.col("na") * F.col("na")).alias("sxx"),
            F.sum(F.col("nb") * F.col("nb")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # a zero-variance series (constant counts, or a single shared hour)
    # has no defined correlation: nullif keeps the division NULL in BOTH
    # engines (Spark's non-ANSI divide would return NULL but DuckDB's
    # IEEE float divide returns inf/NaN — an engine divergence otherwise)
    return m.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(num / F.nullif(den, F.lit(0.0)), 4).alias("pearson"),
    )


# -- TPC-H breadth (round 5): the remaining queries expressible over the
# -- driver's reduced schema (no partsupp, no commit/receipt dates — Q2,
# -- Q11, Q16, Q20, Q21 need them and are out of scope; Q4/Q8/Q9/Q22 are
# -- adapted to the columns that exist, keeping each query's
# -- plan-shape lesson intact).


def order_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders (one quarter) with at least one lineitem
    shipped >90 days after the order date, counted by priority. The
    EXISTS compiles to a LEFT SEMI join on orderkey — no row
    amplification when an order has several late lines; both date
    filters push into their scans."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= RP["q4_start"])
        & (F.col("o_orderdate") < RP["q4_end"])
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {RP['q4_late_days']} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipped revenue between two nations (both
    directions) by ship year. supplier/customer/nation broadcast; the
    only real shuffle is lineitem⋈orders on orderkey, then a tiny
    grouped aggregate."""
    n1, n2 = RP["q7_nations"]
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    supp_n = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    rev = _rev_exact()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_1's share of STANDARD-part revenue sold
    into the ASIA region, by order year. All dimensions broadcast; the
    share is a conditional aggregate over one joined stream (no second
    pass, no self-join)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(
        F.col("r_name") == RP["q8_region"]
    )
    part = _t(spark, sf_dir, "part").where(
        F.col("p_type") == RP["q8_type"]
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    supp_n = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    # customers restricted to the target region (nation⋈region broadcast)
    cust_r = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    rev = _rev_exact()
    zero = F.lit(0).cast("decimal(22,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"),
              "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dratio(
                F.sum(
                    F.when(
                        F.col("supp_nation") == RP["q8_nation"], rev
                    ).otherwise(zero)
                ),
                F.sum(rev),
                4,
            ).alias("mkt_share"),
            _dsum(rev).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by supplier nation and order
    year. The schema carries no partsupp, so supply cost is proxied as
    60% of the part's retail price — the plan lesson (two broadcast dims
    into the fact, one shuffle on orderkey, small grouped output) is
    unchanged."""
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_type").isin(*RP["q9_types"])
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp_n = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    # per-line profit rounded to INTEGER CENTS before the sum: double
    # addition is not associative, and Spark/DuckDB sum groups in
    # different orders — a raw double sum can land a group on a 2-decimal
    # rounding boundary and hash-mismatch by one cent (seen the moment the
    # seeded constants moved the groups). The per-line expression tree is
    # identical in both engines, so its rounded cents are identical, and
    # the integer sum is order-independent.
    profit_cents = F.round(
        F.lit(100.0)
        * (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            - F.lit(float(RP["q9_cost_frac"]))
            * F.col("p_retailprice")
            * F.col("l_quantity")
        ),
        0,
    ).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(profit_cents) / 100.0, 2).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns in one
    quarter. orders filters to the quarter BEFORE the join; the top-20 is
    orderBy+limit (TakeOrderedAndProject — no full sort); customer and
    nation broadcast into the aggregate's output, not the fact stream."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= RP["q10_start"])
        & (F.col("o_orderdate") < RP["q10_end"])
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(_dsum(_rev_exact()).alias("revenue"))
    )
    return (
        per_cust.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("revenue"),
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            F.col("n_name"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    excluding low-priority orders. Two aggregations: per-customer count
    (left join keeps zero-order customers), then the count-of-counts —
    both partial-aggregable, the second over a tiny key space."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != RP["q13_excl_priority"]
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) with maximum shipped revenue in
    one quarter. The max is a broadcast scalar (cross join of a 1-row
    aggregate), so the per-supplier aggregate is computed ONCE — the
    decorrelated form of Q15's view-with-subquery; ties kept, matching
    the spec. Comparison is on the ROUNDED revenue so the equality is
    deterministic cross-engine."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= RP["q15_start"])
        & (F.col("l_shipdate") < RP["q15_end"])
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = _rev_exact()
    per_supp = li.groupBy("l_suppkey").agg(
        _dsum(rev).alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        per_supp.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: average yearly revenue lost if small-quantity
    orders (below 20% of a part's average quantity) weren't taken, for
    one brand. The correlated avg subquery decorrelates to a per-part
    aggregate joined back to the fact — the join is on partkey with the
    aggregate side small enough to broadcast after the brand filter.
    l_quantity is integer-valued, so the per-part average is exact and
    the threshold comparison is deterministic cross-engine."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == RP["q17_brand"]
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_lines = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = brand_lines.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(float(RP["q17_frac"])) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_lines.join(
            F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap")
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_money("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: top-100 orders whose total quantity exceeds 150,
    with the customer attached. The HAVING is a semi join from orders to
    the per-order quantity aggregate; quantities are integer-valued so
    the threshold is exact; final top-100 is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > RP["q18_qty"])
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: well-funded customers with no recent orders, by
    nation. The global average balance is a broadcast scalar; "no recent
    orders" is a LEFT ANTI join against the date-filtered orders scan
    (the NOT EXISTS plan); per-nation output is tiny."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= RP["q22_cutoff"]
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_money("c_acctbal")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(_money("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


def events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomalies per event type: z-score of each hour's
    count against the type's own distribution, flagging |z| ≥ 2 — the
    ops-dashboard outlier query. The z-score is computed from exact
    INTEGER sums (n, Σx, Σx²) like ``events_correlation``'s co-moments,
    so both engines derive bit-identical doubles and the threshold
    comparison is deterministic. Two tiny aggregates over the hourly
    grid; the events table shuffles once."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_events").cast("long").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n_hours")
    var = F.col("sxx") / F.col("n_hours") - mean * mean
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        # var > 0 as EXACT integer arithmetic (n·Σx² > (Σx)²): a
        # constant-count type has var 0 and z = 0/0 = NaN, and NaN
        # comparison semantics differ between engines (DuckDB sorts NaN
        # high) — the integer guard dodges the whole class
        .where(F.col("sxx") * F.col("n_hours") > F.col("sx") * F.col("sx"))
        .withColumn("z", z)
        .where(F.abs(F.col("z")) >= 2.0)
        .select(
            "event_type",
            "hour",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round("z", 4).alias("z"),
        )
        .orderBy("event_type", "hour")
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their FIRST event day, counted
    per day-offset they return — the standard product-analytics triangle.
    Two aggregates: per-user first day (partial-aggregable min), then
    distinct users per (cohort_day, offset); the join carrying the cohort
    back to the event stream is on user_id (one shuffle each side, AQE
    handles the skewed power users)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy(
            # DATE, not the truncated timestamp: DuckDB's date_trunc('day')
            # returns DATE, and the driver canonicalizes values as strings
            # ("2024-01-01" vs "2024-01-01 00:00:00") — align the type here
            F.to_date(F.col("cohort_day")).alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to the reduced schema (no ``l_shipmode`` /
    commit/receipt dates — TESTDATA.md): for lines in two return classes
    ('A', 'R' — standing in for Q12's MAIL/SHIP pair) that shipped LATE
    (>60 days after the order date) during 1997, count urgent-priority
    vs non-urgent orders per class.

    Plan: both scans carry pushed filters (returnflag IN + shipdate range
    on lineitem; nothing scans a column it doesn't use); one shuffle joins
    lineitem⋈orders on orderkey; the priority split is a CONDITIONAL
    aggregate over the joined stream — Q12's signature shape — so there is
    no second pass and no self-join. count() FILTER-style conditionals
    stay BIGINT in both engines (no HUGEINT/DECIMAL drift).
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .where(
            (F.col("l_shipdate") >= RP["q12_start"])
            & (F.col("l_shipdate") < RP["q12_end"])
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {RP['q12_late_days']} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to the reduced schema: suppliers who were
    the SOLE late supplier (line shipped >60 days after the order date)
    on a finished ('F') multi-supplier order, ranked by how many orders
    they held up.

    Scale: classic Q21 is two self-joins on lineitem (EXISTS another
    supplier, NOT EXISTS another LATE supplier) — three passes over the
    fact table. Here it is rewritten as ONE grouped pass per order over
    small per-order supplier SETS: n_supp = size(collect_set(supplier)),
    late_set = collect_set(late supplier), and the waiting supplier is
    the sole element of late_set in orders with n_supp > 1 AND
    size(late_set) == 1. collect_set (not count_distinct) is deliberate:
    two count_distincts over the same grouping compile to an Expand (3x
    row multiplication of the fact table) plus TWO exchanges on expanded
    keys (r6 plan, caught by the r7 plan audit), while collect_set is a
    single ObjectHashAggregate with map-side partial merge — truly ONE
    orderkey shuffle, and set sizes are bounded by suppliers-per-order
    (~7 in TPC-H). The oracle keeps the textbook EXISTS/NOT-EXISTS form,
    so the driver's cross-engine check also proves the rewrite's
    equivalence. supplier is broadcast for the name;
    tests/test_plans.py::test_round6_tpch_plan_shapes pins the shape.
    """
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {RP['q21_late_days']} DAYS"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.collect_set(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("late_set"),
    )
    # INVARIANT: element_at(late_set, 1) identifies THE late supplier
    # only under the adjacent size(late_set) == 1 filter. If that
    # predicate is ever relaxed or moved, the element becomes an
    # arbitrary late supplier — keep the filter and the projection
    # together.
    waiting = per_order.where(
        (F.col("n_supp") > 1) & (F.size("late_set") == 1)
    ).withColumn("sole_late_supp", F.element_at("late_set", 1))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("sole_late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("sole_late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Derived PARTSUPP: the driver schema (TESTDATA.md) ships no partsupp
# table, which blocked TPC-H Q2/Q11/Q16/Q20 through round 6 (COVERAGE.md
# recorded the gap). The table is fully determined by part x supplier,
# so both engines can DERIVE an identical one: 4 suppliers per part at a
# fixed stride (dbgen's own scheme — suppkey_j = (partkey + j*(S/4)) mod S,
# TPC-H spec 4.2.3), with availqty/supplycost drawn from md5 arithmetic
# (the repo's established cross-engine deterministic-value idiom, same as
# the synthetic embeddings). Supply cost is INTEGER CENTS so every
# downstream aggregate stays in exact integer domain cross-engine.
# Scale: partsupp is dimension-sized (4x|part| ~ 0.8% of lineitem); it is
# derived inline from the part scan — no storage, no extra shuffle — and
# the one-row supplier count joins via broadcast.
# ---------------------------------------------------------------------------

def derived_partsupp(spark: SparkSession, sf_dir: str, part: DataFrame | None = None) -> DataFrame:
    """Deterministic partsupp: ps_partkey, ps_suppkey (BIGINT),
    ps_availqty (INT, 1..9999), ps_supplycost_cents (BIGINT, 100..99999).

    Pass a pre-filtered ``part`` DataFrame (must retain ``p_partkey``) to
    keep the part-side filter pushed below the derivation — the derived
    rows for parts a query excludes are then never materialized.
    """
    if part is None:
        part = _t(spark, sf_dir, "part")
    s_cnt = _t(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("long").alias("s_cnt")
    )
    lattice = F.array(*[F.lit(j) for j in range(4)])
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(lattice).alias("j"),
            "s_cnt",
        )
        .withColumn(
            "step",
            F.greatest(F.lit(1).cast("long"), F.floor(F.col("s_cnt") / 4)),
        )
        .withColumn(
            "ps_suppkey",
            (F.col("ps_partkey") - 1 + F.col("j") * F.col("step"))
            % F.col("s_cnt")
            + 1,
        )
    )
    key = F.concat(
        F.col("ps_partkey").cast("string"),
        F.lit("|"),
        F.col("ps_suppkey").cast("string"),
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("psa|"), key)), 1, 6), 16, 10)
            .cast("long") % 9999 + 1
        ).cast("int").alias("ps_availqty"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("psc|"), key)), 1, 6), 16, 10)
            .cast("long") % 99900 + 100
        ).alias("ps_supplycost_cents"),
    )


#: DuckDB CTE body producing the IDENTICAL derived partsupp (same stride,
#: same md5 arithmetic) — prepended to the Q2/Q11/Q16/Q20 oracles so the
#: driver's cross-engine hash check covers the derivation itself.
PARTSUPP_SQL_CTE = """
ps_base AS (
  SELECT p_partkey AS ps_partkey,
         ((p_partkey - 1 + t.j * greatest(1, CAST(floor(s_cnt / 4) AS BIGINT)))
            % s_cnt) + 1 AS ps_suppkey
  FROM part
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier) sc
  CROSS JOIN (VALUES (0), (1), (2), (3)) t(j)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(('0x' || substr(md5('psa|' || ps_partkey || '|' || ps_suppkey),
                              1, 6))::BIGINT % 9999 + 1 AS INTEGER)
           AS ps_availqty,
         ('0x' || substr(md5('psc|' || ps_partkey || '|' || ps_suppkey),
                         1, 6))::BIGINT % 99900 + 100 AS ps_supplycost_cents
  FROM ps_base
)
"""


def observed_partsupp(
    spark: SparkSession, sf_dir: str, part_keys: DataFrame | None = None
) -> DataFrame:
    """The OBSERVED supply-relationship table: distinct (l_partkey,
    l_suppkey) pairs actually present in lineitem, with a deterministic
    md5-derived ps_availqty in 1..100 (sized against real per-pair shipped
    quantities so Q20's half-sum threshold is a genuine filter, not a
    vacuous one — the stride-derived catalog's keys barely intersect the
    generator's lineitem pairs).

    Scale: one map-side-combinable DISTINCT over the fact table; the
    shuffle carries only the distinct key space (~4 suppliers/part), and
    it is the honest cost of reconstructing a relationship table from
    facts. Queries that never touch lineitem should use
    ``derived_partsupp`` instead (dimension-only, no fact scan).

    ``part_keys`` (optional, a (p_partkey) frame): semi-reduces the FACT
    SCAN before the pair-distinct, so the distinct's shuffle carries only
    candidate-part lines. Provably identical to filtering afterwards —
    the semi predicate is on the distinct key itself, and ps_availqty is
    a pure per-pair function — but the shuffle shrinks by the filter's
    selectivity (guide §3.2: reduce the big side before shuffling it).
    """
    li = _t(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    pairs = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    key = F.concat(
        F.col("ps_partkey").cast("string"),
        F.lit("|"),
        F.col("ps_suppkey").cast("string"),
    )
    return pairs.withColumn(
        "ps_availqty",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("opsa|"), key)), 1, 6), 16, 10)
            .cast("long") % 100 + 1
        ).cast("int"),
    )


#: DuckDB twin of ``observed_partsupp`` (same keys, same md5 arithmetic).
OBSERVED_PARTSUPP_SQL_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(('0x' || substr(md5('opsa|' || ps_partkey || '|' || ps_suppkey),
                              1, 6))::BIGINT % 100 + 1 AS INTEGER)
           AS ps_availqty
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
)
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (reference parity: SURVEY.md §2.10; unblocked by the
    derived partsupp): for ECONOMY parts in three target sizes, find each
    part's minimum-supply-cost supplier(s) within EUROPE, ranked by
    supplier account balance.

    Plan: part filter (size+type) sits ON the part scan and the derivation
    inherits it, so only qualifying parts ever produce partsupp rows; the
    EUROPE supplier side is dimension-sized and broadcast; the per-part
    min is a partial-aggregable groupBy over the (tiny) filtered partsupp
    followed by an equality join-back — the oracle keeps the textbook
    correlated-subquery form, so a green driver row proves the join-back
    rewrite. No fact table is touched at all.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_size").isin(*RP["q2_sizes"])
        & (F.col("p_type") == RP["q2_type"])
    )
    ps = derived_partsupp(spark, sf_dir, part=part)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(
        F.col("r_name") == RP["q2_region"]
    )
    euro_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(
        F.broadcast(euro_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    best = offers.groupBy(F.col("ps_partkey").alias("bk")).agg(
        F.min("ps_supplycost_cents").alias("best_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("ps_partkey") == F.col("bk"))
            & (F.col("ps_supplycost_cents") == F.col("best_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "ps_supplycost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: inventory value (availqty * supplycost, integer
    cents) per part held by NATION_7 suppliers, keeping parts whose value
    exceeds TWICE the average part's value. Textbook Q11 keeps parts above
    ``fraction * total`` with fraction = 0.0001/SF — scale-DEPENDENT (a
    fixed fraction empties the result as |part| grows); the 2x-average
    threshold (value * n_parts > 2 * total) is the scale-free equivalent
    and stays in exact integer domain.

    Plan: the nation's suppliers broadcast into the derived partsupp; ONE
    partial-aggregable groupBy(partkey); the (total, n_parts) pair is the
    same aggregate reduced to a single row and broadcast back — integer
    domain end to end, so the cross-engine hash is exact (the oracle casts
    DuckDB's HUGEINT sums back to BIGINT, per the repo's HUGEINT guard).
    """
    ps = derived_partsupp(spark, sf_dir)
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name") == RP["q11_nation"]
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    held = ps.join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    ).withColumn(
        "v", F.col("ps_availqty").cast("long") * F.col("ps_supplycost_cents")
    )
    per_part = held.groupBy("ps_partkey").agg(F.sum("v").alias("stock_value"))
    total = per_part.agg(
        F.sum("stock_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("stock_value") * F.col("n_parts")
            > F.lit(2) * F.col("total_value")
        )
        .select("ps_partkey", "stock_value")
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    bucket for non-ECONOMY parts outside Brand#2 in eight target sizes,
    excluding suppliers with negative account balance (stand-in for Q16's
    'Customer Complaints' comment filter — the driver schema carries no
    s_comment).

    Plan: part-side predicates push to the part scan (and thus prune the
    derivation); the excluded-supplier set is a broadcast LEFT ANTI join;
    count_distinct's Expand is over the already-tiny filtered partsupp,
    not a fact table.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != RP["q16_excl_brand"])
        & (F.col("p_type") != RP["q16_excl_type"])
        & (F.col("p_size").isin(*RP["q16_sizes"]))
    )
    ps = derived_partsupp(spark, sf_dir, part=part)
    complainers = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    attrs = part.select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(
            F.broadcast(complainers),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(attrs), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers holding EXCESS stock of 'red'
    parts — an observed-partsupp position whose availqty exceeds half the
    quantity that (part, supplier) pair actually shipped during 1997
    (pairs with no 1997 shipments are excluded, matching the textbook
    NULL-comparison semantics of the correlated scalar subquery).

    Plan: both fact passes are semi-reduced by a broadcast of the red-part
    keys BEFORE their groupBys (the pair-distinct for observed_partsupp
    and the 1997 quantity sum), so each composite-key shuffle carries only
    candidate-pair lines; the nation filter is broadcast-sized; the final
    supplier membership is a LEFT SEMI join. Textbook Q20 is a correlated
    scalar subquery — the oracle keeps that form, proving the join
    rewrite.
    """
    red_parts = _t(spark, sf_dir, "part").where(
        F.col("p_name").like(RP["q20_color"] + "%")
    )
    red_keys = F.broadcast(red_parts.select("p_partkey"))
    # r13: the red-keys semi-join is pushed BELOW observed_partsupp's
    # pair-distinct (part_keys=), so the distinct's shuffle carries only
    # candidate-part lines (~1/25 of the fact table) instead of the full
    # observed pair space — identical rows either way (the semi predicate
    # is on the distinct key; availqty is a pure per-pair function).
    ps = observed_partsupp(spark, sf_dir, part_keys=red_keys).select(
        "ps_partkey", "ps_suppkey", "ps_availqty"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= RP["q20_start"])
            & (F.col("l_shipdate") < RP["q20_end"])
        )
        .join(red_keys, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1997"))
    )
    excess = (
        ps.join(
            li,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty").cast("double") * 2 > F.col("qty_1997"))
        .select("ps_suppkey")
        .distinct()
    )
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name") == RP["q20_nation"]
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(excess),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )
