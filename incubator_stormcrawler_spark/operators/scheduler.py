"""Refetch scheduling — column-expression re-expression of the reference's
``Scheduler`` hierarchy.

DefaultScheduler (core/.../persistence/DefaultScheduler.java:103-150,
defaults crawler-default.yaml:276-288):
  FETCHED      → now + 1440 min
  FETCH_ERROR  → now + 120 min
  REDIRECTION  → now + 1440 min (same as FETCHED by default)
  ERROR        → never (sentinel 2200-01-01,
                 external/sql/.../StatusUpdaterBolt.java:50)
  DISCOVERED   → now

AdaptiveScheduler (core/.../persistence/AdaptiveScheduler.java:121, doc
:33-119): on refetch compare content signature with previous; unchanged →
interval ×(1+rate_incr) capped at max; changed → ×(1−rate_decr) floored at
min; DISCOVERED gets the default interval.

Both are pure ``CASE WHEN`` column expressions — whole-stage-codegen'd by
Catalyst, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import NEVER_FETCH_DATE

DEFAULT_INTERVALS_MIN = {
    "FETCHED": 1440,
    "FETCH_ERROR": 120,
    "REDIRECTION": 1440,
    "DISCOVERED": 0,
}


def schedule_next_fetch(
    status: Column,
    now: str,
    intervals: dict[str, int] | None = None,
) -> Column:
    """next_fetch_date as a function of post-merge status (DefaultScheduler)."""
    iv = {**DEFAULT_INTERVALS_MIN, **(intervals or {})}
    now_ts = F.lit(now).cast("timestamp")
    expr = F.when(status == "ERROR", F.lit(NEVER_FETCH_DATE).cast("timestamp"))
    for st, minutes in iv.items():
        expr = expr.when(status == st, F.timestamp_add("MINUTE", F.lit(minutes), now_ts))
    return expr.otherwise(now_ts)


def schedule_with_custom_rules(
    status: Column,
    metadata: Column,
    now: str,
    custom_rules: list[tuple[str | None, str, str, int]],
    intervals: dict[str, int] | None = None,
) -> Column:
    """DefaultScheduler with per-metadata custom intervals
    (DefaultScheduler.java:56-97: ``fetchInterval(.STATUS)?.key=value:
    minutes`` — first matching rule wins, then the per-status default).

    ``custom_rules``: ordered [(status-or-None, md_key, md_value, minutes)].
    ``metadata``: the MAP<STRING,ARRAY<STRING>> column.
    """
    now_ts = F.lit(now).cast("timestamp")
    expr = None
    for rule_status, key, value, minutes in custom_rules:
        cond = F.array_contains(
            F.coalesce(F.try_element_at(metadata, F.lit(key)), F.array().cast("array<string>")),
            value,
        )
        if rule_status is not None:
            cond = cond & (status == rule_status)
        hit = F.timestamp_add("MINUTE", F.lit(minutes), now_ts)
        expr = F.when(cond, hit) if expr is None else expr.when(cond, hit)
    default = schedule_next_fetch(status, now, intervals)
    return default if expr is None else expr.otherwise(default)


def round_date(scheduled: Column, unit: str = "SECOND") -> Column:
    """Date rounding before the frontier write
    (AbstractStatusUpdaterBolt.java:229-232: ``status.updater.unit.round.date``
    — truncate nextFetchDate to SECOND/MINUTE/HOUR so store comparisons and
    partition layouts don't fragment on sub-unit noise)."""
    unit = unit.upper()
    if unit not in ("SECOND", "MINUTE", "HOUR", "DAY"):
        raise ValueError(f"unsupported rounding unit: {unit}")
    return F.date_trunc(unit.lower(), scheduled)


def schedule_as_is(
    scheduled: Column, metadata: Column, as_is_key: str = "nextFetchDate"
) -> Column:
    """AS_IS_NEXTFETCHDATE passthrough
    (AbstractStatusUpdaterBolt.java:165-178): an explicitly-set metadata
    date overrides the scheduler's output."""
    override = F.try_element_at(
        F.coalesce(
            F.try_element_at(metadata, F.lit(as_is_key)),
            F.array().cast("array<string>"),
        ),
        F.lit(1),
    ).cast("timestamp")
    return F.coalesce(override, scheduled)


def adaptive_interval(
    status: Column,
    signature: Column,
    signature_old: Column,
    prev_interval_min: Column,
    default_min: int = 1440,
    min_min: int = 60,
    max_min: int = 10080,
    rate_incr: float = 0.5,
    rate_decr: float = 0.5,
) -> Column:
    """AdaptiveScheduler's fetch-interval update rule as one expression.

    Returns the new interval in minutes; pair with ``now + interval`` to set
    next_fetch_date and persist it back as the ``fetchInterval`` metadata the
    reference writes (AdaptiveScheduler.java doc :33-119).
    """
    prev = F.coalesce(prev_interval_min, F.lit(default_min)).cast("double")
    unchanged = signature.isNotNull() & signature_old.isNotNull() & (
        signature == signature_old
    )
    grown = F.least(prev * F.lit(1.0 + rate_incr), F.lit(float(max_min)))
    shrunk = F.greatest(prev * F.lit(1.0 - rate_decr), F.lit(float(min_min)))
    return (
        F.when(status != "FETCHED", F.lit(float(default_min)))
        .when(unchanged, grown)
        .otherwise(shrunk)
    )
