"""Temporal enrichment operators over event streams: as-of join and
trailing-window aggregate features — the feature-engineering steps that
turn raw event/transaction logs into model-ready training rows.

Beyond-reference ops (the reference pipeline has no temporal-join
operator); each has its own DuckDB oracle.

Scale shapes:
  * The as-of join is the MERGE formulation: tag and union both inputs,
    ONE hash exchange on the join key, one per-key sort, and a running
    `last(ignorenulls)` carry — never the events x orders range
    cross-join (which blows up quadratically per key). This is how
    kdb/Flink temporal joins and pandas.merge_asof scale out; state per
    key is a sort run, not a materialized history.
  * Rolling features are ONE exchange on the user key + a RANGE-framed
    window over integer microseconds; each user's frame is bounded by
    their own event count (salt a dominant user if needed).

Determinism: all time arithmetic is integer microseconds via the
session-timezone-invariant derivation shared with sessions.py; rolling
sums run on DECIMAL(18,6) so Spark and DuckDB agree bit-for-bit (double
summation order differs between engines); as-of ties (several orders at
the same timestamp) resolve to the highest order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sessions import _epoch_micros_expr

ROLLING_DAYS = 7


def asof_enrich(
    events: DataFrame,
    orders: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    right_key: str = "o_custkey",
    right_ts: str = "o_orderdate",
    right_id: str = "o_orderkey",
) -> DataFrame:
    """-> (event_id, user_id, t_us, order_key, order_t_us): each event
    joined to the latest order of the same user AT or BEFORE the event
    time (order_key/order_t_us NULL when the user has no prior order).

    Merge formulation: union both sides tagged, sort per user by
    (t_us, side, order_key) — orders sort before events at the same
    instant, so at-or-before includes ties — and carry the last seen
    order with last(ignorenulls) over an unbounded-preceding row frame.
    """
    left = events.where(
        F.col(ts).isNotNull() & F.col(user).isNotNull()
    ).select(
        F.col(user).alias("uid"),
        _epoch_micros_expr(events, ts).alias("t_us"),
        F.lit(1).alias("is_event"),
        F.col(event_id).alias("event_id"),
        F.lit(None).cast("bigint").alias("okey"),
    )
    right = orders.where(
        F.col(right_ts).isNotNull() & F.col(right_key).isNotNull()
    ).select(
        F.col(right_key).alias("uid"),
        _epoch_micros_expr(orders, right_ts).alias("t_us"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col(right_id).alias("okey"),
    )
    merged = left.unionByName(right)
    # orders ascending by okey so the carry resolves same-instant ties to
    # the HIGHEST order key; event rows are okey-null and cannot disturb
    # the carry, so their relative order is irrelevant to correctness
    w = (
        Window.partitionBy("uid")
        .orderBy(
            F.col("t_us").asc(),
            F.col("is_event").asc(),
            F.col("okey").asc_nulls_last(),
            F.col("event_id").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "uid",
        "t_us",
        "is_event",
        "event_id",
        F.last("okey", ignorenulls=True).over(w).alias("order_key"),
        F.last(
            F.when(F.col("is_event") == 0, F.col("t_us")), ignorenulls=True
        ).over(w).alias("order_t_us"),
    )
    return carried.where(F.col("is_event") == 1).select(
        "event_id",
        F.col("uid").alias("user_id"),
        "t_us",
        "order_key",
        "order_t_us",
    )


def asof_enrich_oracle_sql(
    events: str = "events",
    orders: str = "orders",
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    right_key: str = "o_custkey",
    right_ts: str = "o_orderdate",
    right_id: str = "o_orderkey",
) -> str:
    """Independent naive formulation: range left-join every prior order,
    keep rank 1 by (date DESC, key DESC)."""
    return f"""
    SELECT event_id, user_id, t_us, order_key, order_t_us FROM (
      SELECT e.{event_id} AS event_id, e.{user} AS user_id,
             epoch_us(e.{ts}) AS t_us,
             o.{right_id} AS order_key,
             epoch_us(o.{right_ts}) AS order_t_us,
             row_number() OVER (
               PARTITION BY e.{event_id}
               ORDER BY o.{right_ts} DESC NULLS LAST,
                        o.{right_id} DESC NULLS LAST) AS rk
      FROM {events} e
      LEFT JOIN {orders} o
        ON o.{right_key} = e.{user}
       AND o.{right_ts} <= e.{ts}
       AND o.{right_ts} IS NOT NULL
      WHERE e.{ts} IS NOT NULL AND e.{user} IS NOT NULL
    ) WHERE rk = 1
    """


def rolling_event_features(
    events: DataFrame,
    days: int = ROLLING_DAYS,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """-> (event_id, user_id, t_us, n_trail, sum_trail): per event, the
    count and exact-decimal sum of the same user's events in the trailing
    `days`-day window [t - days, t] (inclusive both ends; equal-instant
    peers are all included by the RANGE frame in both engines)."""
    span_us = days * 86_400 * 1_000_000
    base = events.where(
        F.col(ts).isNotNull() & F.col(user).isNotNull()
    ).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t_us"),
        F.col(event_id).alias("event_id"),
        F.col(value).cast("decimal(18,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc())
        .rangeBetween(-span_us, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "t_us",
        F.count("*").over(w).cast("bigint").alias("n_trail"),
        F.sum("v").over(w).cast("decimal(38,6)").alias("sum_trail"),
    )


def rolling_event_features_oracle_sql(
    table: str = "events",
    days: int = ROLLING_DAYS,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    value: str = "value",
) -> str:
    span_us = days * 86_400 * 1_000_000
    return f"""
    WITH base AS (
      SELECT {user} AS user_id, epoch_us({ts}) AS t_us,
             {event_id} AS event_id,
             CAST({value} AS DECIMAL(18,6)) AS v
      FROM {table}
      WHERE {ts} IS NOT NULL AND {user} IS NOT NULL
    )
    SELECT event_id, user_id, t_us,
           CAST(count(*) OVER w AS BIGINT) AS n_trail,
           CAST(sum(v) OVER w AS DECIMAL(38,6)) AS sum_trail
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN {span_us} PRECEDING AND CURRENT ROW)
    """
