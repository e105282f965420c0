"""Event sessionization — gap-based session assignment over event logs.

The training-data op that turns interaction/event streams into
per-session training examples (conversation grouping, behavioral
sequence mining): events of one user belong to one session while
consecutive gaps stay under the threshold; a gap above it starts a new
session.

Scale shape: ONE hash shuffle on user_id, then per-user window functions
(lag -> new-session flag -> running sum = session index) and one
aggregation — the canonical sessionization plan. State per user is a
window frame, not a materialized history; skewed users are bounded by
their own event counts (salt the user key if one user dominates).

Determinism: ordering is (ts, event_id) so equal timestamps cannot
reorder between engines; all arithmetic is integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_GAP_MINUTES = 24 * 60  # the synthetic events table spans months


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """-> (user_id, session_idx, n_events, start_us, end_us)."""
    gap_us = gap_minutes * 60 * 1_000_000
    base = events.select(
        F.col(user).alias("user_id"),
        F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP))").alias("t_us"),
        F.col(event_id).alias("eid"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "eid")
    flagged = base.withColumn(
        "new_session",
        F.when(
            F.col("t_us") - F.lag("t_us").over(w) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) + 1,
    )
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
        )
    )


def sessionize_oracle_sql(
    table: str = "events",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
    WITH base AS (
      SELECT {user} AS user_id, epoch_us({ts}) AS t_us, {event_id} AS eid
      FROM {table}
    ),
    flagged AS (
      SELECT user_id, t_us, eid,
             CASE WHEN t_us - lag(t_us) OVER w > {gap_us} THEN 1 ELSE 0 END
               AS new_session
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, eid)
    ),
    numbered AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, eid
                                    ROWS UNBOUNDED PRECEDING) + 1
               AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           min(t_us) AS start_us, max(t_us) AS end_us
    FROM numbered
    GROUP BY user_id, session_idx
    """
