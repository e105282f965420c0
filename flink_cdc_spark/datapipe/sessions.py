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

Environment invariance: the micros derivation must NOT route through a
session-timezone-dependent cast.  The events parquet stores a naive
timestamp; depending on the reading session's confs Spark surfaces it as
TIMESTAMP_NTZ (inferTimestampNTZ on — wall clock) or TIMESTAMP_LTZ
(inferTimestampNTZ off — raw micros taken as UTC).  In BOTH regimes the
underlying int64 equals the DuckDB `epoch_us(ts)` value, so we branch on
the actual read type and extract that int64 without any tz conversion:
NTZ -> timestampdiff from the NTZ epoch (pure wall-clock arithmetic),
LTZ -> unix_micros directly.  The previous `unix_micros(CAST(ts AS
TIMESTAMP))` shifted by the ambient session zone on NTZ inputs, which is
exactly the rows-match/values-shift driver signature (CORRECTNESS_r07).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

DEFAULT_GAP_MINUTES = 24 * 60  # the synthetic events table spans months

# Exact-gap boundary probe rows unioned into the session_window contract
# (negative user ids cannot collide with the synthetic events table).
# Pins Spark 4.1.2's merge-on-touch rule — an event at exactly t+gap
# MERGES; only diff > gap splits — in the driver row itself, so the
# oracle can never silently diverge at the boundary again (the r8
# latent-divergence lesson: the fixture had no exact-gap pair).
BOUNDARY_PROBE_ROWS = [
    (-1, "2024-02-01 00:00:00", -1),
    (-1, "2024-02-02 00:00:00", -2),         # exactly gap later -> MERGED
    (-2, "2024-02-01 00:00:00", -3),
    (-2, "2024-02-02 00:00:00.000001", -4),  # 1 us past gap -> SPLIT
]


def with_boundary_probe(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """Union the exact-gap probe rows onto the (user, ts, event_id)
    projection, casting the probe timestamps to the events column's own
    timestamp flavor (NTZ or LTZ — session tz is pinned UTC by the
    contract harness, so both land on the same int64 micros)."""
    spark = events.sparkSession
    base = events.select(F.col(user), F.col(ts), F.col(event_id))
    probe = spark.createDataFrame(
        BOUNDARY_PROBE_ROWS, f"{user} bigint, {ts} string, {event_id} bigint"
    ).select(
        F.col(user),
        F.col(ts).cast(events.schema[ts].dataType).alias(ts),
        F.col(event_id),
    )
    return base.unionByName(probe)


def boundary_probe_table_sql(
    table: str = "events",
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> str:
    """DuckDB FROM-clause fragment: the same probe union for the oracle."""
    values = ",\n        ".join(
        f"({u}, TIMESTAMP '{t}', {e})" for u, t, e in BOUNDARY_PROBE_ROWS
    )
    return (
        f"(SELECT {user}, {ts}, {event_id} FROM {table}\n"
        f"      UNION ALL\n"
        f"      SELECT * FROM (VALUES\n        {values}\n"
        f"      ) probe({user}, {ts}, {event_id})) AS events_aug"
    )


def _epoch_micros_expr(events: DataFrame, ts: str) -> F.Column:
    """Session-timezone-invariant int64 micros for a timestamp column."""
    dtype = events.schema[ts].dataType
    if isinstance(dtype, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
            f"`{ts}`)"
        )
    if isinstance(dtype, T.TimestampType):
        return F.expr(f"unix_micros(`{ts}`)")
    # strings / other: parse as wall-clock NTZ, never through the session zone
    return F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
        f"cast(`{ts}` as timestamp_ntz))"
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """-> (user_id, session_idx, n_events, start_us, end_us)."""
    gap_us = gap_minutes * 60 * 1_000_000
    base = events.where(F.col(ts).isNotNull()).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t_us"),
        F.col(event_id).alias("eid"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc_nulls_first(), F.col("eid").asc_nulls_first()
    )
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


def sessionize_native(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """-> (user_id, n_events, start_us, end_us) via Spark's BUILT-IN
    `session_window` operator (the same code path Structured Streaming
    uses for session windows), gated against an independent gap-scan
    oracle.

    Boundary semantics MATCH `sessionize` at the gap boundary:
    session_window extends each event's window to [t, t+gap] and merges
    TOUCHING windows, so a successor at exactly `t+gap` is merged into
    the same session (verified empirically on Spark 4.1.2: two events
    exactly gap apart yield ONE session; pinned by
    tests/test_datapipe.py::test_session_window_native_boundary and an
    exact-boundary event pair in the contract fixture). A new session
    starts only on diff > gap; the oracle splits on strict > to match.

    Environment invariance: the window runs over a timestamp REBUILT
    from the invariant micros (timestampadd from the NTZ epoch), so the
    session zone can't shift it; outputs are min/max of the event micros
    (not the padded window bounds)."""
    base = events.where(F.col(ts).isNotNull()).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t_us"),
    )
    t_ntz = F.expr(
        "timestampadd(MICROSECOND, t_us, timestamp_ntz'1970-01-01 00:00:00')"
    )
    return (
        base.withColumn("t_ntz", t_ntz)
        .groupBy(
            "user_id",
            F.session_window("t_ntz", f"{gap_minutes} minutes"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
        )
        .select("user_id", "n_events", "start_us", "end_us")
    )


def sessionize_native_oracle_sql(
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
      WHERE {ts} IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, t_us, eid,
             CASE WHEN t_us - lag(t_us) OVER w > {gap_us} THEN 1 ELSE 0 END
               AS new_session
      FROM base
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY t_us ASC NULLS FIRST, eid ASC NULLS FIRST)
    ),
    numbered AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (
               PARTITION BY user_id
               ORDER BY t_us ASC NULLS FIRST, eid ASC NULLS FIRST
               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, count(*) AS n_events,
           min(t_us) AS start_us, max(t_us) AS end_us
    FROM numbered
    GROUP BY user_id, session_idx
    """


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
      WHERE {ts} IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, t_us, eid,
             CASE WHEN t_us - lag(t_us) OVER w > {gap_us} THEN 1 ELSE 0 END
               AS new_session
      FROM base
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY t_us ASC NULLS FIRST, eid ASC NULLS FIRST)
    ),
    numbered AS (
      SELECT user_id, t_us,
             CAST(sum(new_session) OVER (
                    PARTITION BY user_id
                    ORDER BY t_us ASC NULLS FIRST, eid ASC NULLS FIRST
                    ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT)
               AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           min(t_us) AS start_us, max(t_us) AS end_us
    FROM numbered
    GROUP BY user_id, session_idx
    """
