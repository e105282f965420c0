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
    """-> (event_id, user_id, t_us, n_trail, sum_trail_micros): per
    event, the count and exact integer micro-unit sum of the same user's
    event values in the trailing `days`-day window [t - days, t]
    (inclusive both ends; equal-instant peers are all included by the
    RANGE frame in both engines).

    Values are floored to integer micro-units per row BEFORE the
    cross-row sum (the repo-wide exact-arithmetic idiom), accumulated as
    DECIMAL(38,0) internally, and shipped as BIGINT — a per-user 7-day
    sum is bounded far below int64, and no decimal dtype may reach a
    contract result schema (collectors normalize Decimal asymmetrically)."""
    span_us = days * 86_400 * 1_000_000
    base = events.where(
        F.col(ts).isNotNull() & F.col(user).isNotNull()
    ).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t_us"),
        F.col(event_id).alias("event_id"),
        F.expr(f"CAST(floor({value} * 1000000 + 0.5) AS BIGINT)").alias("v_us"),
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
        F.sum(F.col("v_us").cast("decimal(38,0)")).over(w).cast("bigint").alias("sum_trail_micros"),
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
             CAST(floor({value} * 1000000 + 0.5) AS BIGINT) AS v_us
      FROM {table}
      WHERE {ts} IS NOT NULL AND {user} IS NOT NULL
    )
    SELECT event_id, user_id, t_us,
           CAST(count(*) OVER w AS BIGINT) AS n_trail,
           CAST(sum(CAST(v_us AS DECIMAL(38,0))) OVER w AS BIGINT) AS sum_trail_micros
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN {span_us} PRECEDING AND CURRENT ROW)
    """


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_DAYS = 7


def funnel_stages(
    events: DataFrame,
    steps=FUNNEL_STEPS,
    window_days: int = FUNNEL_WINDOW_DAYS,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """-> (user_id, stage, t1_us, t2_us, t3_us): ordered funnel
    completion per user — stage k means steps[0..k-1] happened in order,
    each subsequent step at-or-after the previous one, with the whole
    chain inside `window_days` of the first step. The classic
    event-analytics funnel.

    Scale shape: all three conditional-min windows share ONE
    partitionBy(user) exchange (no orderBy — unbounded frames), then a
    distinct per user; state per user is O(1). Chained projections keep
    each step's threshold available to the next without a second
    shuffle."""
    span_us = window_days * 86_400 * 1_000_000
    base = events.where(
        F.col(ts).isNotNull() & F.col(user).isNotNull()
    ).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t"),
        F.col(etype).alias("et"),
    )
    w = Window.partitionBy("user_id")
    s1, s2, s3 = steps
    step1 = base.withColumn(
        "t1", F.min(F.when(F.col("et") == s1, F.col("t"))).over(w)
    )
    step2 = step1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("et") == s2)
                & (F.col("t") >= F.col("t1"))
                & (F.col("t") <= F.col("t1") + span_us),
                F.col("t"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("et") == s3)
                & (F.col("t") >= F.col("t2"))
                & (F.col("t") <= F.col("t1") + span_us),
                F.col("t"),
            )
        ).over(w),
    )
    return (
        step3.select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
            F.col("t1").alias("t1_us"),
            F.col("t2").alias("t2_us"),
            F.col("t3").alias("t3_us"),
        )
        .distinct()
    )


def funnel_stages_oracle_sql(
    table: str = "events",
    steps=FUNNEL_STEPS,
    window_days: int = FUNNEL_WINDOW_DAYS,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> str:
    """Independent formulation: stepwise scalar aggregates via joins."""
    span_us = window_days * 86_400 * 1_000_000
    s1, s2, s3 = steps
    return f"""
    WITH base AS (
      SELECT {user} AS user_id, epoch_us({ts}) AS t, {etype} AS et
      FROM {table}
      WHERE {ts} IS NOT NULL AND {user} IS NOT NULL
    ),
    users AS (SELECT DISTINCT user_id FROM base),
    a AS (
      SELECT user_id, min(CASE WHEN et = '{s1}' THEN t END) AS t1
      FROM base GROUP BY user_id
    ),
    b AS (
      SELECT base.user_id,
             min(CASE WHEN et = '{s2}' AND t >= t1
                       AND t <= t1 + {span_us} THEN t END) AS t2
      FROM base JOIN a USING (user_id) GROUP BY base.user_id
    ),
    c AS (
      SELECT base.user_id,
             min(CASE WHEN et = '{s3}' AND t >= t2
                       AND t <= t1 + {span_us} THEN t END) AS t3
      FROM base JOIN a USING (user_id) JOIN b USING (user_id)
      GROUP BY base.user_id
    )
    SELECT users.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage,
           t1 AS t1_us, t2 AS t2_us, t3 AS t3_us
    FROM users
    LEFT JOIN a USING (user_id)
    LEFT JOIN b USING (user_id)
    LEFT JOIN c USING (user_id)
    """


def event_transitions(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    etype: str = "event_type",
) -> DataFrame:
    """-> (from_type, to_type, n): the per-user event-type transition
    counts (first-order Markov matrix of the behavioral sequences used
    for curriculum/sequence-model training data). One exchange on user +
    per-user sort for lead(), then a map-side-combined global count."""
    base = events.where(
        F.col(ts).isNotNull() & F.col(user).isNotNull()
    ).select(
        F.col(user).alias("user_id"),
        _epoch_micros_expr(events, ts).alias("t"),
        F.col(event_id).alias("eid"),
        F.col(etype).alias("from_type"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t").asc(), F.col("eid").asc()
    )
    pairs = base.withColumn("to_type", F.lead("from_type").over(w)).where(
        F.col("to_type").isNotNull()
    )
    return pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n")
    )


def event_transitions_oracle_sql(
    table: str = "events",
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
    etype: str = "event_type",
) -> str:
    return f"""
    WITH base AS (
      SELECT {user} AS user_id, epoch_us({ts}) AS t,
             {event_id} AS eid, {etype} AS from_type
      FROM {table}
      WHERE {ts} IS NOT NULL AND {user} IS NOT NULL
    ),
    pairs AS (
      SELECT from_type,
             lead(from_type) OVER (
               PARTITION BY user_id ORDER BY t ASC, eid ASC) AS to_type
      FROM base
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """


DAY_US = 86_400_000_000


def retention_cohorts(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """-> (cohort_day, day_offset, n_users): classic cohort retention —
    users grouped by first-seen day, counted once per active day offset.
    The product-analytics staple over event logs.

    Scale shape: the cohort day comes from a min() WINDOW over the user
    partition (reusing the one user exchange — not a groupBy + re-join,
    which would shuffle the events twice); (user, cohort, offset) is
    then deduplicated by an agg keyed on bounded-cardinality attributes
    and counted map-side. Three exchanges total, all on keys whose
    cardinality is corpus-sublinear (users; cohort x offset x user;
    cohort x offset).

    Determinism: day buckets are integer division of the
    session-timezone-invariant int64 micros — no date/tz functions, no
    floats anywhere.
    """
    base = (
        events.where(F.col(ts).isNotNull() & F.col(user).isNotNull())
        .select(
            F.col(user).alias("user_id"),
            _epoch_micros_expr(events, ts).alias("t_us"),
        )
        # integer `div`, not double `/` + cast: bit-exact like DuckDB's //
        .select("user_id", F.expr(f"t_us div {DAY_US}").alias("day"))
    )
    cohort = base.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    active = (
        cohort.select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset", "user_id")
        .agg(F.lit(1))
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


def retention_cohorts_oracle_sql(
    table: str = "events",
    user: str = "user_id",
    ts: str = "ts",
) -> str:
    return f"""
    WITH base AS (
      SELECT {user} AS user_id,
             CAST(epoch_us({ts}) // {DAY_US} AS BIGINT) AS day
      FROM {table}
      WHERE {ts} IS NOT NULL AND {user} IS NOT NULL
    ), cohort AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM base
    ), active AS (
      SELECT DISTINCT cohort_day, day - cohort_day AS day_offset, user_id
      FROM cohort
    )
    SELECT cohort_day, day_offset, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active GROUP BY cohort_day, day_offset
    """


QUANTILE_PS = (0.5, 0.9, 0.99)


def value_quantiles(
    events: DataFrame,
    etype: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """-> (event_type, n, p50_cents, p90_cents, p99_cents): exact
    discrete quantiles of the value distribution per event type — the
    SQL-standard ordered-set aggregate PERCENTILE_DISC (smallest element
    whose cumulative distribution reaches p), verified differentially
    against DuckDB's quantile_disc on randomized data before the oracle
    was trusted.

    Determinism: disc (not cont) on integer cents — the aggregate picks
    an ACTUAL element, so there is no interpolation arithmetic to
    diverge. One exchange on the group key; Spark's exact percentile
    buffers a group's values, so group cardinality bounds memory — for
    corpus-sized groups the approx_percentile sketch is the scale path;
    this op gates the exact operator the sketch is judged against."""
    cents = F.expr(f"CAST(floor({value} * 100 + 0.5) AS BIGINT)")
    base = events.where(F.col(value).isNotNull()).select(
        F.col(etype).alias("event_type"), cents.alias("v_cents")
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")] + [
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY v_cents)")
        .cast("bigint")
        .alias(f"p{int(p * 100)}_cents")
        for p in QUANTILE_PS
    ]
    return base.groupBy("event_type").agg(*aggs)


def value_quantiles_oracle_sql(
    table: str = "events",
    etype: str = "event_type",
    value: str = "value",
) -> str:
    cents = f"CAST(floor({value} * 100 + 0.5) AS BIGINT)"
    qs = ",\n           ".join(
        f"CAST(quantile_disc(v_cents, {p}) AS BIGINT) AS p{int(p * 100)}_cents"
        for p in QUANTILE_PS
    )
    return f"""
    WITH base AS (
      SELECT {etype} AS event_type, {cents} AS v_cents
      FROM {table} WHERE {value} IS NOT NULL
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {qs}
    FROM base GROUP BY event_type
    """


OUTLIER_K = 3  # the classic 3-sigma rule


def value_outliers(
    events: DataFrame,
    etype: str = "event_type",
    event_id: str = "event_id",
    value: str = "value",
    k: int = OUTLIER_K,
) -> DataFrame:
    """-> (event_id, event_type, v_cents): events whose value deviates
    from their type's mean by more than k population standard deviations
    — the z-score outlier rule made INTEGER-EXACT by squaring:

        |x - mean| > k * std
      <=>  (n*x - sum)^2 > k^2 * (n*sumsq - sum^2)

    so no mean/std float is ever materialized and both engines agree
    bit-for-bit (all terms DECIMAL(38,0) products of integer cents).

    Overflow is a RAISE, never a silent drop: with non-ANSI Spark a
    DECIMAL(38,0) overflow yields NULL, so the predicate would silently
    discard exactly the extreme rows an outlier detector exists to find
    (DuckDB's HUGEINT arithmetic would NOT overflow — a silent
    cross-engine divergence). Both squared terms are bounded by
    4*(n*max|x|)^2, so the per-type guard n*max|x| <= 1e18 (checked on
    the |event types|-row aggregate via assert_true, essentially free)
    proves every product stays inside DECIMAL(38,0).

    Scale shape: one map-side-combined aggregate to |event types| rows,
    broadcast back, then a map-only filter — the whole detection is one
    exchange on a bounded key."""
    cents = F.expr(f"CAST(floor({value} * 100 + 0.5) AS BIGINT)")
    base = events.where(F.col(value).isNotNull()).select(
        F.col(event_id).alias("event_id"),
        F.col(etype).alias("event_type"),
        cents.alias("v_cents"),
    )
    d = lambda c: c.cast("decimal(38,0)")
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d(F.col("v_cents"))).cast("decimal(38,0)").alias("s"),
        F.sum(d(F.col("v_cents")) * d(F.col("v_cents")))
        .cast("decimal(38,0)")
        .alias("sq"),
        F.max(F.abs(F.col("v_cents"))).cast("bigint").alias("m"),
    ).withColumn(
        "__guard",
        # k folds into the bound: rhs <= k^2*(n*max)^2 fits DECIMAL(38,0)
        # iff k*n*max < 1e19, and lhs^2 <= (2*n*max)^2 needs
        # n*max < 5e18 — max(k, 2) covers both in one inequality (the
        # prior fixed 1e18 bound silently stopped holding for k >= 10).
        # STRICT <: at n*max = 1e19//k exactly, both squares can land on
        # exactly 10^38, one past DECIMAL(38,0)'s max of 10^38-1.
        F.assert_true(
            d(F.col("n")) * d(F.col("m"))
            < F.lit(10**19 // max(k, 2)).cast("decimal(38,0)"),
            F.lit(
                f"value_outliers: n*max|cents| exceeds 1e19/{max(k, 2)} — the "
                "squared z-score terms would overflow DECIMAL(38,0); "
                "pre-scale the value column"
            ),
        ),
    )
    joined = base.join(F.broadcast(stats), "event_type")
    lhs = d(F.col("n")) * d(F.col("v_cents")) - F.col("s")
    rhs = (
        F.lit(k * k)
        * (d(F.col("n")) * F.col("sq") - F.col("s") * F.col("s"))
    )
    # __guard is NULL on success; referencing it in the filter keeps the
    # assert from being pruned as an unused column
    return joined.where(F.col("__guard").isNull() & (lhs * lhs > rhs)).select(
        "event_id", "event_type", "v_cents"
    )


def value_outliers_oracle_sql(
    table: str = "events",
    etype: str = "event_type",
    event_id: str = "event_id",
    value: str = "value",
    k: int = OUTLIER_K,
) -> str:
    cents = f"CAST(floor({value} * 100 + 0.5) AS BIGINT)"
    return f"""
    WITH base AS (
      SELECT {event_id} AS event_id, {etype} AS event_type,
             {cents} AS v_cents
      FROM {table} WHERE {value} IS NOT NULL
    ),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(v_cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(v_cents AS DECIMAL(38,0))
                      * CAST(v_cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq
      FROM base GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.v_cents
    FROM base b JOIN stats st USING (event_type)
    WHERE (CAST(st.n AS DECIMAL(38,0)) * CAST(b.v_cents AS DECIMAL(38,0)) - st.s)
          * (CAST(st.n AS DECIMAL(38,0)) * CAST(b.v_cents AS DECIMAL(38,0)) - st.s)
        > {k * k} * (CAST(st.n AS DECIMAL(38,0)) * st.sq - st.s * st.s)
    """
