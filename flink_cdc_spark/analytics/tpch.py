"""TPC-H-shaped analytic queries (Q1 pricing summary, Q3 shipping
priority) expressed Spark-first: pruned scans with pushed filters,
broadcast dimension joins, map-side-combined aggregation.

Cross-engine float discipline: the testdata stores money/discount/tax as
DOUBLE; summing doubles is order-dependent and WILL diverge between
Spark and DuckDB. All aggregates therefore run on exact integers derived
deterministically per row — cents = floor(price*100 + 0.5) (floor is
exact on doubles in both engines; no round-tie-mode ambiguity) and
micro-unit discount factors — accumulated as DECIMAL(38,0), which both
engines sum exactly.

Scale notes: Q1 is a single scan + hash aggregate (partial map-side
combine; group cardinality 6). Q3's customer filter reduces the dim to
~1/5 — scale-proportional, so it carries NO hard broadcast hint: AQE
(64 MB adaptive threshold) broadcasts it at runtime whenever it fits,
and the plan degrades to a shuffle join instead of OOMing at 100 TB.
Broadcast-hint discipline for the whole family lives in ``hints.py``
(``broadcast_if_bounded``): hard hints ONLY on fixed-cardinality dims
(region/nation), provably-sublinear frames (HAVING survivors), and
1-row scalars. The final top-10 is a total order on the aggregated
relation (group cardinality = order keys, bounded), with a fully
deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .hints import FIXED, SCALAR, SCALE_PROPORTIONAL, broadcast_if_bounded

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"

# exact per-row integer derivations (identical in Spark SQL and DuckDB)
_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_MICRO = "CAST(floor({col} * 1000000 + 0.5) AS BIGINT)"


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = Q1_CUTOFF) -> DataFrame:
    """-> (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_micros, count_order)."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr(_CENTS.format(col="l_quantity")).alias("qty_c"),
            cents.alias("cents"),
            (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("disc_prod"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Terminal types: the DECIMAL(38,0) accumulation stays internal
            # (exact cross-engine sums); the OUTPUT schema carries no decimal
            # because collectors normalize Decimal asymmetrically (pandas/Arrow
            # float64-ization). Cents sums provably fit int64 (1e7 cents/row x
            # 1e11 rows/group ~ 1e18 < 2^63); micro-unit products (1e13/row)
            # do not at scale, so they ship as exact STRING digits.
            F.sum(F.col("qty_c").cast("decimal(38,0)")).cast("bigint").alias("sum_qty_cents"),
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("sum_base_cents"),
            F.sum("disc_prod").cast("decimal(38,0)").cast("string").alias("sum_disc_micros"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def q1_oracle_sql(table: str = "lineitem", cutoff: str = Q1_CUTOFF) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    qty = _CENTS.format(col="l_quantity")
    return f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST({qty} AS DECIMAL(38,0))) AS BIGINT) AS sum_qty_cents,
           CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS BIGINT) AS sum_base_cents,
           CAST(CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS DECIMAL(38,0)) AS VARCHAR) AS sum_disc_micros,
           CAST(count(*) AS BIGINT) AS count_order
    FROM {table}
    WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = Q3_SEGMENT,
    date: str = Q3_DATE,
) -> DataFrame:
    """-> top-10 (l_orderkey, revenue_micros, o_orderdate_us) by revenue
    among orders of `segment` customers placed before `date` with line
    items shipped after it."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    cut = F.lit(date).cast("timestamp_ntz")
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < cut).select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
            "cast(o_orderdate as timestamp_ntz))"
        ).alias("o_orderdate_us"),
    )
    li = lineitem.where(F.col("l_shipdate") > cut).select(
        "l_orderkey",
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    )
    return (
        li.join(
            # segment-filtered customer is ~1/5 of customer — scale-
            # proportional, so no hard hint; AQE broadcasts when it fits
            ords.join(
                broadcast_if_bounded(cust, SCALE_PROPORTIONAL),
                ords.o_custkey == cust.c_custkey,
            ).select(
                "o_orderkey", "o_orderdate_us"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate_us")
        # per-order micro sum is bounded (<=7 line items x ~7e13) — fits int64
        .agg(F.sum("rev").cast("decimal(38,0)").cast("bigint").alias("revenue_micros"))
        .orderBy(
            F.col("revenue_micros").desc(),
            F.col("o_orderdate_us").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
        .select("l_orderkey", "revenue_micros", "o_orderdate_us")
    )


def q3_oracle_sql(
    customer: str = "customer",
    orders: str = "orders",
    lineitem: str = "lineitem",
    segment: str = Q3_SEGMENT,
    date: str = Q3_DATE,
) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    return f"""
    SELECT l_orderkey,
           CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS BIGINT) AS revenue_micros,
           epoch_us(o_orderdate) AS o_orderdate_us
    FROM {customer}
    JOIN {orders} ON c_custkey = o_custkey
    JOIN {lineitem} ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{segment}'
      AND o_orderdate < TIMESTAMP '{date} 00:00:00'
      AND l_shipdate > TIMESTAMP '{date} 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_micros DESC, o_orderdate_us ASC, l_orderkey ASC
    LIMIT 10
    """


Q5_REGION = "ASIA"
Q5_DATE_FROM = "1996-01-01"
Q5_DATE_TO = "1997-01-01"


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    r_name: str = Q5_REGION,
    date_from: str = Q5_DATE_FROM,
    date_to: str = Q5_DATE_TO,
) -> DataFrame:
    """-> (n_name, revenue_micros): Q5's six-table star — revenue by
    nation for `r_name`-region customers served by SAME-NATION suppliers
    within the order-date year.

    Plan shape: region->nation is a broadcast cascade (fixed 25-row
    dim) onto supplier and customer; the pruned supplier/customer slices
    themselves are scale-proportional, so their fact joins carry no hard
    hint — AQE broadcasts them while they fit and falls back to shuffle
    at scale. Orders carries its pushed date-range filter into the
    lineitem join on orderkey; the c_nationkey = s_nationkey locality
    constraint is enforced on the joined row. One guaranteed big-fact
    shuffle join (lineitem x orders), final 5-row aggregate map-side
    combined."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    nations = nation.join(
        broadcast_if_bounded(region.where(F.col("r_name") == r_name), FIXED),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        broadcast_if_bounded(nations, FIXED),
        customer.c_nationkey == nations.n_nationkey,
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nk"), "n_name")
    supp = supplier.join(
        broadcast_if_bounded(nations.select("n_nationkey"), FIXED),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("s_nationkey").alias("supp_nk"))
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    )
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        # region-pruned supplier is ~1/5 of supplier — scale-proportional
        .join(
            broadcast_if_bounded(supp, SCALE_PROPORTIONAL),
            F.col("l_suppkey") == supp.s_suppkey,
        )
        .where(F.col("cust_nk") == F.col("supp_nk"))
    )
    return (
        joined.groupBy("n_name")
        # per-nation micro sum is corpus-proportional (can exceed int64 at
        # 100 TB) — ship exact digits as STRING; order on the decimal value
        # BEFORE the terminal cast so the sort stays numeric.
        .agg(F.sum("rev").cast("decimal(38,0)").alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("n_name").asc())
        .select("n_name", F.col("_rev_dec").cast("string").alias("revenue_micros"))
    )


def q5_oracle_sql(
    r_name: str = Q5_REGION,
    date_from: str = Q5_DATE_FROM,
    date_to: str = Q5_DATE_TO,
) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    return f"""
    SELECT n_name,
           CAST(CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS DECIMAL(38,0)) AS VARCHAR) AS revenue_micros
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{r_name}'
      AND o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
      AND o_orderdate < TIMESTAMP '{date_to} 00:00:00'
    GROUP BY n_name
    ORDER BY sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) DESC, n_name ASC
    """


Q18_QTY_CENTS = 180 * 100


def q18_large_volume_customer(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_cents: int = Q18_QTY_CENTS,
) -> DataFrame:
    """-> top-100 (c_custkey, o_orderkey, o_orderdate_us,
    o_total_cents, sum_qty_cents): Q18 — orders whose total line
    quantity exceeds the threshold, with their customer.

    Plan shape: ONE exchange aggregates lineitem by orderkey with the
    HAVING filter applied before anything joins. The qualifying-order
    relation is a constant (non-vanishing) fraction of orders — per-order
    quantity is bounded by <=7 lineitems x qty<=50, so the >180 survivors
    scale linearly with the corpus — therefore it reaches the join
    UN-hinted and AQE picks broadcast only when the runtime size fits
    (it does at every test scale). Top-100 is TakeOrderedAndProject with
    a fully deterministic tie-break."""
    qty = F.expr(_CENTS.format(col="l_quantity"))
    heavy = (
        lineitem.select("l_orderkey", qty.alias("qc"))
        .groupBy("l_orderkey")
        # per-order qty-cents sum is bounded (<=7 items x 5000) — fits int64
        .agg(F.sum(F.col("qc").cast("decimal(38,0)")).cast("bigint").alias("sum_qty_cents"))
        .where(F.col("sum_qty_cents") > qty_cents)
    )
    ords = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
            "cast(o_orderdate as timestamp_ntz))"
        ).alias("o_orderdate_us"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("o_total_cents"),
    )
    return (
        ords.join(
            # heavy is a constant fraction of orders (per-order qty is
            # bounded by <=7 lineitems x qty<=50, so the HAVING>180
            # survivors don't vanish as the corpus grows) — same shape
            # as Q17's per_part aggregate: AQE decides from runtime size.
            broadcast_if_bounded(heavy, SCALE_PROPORTIONAL),
            ords.o_orderkey == heavy.l_orderkey,
        )
        .join(customer.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "o_orderkey", "o_orderdate_us", "o_total_cents", "sum_qty_cents")
        .orderBy(
            F.col("o_total_cents").desc(),
            F.col("o_orderdate_us").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


def q18_oracle_sql(qty_cents: int = Q18_QTY_CENTS) -> str:
    qty = _CENTS.format(col="l_quantity")
    cents = _CENTS.format(col="o_totalprice")
    return f"""
    WITH heavy AS (
      SELECT l_orderkey,
             CAST(sum(CAST({qty} AS DECIMAL(38,0))) AS BIGINT) AS sum_qty_cents
      FROM lineitem GROUP BY l_orderkey
      HAVING sum_qty_cents > {qty_cents}
    )
    SELECT c_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           CAST({cents} AS BIGINT) AS o_total_cents, sum_qty_cents
    FROM orders
    JOIN heavy ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_total_cents DESC, o_orderdate_us ASC, o_orderkey ASC
    LIMIT 100
    """


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """-> (c_count, custdist): TPC-H Q13 — the distribution of orders
    per customer INCLUDING zero-order customers (the left outer join's
    null-preserving branch feeds the c_count=0 bucket, which an inner
    join would silently drop).

    Plan shape: orders aggregates to (custkey, count) first — one
    exchange on the corpus-sublinear customer key — and the LEFT join
    probes customer against that reduced relation, never raw orders;
    the final distribution is a second map-side-combined aggregate over
    a bounded key (distinct order counts). Integer-only, no float
    discipline needed."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_count")
    )
    joined = customer.select("c_custkey").join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    )
    return (
        joined.select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


def q13_oracle_sql() -> str:
    return """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COALESCE(cnt, 0) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      ) oc ON c_custkey = o_custkey
    )
    GROUP BY c_count
    """


# -- Q4: order priority checking (EXISTS semi-join shape) --------------------
#
# Adapted to the testdata schema (no l_commitdate/l_receiptdate): an order
# counts when ANY of its line items shipped after the order date — the same
# decorrelated EXISTS plan as the literal Q4 (orders semi-join lineitem on
# orderkey with a non-equi residual), a shape Catalyst executes as one
# LeftSemi join with the date predicate as the join residual, never a
# per-order subquery. Reference scope: Flink SQL's EXISTS rewrite.

Q4_FROM = "1996-07-01"
Q4_TO = "1996-10-01"


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = Q4_FROM,
    date_to: str = Q4_TO,
) -> DataFrame:
    """-> (o_orderpriority, order_count): quarter's orders with at least
    one late-shipped line item, counted by priority."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    hit = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > ords.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q4_oracle_sql(date_from: str = Q4_FROM, date_to: str = Q4_TO) -> str:
    return f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


# -- Q6: forecasting revenue change (pure scan-aggregate) --------------------

Q6_FROM = "1996-01-01"
Q6_TO = "1997-01-01"
Q6_DISC_LO = 40_000  # micros
Q6_DISC_HI = 60_000
Q6_QTY = 24


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """-> one row (revenue_exact, n): sum(extendedprice * discount) over
    the year/discount-band/quantity slice — the canonical
    full-pushdown scan: every predicate reaches the parquet reader,
    zero joins, one map-side-combined global aggregate. Revenue rides
    as cents x discount-micros (1e-8 dollars), summed DECIMAL(38,0),
    shipped as exact STRING digits (corpus-proportional — int64 is not
    provably safe at 100 TB)."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp_ntz"))
            & (F.col("l_quantity") < Q6_QTY)
        )
        .select(cents.alias("c"), disc.alias("d"))
        .where(F.col("d").between(Q6_DISC_LO, Q6_DISC_HI))
        .agg(
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("d"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("revenue_exact"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def q6_oracle_sql() -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    return f"""
    SELECT CAST(CAST(sum(CAST({cents} AS DECIMAL(38,0)) * {disc}) AS DECIMAL(38,0)) AS VARCHAR)
             AS revenue_exact,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q6_TO} 00:00:00'
      AND l_quantity < {Q6_QTY}
      AND {disc} BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
    """


# -- Q10: returned item reporting (top-20 with dim joins) --------------------

Q10_FROM = "1996-01-01"
Q10_TO = "1996-04-01"
Q10_TOPN = 20


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = Q10_FROM,
    date_to: str = Q10_TO,
) -> DataFrame:
    """-> top-20 (c_custkey, c_name, n_name, acctbal_cents,
    revenue_micros): customers who returned the most revenue in the
    quarter. Plan shape: the quarter filter prunes orders BEFORE the
    lineitem join (one big shuffle), the returnflag filter prunes
    lineitem at the scan; customer joins the per-customer aggregate
    (corpus-sublinear), nation broadcasts; deterministic top-20. A
    customer's quarterly returned revenue is bounded — BIGINT is safe."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    rets = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    )
    per_cust = (
        rets.join(ords, rets.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").cast("decimal(38,0)").cast("bigint").alias("revenue_micros"))
    )
    cust = customer.select(
        "c_custkey", "c_name", "c_nationkey",
        F.expr(_CENTS.format(col="c_acctbal")).alias("acctbal_cents"),
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(broadcast_if_bounded(nation.select("n_nationkey", "n_name"), FIXED),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "acctbal_cents",
                "revenue_micros")
        .orderBy(F.col("revenue_micros").desc(), F.col("c_custkey").asc())
        .limit(Q10_TOPN)
    )


def q10_oracle_sql(date_from: str = Q10_FROM, date_to: str = Q10_TO) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    bal = _CENTS.format(col="c_acctbal")
    return f"""
    SELECT c_custkey, c_name, n_name,
           CAST({bal} AS BIGINT) AS acctbal_cents,
           CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS BIGINT)
             AS revenue_micros
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, acctbal_cents
    ORDER BY revenue_micros DESC, c_custkey ASC
    LIMIT {Q10_TOPN}
    """


# -- Q14: promotion effect (conditional-numerator ratio) ---------------------

Q14_FROM = "1996-09-01"
Q14_TO = "1996-10-01"


def q14_promo_effect(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """-> one row (promo_micros, total_micros, promo_pct): share of the
    month's revenue from PROMO-type parts. Plan shape: the month filter
    prunes lineitem at the scan; the 2-column part projection joins
    un-hinted (part grows with the corpus — AQE broadcasts while it
    fits); numerator is a
    conditional sum in the SAME aggregate as the denominator — one pass,
    no second join. Exact integer numerator/denominator ship as STRING;
    the ratio itself is a bounded double rounded to 4 (the repo's
    cosine-style cross-engine rounding discipline)."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp_ntz"))
    ).select(
        "l_partkey",
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    )
    # the full 2-column part projection still grows with the scale
    # factor — no hard hint; AQE broadcasts it while it fits
    joined = li.join(
        broadcast_if_bounded(part.select("p_partkey", "p_type"), SCALE_PROPORTIONAL),
        li.l_partkey == F.col("p_partkey"),
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("_promo"),
        F.sum("rev").cast("decimal(38,0)").alias("_total"),
    )
    return agg.select(
        F.col("_promo").cast("string").alias("promo_micros"),
        F.col("_total").cast("string").alias("total_micros"),
        F.round(
            F.lit(100.0) * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            4,
        ).alias("promo_pct"),
    )


def q14_oracle_sql() -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    rev = f"CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})"
    return f"""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0 END) AS DECIMAL(38,0)) AS p,
             CAST(sum({rev}) AS DECIMAL(38,0)) AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q14_TO} 00:00:00'
    )
    SELECT CAST(p AS VARCHAR) AS promo_micros,
           CAST(t AS VARCHAR) AS total_micros,
           round(100.0 * CAST(p AS DOUBLE) / CAST(t AS DOUBLE), 4) AS promo_pct
    FROM agg
    """


# -- Q17: small-quantity-order revenue (correlated avg, decorrelated) --------

Q17_BRAND = "Brand#23"
Q17_FRACTION = 5  # l_quantity < avg/5 i.e. 0.2 * avg


def q17_small_quantity_revenue(
    part: DataFrame, lineitem: DataFrame, brand: str = Q17_BRAND
) -> DataFrame:
    """-> one row (total_cents, n): revenue sitting in orders of
    brand-parts at under 20%% of the part's average order quantity —
    TPC-H's correlated scalar subquery, DECORRELATED: the per-part
    average is one grouped aggregate over the SAME filtered relation,
    broadcast back (corpus-sublinear: one row per brand part). The
    quantity test cross-multiplies to exact integers —
    qty*5*cnt < sum_qty — so no float average ever materializes and
    both engines agree bit-for-bit."""
    qty = F.expr(_CENTS.format(col="l_quantity"))
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    brand_parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    # one brand's parts are ~1/|brands| of part — still proportional
    li = lineitem.join(
        broadcast_if_bounded(brand_parts, SCALE_PROPORTIONAL),
        lineitem.l_partkey == F.col("p_partkey"),
    ).select(
        "l_partkey", qty.alias("qc"), cents.alias("pc")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("qc").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sum_qc"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    ).withColumnRenamed("l_partkey", "__pk")
    # one row per brand part — proportional to brand_parts, not bounded
    qualified = li.join(
        broadcast_if_bounded(per_part, SCALE_PROPORTIONAL),
        li.l_partkey == F.col("__pk"),
    ).where(
        F.col("qc").cast("decimal(38,0)") * Q17_FRACTION * F.col("cnt")
        < F.col("sum_qc")
    )
    return qualified.agg(
        F.sum(F.col("pc").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def q17_oracle_sql(brand: str = Q17_BRAND) -> str:
    qty = _CENTS.format(col="l_quantity")
    cents = _CENTS.format(col="l_extendedprice")
    return f"""
    WITH li AS (
      SELECT l_partkey, {qty} AS qc, {cents} AS pc
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = '{brand}'
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(qc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_qc,
             CAST(count(*) AS BIGINT) AS cnt
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(pc AS DECIMAL(38,0))) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM li JOIN per_part USING (l_partkey)
    WHERE CAST(qc AS DECIMAL(38,0)) * {Q17_FRACTION} * cnt < sum_qc
    """


# -- Q22: global sales opportunity (scalar subquery + anti-join) -------------

Q22_NATIONS = (1, 3, 5, 7, 9)
Q22_SINCE = "2000-06-01"  # "lapsed": no orders at or after this date


def q22_sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    nations=Q22_NATIONS,
    since: str = Q22_SINCE,
) -> DataFrame:
    """-> (c_nationkey, numcust, totacctbal_cents): customers of the
    target nations holding above-average positive balances with no
    RECENT orders (TPC-H's 7-year dormancy test, parameterized to the
    testdata's date domain so the anti-join is non-vacuous). Plan
    shape: the scalar average is a 1-row aggregate cross-broadcast onto
    the filtered customers (exact integer cross-multiplication
    bal*cnt > sum, no float average); the dormancy test is a LEFT ANTI
    join against the date-pruned orders scan; bounded-key final
    aggregate. Adapted to the testdata schema (nationkey stands in for
    the phone country code)."""
    bal = F.expr(_CENTS.format(col="c_acctbal"))
    cust = customer.where(
        F.col("c_nationkey").isin(*nations)
    ).select("c_custkey", "c_nationkey", bal.alias("bal_cents"))
    pos = cust.where(F.col("bal_cents") > 0).agg(
        F.sum(F.col("bal_cents").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_pos"),
    )
    rich = cust.crossJoin(broadcast_if_bounded(pos, SCALAR)).where(
        F.col("bal_cents").cast("decimal(38,0)") * F.col("cnt_pos")
        > F.col("sum_pos")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp_ntz")
    ).select("o_custkey")
    never = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return (
        never.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("bal_cents").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("totacctbal_cents"),
        )
        .orderBy("c_nationkey")
    )


def q22_oracle_sql(nations=Q22_NATIONS, since: str = Q22_SINCE) -> str:
    bal = _CENTS.format(col="c_acctbal")
    nat = ", ".join(str(n) for n in nations)
    return f"""
    WITH cust AS (
      SELECT c_custkey, c_nationkey, {bal} AS bal_cents
      FROM customer WHERE c_nationkey IN ({nat})
    ),
    pos AS (
      SELECT CAST(sum(CAST(bal_cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_pos,
             CAST(count(*) AS BIGINT) AS cnt_pos
      FROM cust WHERE bal_cents > 0
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(bal_cents AS DECIMAL(38,0))) AS BIGINT) AS totacctbal_cents
    FROM cust, pos
    WHERE CAST(bal_cents AS DECIMAL(38,0)) * cnt_pos > sum_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{since} 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """


# -- Q7: volume shipping between two nations ---------------------------------

Q7_NATION_A = "NATION_2"
Q7_NATION_B = "NATION_5"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


def q7_volume_shipping(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> DataFrame:
    """-> (supp_nation, cust_nation, l_year, revenue_micros): Q7 —
    trade volume between two nations by direction and ship year.

    Plan shape: the fixed 2-row nation filter broadcasts onto supplier
    and customer BEFORE any fact join; the resulting two-nation slices
    are scale-proportional so their fact joins are left to AQE; the only
    guaranteed big shuffle is lineitem x orders on the order key; the cross-nation
    constraint (supp != cust nation) is a residual on the joined row;
    final aggregate is 2 directions x 2 years. Year extraction is
    integer (both engines agree on year() of a timestamp). Per-group
    micro sums are corpus-proportional -> STRING terminals."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    nats = nation.where(
        F.col("n_name").isin(nation_a, nation_b)
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        broadcast_if_bounded(nats, FIXED), supplier.s_nationkey == nats.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        broadcast_if_bounded(nats, FIXED), customer.c_nationkey == nats.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = orders.select("o_orderkey", "o_custkey")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    )
    # the two-nation slices of supplier/customer are ~2/|nations| of
    # each table — scale-proportional, so AQE decides from runtime size
    joined = (
        li.join(
            broadcast_if_bounded(supp, SCALE_PROPORTIONAL),
            li.l_suppkey == supp.s_suppkey,
        )
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(
            broadcast_if_bounded(cust, SCALE_PROPORTIONAL),
            ords.o_custkey == cust.c_custkey,
        )
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("decimal(38,0)").alias("_rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.col("_rev").cast("string").alias("revenue_micros"),
        )
    )


def q7_oracle_sql(
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    return f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS DECIMAL(38,0)) AS VARCHAR)
             AS revenue_micros
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('{nation_a}', '{nation_b}')
      AND nc.n_name IN ('{nation_a}', '{nation_b}')
      AND ns.n_name <> nc.n_name
      AND l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """


# -- Q8: national market share ------------------------------------------------

Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_FROM = "1996-01-01"
Q8_TO = "1998-01-01"


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    n_name: str = Q8_NATION,
    r_name: str = Q8_REGION,
    p_type: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> DataFrame:
    """-> (o_year, nation_micros, total_micros, mkt_share): Q8 — the
    target nation's share of `p_type` revenue sold into `r_name`-region
    customers, by order year.

    Plan shape: region->nation (fixed dims) broadcast-prunes customer;
    the part-type slice joins lineitem BEFORE the orders join (the one
    big shuffle) without a hard hint — typed parts and the nation-tagged
    supplier are scale-proportional, AQE picks the strategy; numerator (supplier nation == target) and denominator ride
    the SAME aggregate via a conditional sum — no second pass, no join
    back. Exact integer terms ship as STRING, the share as a rounded
    double (Q14 discipline)."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    region_nations = nation.join(
        broadcast_if_bounded(region.where(F.col("r_name") == r_name), FIXED),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        broadcast_if_bounded(region_nations, FIXED),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    # supplier joined to the FULL nation dim is the whole supplier
    # table — scale-proportional (the r10 plan's one genuine OOM risk)
    supp = supplier.join(
        broadcast_if_bounded(nation.select("n_nationkey", "n_name"), FIXED),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    typed_parts = part.where(F.col("p_type") == p_type).select("p_partkey")
    li = lineitem.select(
        "l_orderkey", "l_suppkey", "l_partkey",
        (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
    ).join(
        # the p_type slice of part is ~1/|types| of part — proportional
        broadcast_if_bounded(typed_parts, SCALE_PROPORTIONAL),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    )
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(
            broadcast_if_bounded(supp, SCALE_PROPORTIONAL),
            li.l_suppkey == supp.s_suppkey,
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == n_name, F.col("rev")).otherwise(F.lit(0))
        ).cast("decimal(38,0)").alias("_nat"),
        F.sum("rev").cast("decimal(38,0)").alias("_tot"),
    )
    return agg.orderBy("o_year").select(
        "o_year",
        F.col("_nat").cast("string").alias("nation_micros"),
        F.col("_tot").cast("string").alias("total_micros"),
        F.round(
            F.col("_nat").cast("double") / F.col("_tot").cast("double"), 4
        ).alias("mkt_share"),
    )


def q8_oracle_sql(
    n_name: str = Q8_NATION,
    r_name: str = Q8_REGION,
    p_type: str = Q8_TYPE,
    date_from: str = Q8_FROM,
    date_to: str = Q8_TO,
) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    rev = f"CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})"
    return f"""
    WITH agg AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CASE WHEN ns.n_name = '{n_name}' THEN {rev} ELSE 0 END) AS DECIMAL(38,0)) AS nat,
             CAST(sum({rev}) AS DECIMAL(38,0)) AS tot
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region ON nc.n_regionkey = r_regionkey
      WHERE r_name = '{r_name}' AND p_type = '{p_type}'
        AND o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
        AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
      GROUP BY o_year
    )
    SELECT o_year, CAST(nat AS VARCHAR) AS nation_micros,
           CAST(tot AS VARCHAR) AS total_micros,
           round(CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS mkt_share
    FROM agg ORDER BY o_year
    """


# -- Q15: top supplier (scalar max with ties) ---------------------------------

Q15_FROM = "1996-01-01"
Q15_TO = "1996-04-01"


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = Q15_FROM,
    date_to: str = Q15_TO,
) -> DataFrame:
    """-> (s_suppkey, s_name, revenue_micros): every supplier whose
    quarterly revenue EQUALS the maximum (Q15's revenue view + scalar
    subquery; ties all return). Plan shape: one lineitem aggregate to
    the supplier-cardinality relation, a 1-row max aggregate
    cross-broadcast back as the filter, supplier joined last (the dim
    never touches the fact). The equality test runs on the exact
    DECIMAL totals — never on a float — and the terminal ships STRING
    (a supplier's quarterly revenue is corpus-proportional)."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .select(
            "l_suppkey",
            (cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)).alias("rev"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev").cast("decimal(38,0)").alias("_rev"))
    )
    top = per_supp.agg(F.max("_rev").alias("_max"))
    winners = per_supp.crossJoin(broadcast_if_bounded(top, SCALAR)).where(
        F.col("_rev") == F.col("_max")
    )
    return (
        winners.join(
            supplier.select("s_suppkey", "s_name"),
            winners.l_suppkey == F.col("s_suppkey"),
        )
        .orderBy("s_suppkey")
        .select(
            "s_suppkey", "s_name",
            F.col("_rev").cast("string").alias("revenue_micros"),
        )
    )


def q15_oracle_sql(date_from: str = Q15_FROM, date_to: str = Q15_TO) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    return f"""
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})) AS DECIMAL(38,0)) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev AS VARCHAR) AS revenue_micros
    FROM per_supp
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev = (SELECT max(rev) FROM per_supp)
    ORDER BY s_suppkey
    """


# ---------------------------------------------------------------------------
# r14: the remaining TPC-H family (Q2, Q9, Q11, Q12, Q16, Q19, Q20, Q21),
# pytest-gated vs DuckDB (capacity policy (c): coverage growth via pytest
# differentials, not registry rows — tests/test_tpch_remaining.py).
#
# The synthetic corpus has no PARTSUPP table and lineitem carries no
# commit/receipt dates or ship modes, so the four queries that need them
# run over DETERMINISTIC DERIVATIONS both engines compute identically
# from the same base tables (documented per query). The plan shapes —
# min-per-group join-back (Q2), multi-fact star profit (Q9),
# fraction-of-total HAVING (Q11), conditional aggregation (Q12),
# distinct-count with exclusion anti-join (Q16), OR-of-ANDs predicate
# pushdown (Q19), semi-join cascade against a per-key aggregate (Q20),
# and the single-late-supplier-per-order aggregate (Q21) — are the
# TPC-H originals.
# ---------------------------------------------------------------------------

PS_COPIES = 4


def derived_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """partsupp derived deterministically from part x a fixed copy index
    (i in 0..3): ps_suppkey = (p_partkey + i) % |supplier| (collision-free
    for |supplier| >= 4, matching the corpus's 0-based suppkeys),
    ps_availqty = 1 + (p_partkey*11 + i*17) % 9999, ps_supplycost_cents =
    100 + (p_partkey*31 + i*97) % 100000. |supplier| rides as a broadcast
    1-row scalar so the derivation stays plan-side."""
    s_cnt = supplier.agg(F.count(F.lit(1)).alias("__s_cnt"))
    return (
        part.select("p_partkey")
        .crossJoin(broadcast_if_bounded(s_cnt, SCALAR))
        .select(
            "p_partkey",
            F.explode(F.sequence(F.lit(0), F.lit(PS_COPIES - 1))).alias("__i"),
            "__s_cnt",
        )
        .select(
            "p_partkey",
            ((F.col("p_partkey") + F.col("__i")) % F.col("__s_cnt"))
            .cast("bigint").alias("ps_suppkey"),
            (1 + (F.col("p_partkey") * 11 + F.col("__i") * 17) % 9999)
            .cast("bigint").alias("ps_availqty"),
            (100 + (F.col("p_partkey") * 31 + F.col("__i") * 97) % 100000)
            .cast("bigint").alias("ps_supplycost_cents"),
        )
    )


def partsupp_cte_sql(part_filter: str = "1=1") -> str:
    """The identical derivation as a DuckDB CTE body (named `ps`)."""
    return f"""
    ps AS (
      SELECT p_partkey,
             CAST((p_partkey + i) % (SELECT count(*) FROM supplier) AS BIGINT) AS ps_suppkey,
             CAST(1 + (p_partkey * 11 + i * 17) % 9999 AS BIGINT) AS ps_availqty,
             CAST(100 + (p_partkey * 31 + i * 97) % 100000 AS BIGINT) AS ps_supplycost_cents
      FROM part CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) copies
      WHERE {part_filter}
    )
    """


Q2_SIZE = 15
Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"


def q2_min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    p_size: int = Q2_SIZE,
    p_type: str = Q2_TYPE,
    r_name: str = Q2_REGION,
) -> DataFrame:
    """-> (s_acctbal_cents, s_name, n_name, p_partkey,
    ps_supplycost_cents): for each qualifying part, the in-region
    supplier(s) offering the MINIMUM supply cost (ties all returned, per
    spec), top 100 by account balance.

    Plan shape: region->nation broadcast cascade onto supplier (FIXED
    dim); partsupp derives only over the FILTERED parts; min-per-part is
    a partial-aggregated groupBy joined back on (part, cost) — the
    survivors frame is HAVING-sublinear, so its join-back carries a
    bounded broadcast. Account balance ships as exact cents so the
    LIMIT boundary is deterministic cross-engine."""
    eu = nation.join(
        broadcast_if_bounded(region.where(F.col("r_name") == r_name), FIXED),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        broadcast_if_bounded(eu, FIXED),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select(
        "s_suppkey", "s_name", "n_name",
        F.expr(_CENTS.format(col="s_acctbal")).alias("s_acctbal_cents"),
    )
    # size <= N (not == N): the corpus is small enough that the exact
    # size yields a near-empty result — the band keeps the gate meaningful
    p = part.where(
        (F.col("p_size") <= p_size) & (F.col("p_type") == p_type)
    )
    costed = derived_partsupp(p, supplier).join(
        supp, F.col("ps_suppkey") == supp.s_suppkey
    )
    min_cost = costed.groupBy("p_partkey").agg(
        F.min("ps_supplycost_cents").alias("__min_cost")
    )
    return (
        costed.join(
            broadcast_if_bounded(min_cost, SCALE_PROPORTIONAL),
            ["p_partkey"],
        )
        .where(F.col("ps_supplycost_cents") == F.col("__min_cost"))
        .orderBy(
            F.col("s_acctbal_cents").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .select(
            "s_acctbal_cents", "s_name", "n_name", "p_partkey",
            "ps_supplycost_cents",
        )
        .limit(100)
    )


def q2_oracle_sql(
    p_size: int = Q2_SIZE, p_type: str = Q2_TYPE, r_name: str = Q2_REGION
) -> str:
    acct = _CENTS.format(col="s_acctbal")
    return f"""
    WITH {partsupp_cte_sql(f"p_size <= {p_size} AND p_type = '{p_type}'")},
    costed AS (
      SELECT {acct} AS s_acctbal_cents, s_name, n_name, p_partkey,
             ps_supplycost_cents
      FROM ps
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '{r_name}'
    )
    SELECT s_acctbal_cents, s_name, n_name, p_partkey, ps_supplycost_cents
    FROM costed c
    WHERE ps_supplycost_cents = (
      SELECT min(ps_supplycost_cents) FROM costed m
      WHERE m.p_partkey = c.p_partkey
    )
    ORDER BY s_acctbal_cents DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """


Q9_NAME_FRAGMENT = "red"


def q9_product_type_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    fragment: str = Q9_NAME_FRAGMENT,
) -> DataFrame:
    """-> (n_name, o_year, profit_cmicros): profit by supplier nation and
    order year over parts whose name contains `fragment`.

    amount rides in exact CENT-MICROS: price_cents x (1e6 - disc_micros)
    minus supplycost_cents x qty_cents x 1e4 — integers end to end, so
    the per-(nation, year) DECIMAL(38,0) sums match DuckDB digit for
    digit. Plan: the name-filtered part slice prunes lineitem FIRST
    (scale-proportional join, AQE-broadcastable), orders joins on the
    surviving keys, nation is a FIXED broadcast."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    qty_c = F.expr(_CENTS.format(col="l_quantity"))
    p = part.where(F.col("p_name").contains(fragment)).select("p_partkey")
    # the filtered part slice and the partsupp derived FROM it share
    # lineage — rename the derived key and semi-join the fact, or Spark
    # flags the double p_partkey as an ambiguous self-join
    ps = derived_partsupp(p, supplier).withColumnRenamed(
        "p_partkey", "ps_partkey"
    )
    li = (
        lineitem.join(
            broadcast_if_bounded(p, SCALE_PROPORTIONAL),
            lineitem.l_partkey == p.p_partkey,
            "left_semi",
        )
        .join(
            broadcast_if_bounded(ps, SCALE_PROPORTIONAL),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .select(
            "l_orderkey", "l_suppkey",
            (
                cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc)
                - F.col("ps_supplycost_cents").cast("decimal(38,0)")
                * qty_c * F.lit(10_000)
            ).alias("amount"),
        )
    )
    joined = (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(
            broadcast_if_bounded(
                supplier.select("s_suppkey", "s_nationkey"), SCALE_PROPORTIONAL
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            broadcast_if_bounded(
                nation.select("n_nationkey", "n_name"), FIXED
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        joined.groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(F.sum("amount").cast("decimal(38,0)").alias("_p"))
        .orderBy(F.col("n_name").asc(), F.col("o_year").desc())
        .select(
            "n_name", "o_year", F.col("_p").cast("string").alias("profit_cmicros")
        )
    )


def q9_oracle_sql(fragment: str = Q9_NAME_FRAGMENT) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    qty_c = _CENTS.format(col="l_quantity")
    return f"""
    WITH {partsupp_cte_sql(f"p_name LIKE '%{fragment}%'")}
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(
             CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc})
             - CAST(ps_supplycost_cents AS DECIMAL(38,0)) * {qty_c} * 10000
           ) AS DECIMAL(38,0)) AS VARCHAR) AS profit_cmicros
    FROM lineitem
    JOIN ps ON l_partkey = p_partkey AND l_suppkey = ps_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name ASC, o_year DESC
    """


Q11_NATION = "NATION_7"
Q11_FRACTION_PPM = 1000  # HAVING part_value * 1e6 > total_value * this


def q11_important_stock(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    n_name: str = Q11_NATION,
    fraction_ppm: int = Q11_FRACTION_PPM,
) -> DataFrame:
    """-> (p_partkey, value_cents): parts whose stock value at `n_name`
    suppliers exceeds fraction_ppm/1e6 of the nation's total.

    The fraction test runs as an exact integer CROSS-MULTIPLICATION
    (part_value x 1e6 > total x ppm) — no float threshold to diverge
    on. The 1-row total rides as a broadcast scalar."""
    supp = supplier.join(
        broadcast_if_bounded(
            nation.where(F.col("n_name") == n_name).select("n_nationkey"),
            FIXED,
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    ps = derived_partsupp(part, supplier).join(
        supp, F.col("ps_suppkey") == supp.s_suppkey, "left_semi"
    )
    valued = ps.select(
        "p_partkey",
        (
            F.col("ps_supplycost_cents").cast("decimal(38,0)")
            * F.col("ps_availqty")
        ).alias("v"),
    )
    per_part = valued.groupBy("p_partkey").agg(
        F.sum("v").cast("decimal(38,0)").alias("value")
    )
    total = valued.agg(F.sum("v").cast("decimal(38,0)").alias("__total"))
    return (
        per_part.crossJoin(broadcast_if_bounded(total, SCALAR))
        .where(
            F.col("value") * F.lit(1_000_000)
            > F.col("__total") * F.lit(fraction_ppm)
        )
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
        .select("p_partkey", F.col("value").cast("string").alias("value_cents"))
    )


def q11_oracle_sql(
    n_name: str = Q11_NATION, fraction_ppm: int = Q11_FRACTION_PPM
) -> str:
    return f"""
    WITH {partsupp_cte_sql()},
    valued AS (
      SELECT p_partkey,
             CAST(ps_supplycost_cents AS DECIMAL(38,0)) * ps_availqty AS v
      FROM ps
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{n_name}'
    )
    SELECT p_partkey, CAST(CAST(sum(v) AS DECIMAL(38,0)) AS VARCHAR) AS value_cents
    FROM valued
    GROUP BY p_partkey
    HAVING CAST(sum(v) AS DECIMAL(38,0)) * 1000000
           > (SELECT CAST(sum(v) AS DECIMAL(38,0)) FROM valued) * {fraction_ppm}
    ORDER BY CAST(sum(v) AS DECIMAL(38,0)) DESC, p_partkey ASC
    """


Q12_LATE_DAYS = 90
Q12_MODES = ("MAIL", "SHIP", "AIR")


def q12_shipmode_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = Q12_LATE_DAYS
) -> DataFrame:
    """-> (ship_mode, high_line_count, low_line_count) — Q12's
    conditional-aggregation shape (priority counts per mode for LATE
    lines). ADAPTED to the corpus: lineitem has no l_shipmode /
    l_commitdate / l_receiptdate, so ship_mode derives deterministically
    from l_linenumber % 3 and a line is late when it shipped more than
    `late_days` after the order date — both engines compute the same
    derivations."""
    mode = F.element_at(
        F.array(*[F.lit(m) for m in Q12_MODES]),
        (F.col("l_linenumber") % 3 + 1).cast("int"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    )
    return (
        joined.select(mode.alias("ship_mode"), high.alias("__high"))
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(F.col("__high"), 1).otherwise(0))
            .cast("bigint").alias("high_line_count"),
            F.sum(F.when(F.col("__high"), 0).otherwise(1))
            .cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


def q12_oracle_sql(late_days: int = Q12_LATE_DAYS) -> str:
    modes = ", ".join(f"'{m}'" for m in Q12_MODES)
    return f"""
    SELECT ([{modes}])[(l_linenumber % 3) + 1] AS ship_mode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL {late_days} DAY
    GROUP BY 1
    ORDER BY 1
    """


Q16_EXCLUDE_BRAND = "Brand#2"
Q16_EXCLUDE_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 23, 36, 45, 49)


def q16_parts_supplier_relationship(
    supplier: DataFrame,
    part: DataFrame,
    brand: str = Q16_EXCLUDE_BRAND,
    p_type: str = Q16_EXCLUDE_TYPE,
    sizes=Q16_SIZES,
) -> DataFrame:
    """-> (p_brand, p_type, p_size, supplier_cnt): distinct suppliers
    per part attribute triple, excluding flagged suppliers. ADAPTED:
    the spec's 'complaints in s_comment' exclusion becomes s_acctbal < 0
    (the corpus has no comments); the exclusion is the same broadcast
    ANTI-join shape."""
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.where(
        (F.col("p_brand") != brand)
        & (F.col("p_type") != p_type)
        & F.col("p_size").isin(*sizes)
    )
    ps = derived_partsupp(p, supplier).join(
        p.select("p_partkey", "p_brand", "p_type", "p_size"), ["p_partkey"]
    ).join(
        broadcast_if_bounded(excluded, SCALE_PROPORTIONAL),
        F.col("ps_suppkey") == excluded.s_suppkey,
        "left_anti",
    )
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


def q16_oracle_sql(
    brand: str = Q16_EXCLUDE_BRAND,
    p_type: str = Q16_EXCLUDE_TYPE,
    sizes=Q16_SIZES,
) -> str:
    size_list = ", ".join(str(s) for s in sizes)
    return f"""
    WITH {partsupp_cte_sql()}
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part USING (p_partkey)
    WHERE p_brand <> '{brand}' AND p_type <> '{p_type}'
      AND p_size IN ({size_list})
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """


Q19_BRANCHES = (
    ("Brand#11", 1, 5, 100, 1100),
    ("Brand#22", 1, 10, 1000, 2000),
    ("Brand#15", 1, 15, 2000, 3000),
)


def q19_discounted_revenue(
    part: DataFrame, lineitem: DataFrame, branches=Q19_BRANCHES
) -> DataFrame:
    """-> one row (revenue_cmicros): Q19's OR-of-ANDs disjunction over
    (brand, size range, quantity range) branches — the predicate
    pushdown shape (each branch's part attributes AND line quantity band
    must hold together). ADAPTED: container/shipmode filters are absent
    from the corpus; brand + size + quantity carry the disjunction."""
    cents = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(_MICRO.format(col="l_discount"))
    qty_c = F.expr(_CENTS.format(col="l_quantity"))
    joined = lineitem.join(
        broadcast_if_bounded(
            part.select("p_partkey", "p_brand", "p_size"), SCALE_PROPORTIONAL
        ),
        lineitem.l_partkey == F.col("p_partkey"),
    )
    cond = None
    for b, lo_sz, hi_sz, lo_q, hi_q in branches:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(lo_sz, hi_sz)
            & qty_c.between(lo_q, hi_q)
        )
        cond = c if cond is None else (cond | c)
    return (
        joined.where(cond)
        .agg(
            F.sum(cents.cast("decimal(38,0)") * (F.lit(1_000_000) - disc))
            .cast("decimal(38,0)").cast("string").alias("revenue_cmicros")
        )
    )


def q19_oracle_sql(branches=Q19_BRANCHES) -> str:
    cents = _CENTS.format(col="l_extendedprice")
    disc = _MICRO.format(col="l_discount")
    qty_c = _CENTS.format(col="l_quantity")
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {lo_sz} AND {hi_sz} "
        f"AND {qty_c} BETWEEN {lo_q} AND {hi_q})"
        for b, lo_sz, hi_sz, lo_q, hi_q in branches
    )
    return f"""
    SELECT CAST(CAST(sum(CAST({cents} AS DECIMAL(38,0)) * (1000000 - {disc}))
                AS DECIMAL(38,0)) AS VARCHAR) AS revenue_cmicros
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE {ors}
    """


Q20_NATION = "NATION_3"
Q20_FRAGMENT = "blue"
Q20_FROM = "1996-01-01"
Q20_TO = "1997-01-01"


def q20_potential_promotion(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    n_name: str = Q20_NATION,
    fragment: str = Q20_FRAGMENT,
    date_from: str = Q20_FROM,
    date_to: str = Q20_TO,
) -> DataFrame:
    """-> (s_name,): suppliers in `n_name` holding excess stock
    (ps_availqty > half the quantity they shipped of that part in the
    window) of parts whose name contains `fragment` — Q20's semi-join
    cascade against a per-(part, supplier) shipment aggregate. The
    excess test is the exact integer cross-multiplication
    availqty x 200 > shipped_qty_cents. Per spec semantics a (part,
    supplier) with NO shipments in the window does not qualify (the
    correlated sum is NULL), hence the INNER join against the
    aggregate."""
    qty_c = F.expr(_CENTS.format(col="l_quantity"))
    p = part.where(F.col("p_name").contains(fragment)).select("p_partkey")
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .join(
            broadcast_if_bounded(p, SCALE_PROPORTIONAL),
            lineitem.l_partkey == p.p_partkey, "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_c).cast("bigint").alias("__shipped_c"))
    )
    ps = derived_partsupp(p, supplier)
    qualifying = ps.join(
        shipped,
        (ps.p_partkey == shipped.l_partkey)
        & (ps.ps_suppkey == shipped.l_suppkey),
    ).where(F.col("ps_availqty") * F.lit(200) > F.col("__shipped_c"))
    supp = supplier.join(
        broadcast_if_bounded(
            nation.where(F.col("n_name") == n_name).select("n_nationkey"),
            FIXED,
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    )
    return (
        supp.join(
            qualifying.select("ps_suppkey").distinct(),
            supp.s_suppkey == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name")
        .orderBy("s_name")
    )


def q20_oracle_sql(
    n_name: str = Q20_NATION,
    fragment: str = Q20_FRAGMENT,
    date_from: str = Q20_FROM,
    date_to: str = Q20_TO,
) -> str:
    qty_c = _CENTS.format(col="l_quantity")
    return f"""
    WITH {partsupp_cte_sql(f"p_name LIKE '%{fragment}%'")},
    shipped AS (
      SELECT l_partkey, l_suppkey, CAST(sum({qty_c}) AS BIGINT) AS shipped_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM ps)
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = '{n_name}'
      AND s_suppkey IN (
        SELECT ps_suppkey
        FROM ps JOIN shipped
          ON p_partkey = l_partkey AND ps_suppkey = l_suppkey
        WHERE ps_availqty * 200 > shipped_c
      )
    ORDER BY s_name
    """


Q21_NATION = "NATION_1"
Q21_LATE_DAYS = 60


def q21_waiting_suppliers(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    n_name: str = Q21_NATION,
    late_days: int = Q21_LATE_DAYS,
) -> DataFrame:
    """-> (s_name, numwait): suppliers in `n_name` who were the SOLE
    late supplier on a multi-supplier finalized order. ADAPTED: late =
    shipped more than `late_days` after the order date (the corpus has
    no commit/receipt dates).

    Plan shape: instead of the spec's EXISTS + NOT EXISTS double
    self-join on lineitem, ONE aggregate per order computes
    (distinct suppliers, distinct late suppliers, the late suppkey) —
    a single orderkey exchange — and the waiting rows are those with
    >= 2 suppliers and exactly one late one. The DuckDB oracle uses the
    same aggregate formulation (provably equivalent to the
    EXISTS/NOT-EXISTS pair), so both engines compare on identical
    semantics."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    li = lineitem.join(
        orders.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", late.alias("__late"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).alias("__n_late"),
        F.max(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__late_supp"),
        # spec semantics: numwait counts the sole-late supplier's LATE
        # LINES in the order, not 1 per order (a supplier can ship
        # several lines of one order) — pinned by the EXISTS/NOT-EXISTS
        # equivalence test
        F.sum(F.when(F.col("__late"), 1).otherwise(0)).alias("__late_lines"),
    )
    waiting = per_order.where(
        (F.col("__n_supp") >= 2) & (F.col("__n_late") == 1)
    )
    supp = supplier.join(
        broadcast_if_bounded(
            nation.where(F.col("n_name") == n_name).select("n_nationkey"),
            FIXED,
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(supp, F.col("__late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("__late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def q21_oracle_sql(
    n_name: str = Q21_NATION, late_days: int = Q21_LATE_DAYS
) -> str:
    return f"""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL {late_days} DAY AS late
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
             max(CASE WHEN late THEN l_suppkey END) AS late_supp,
             sum(CASE WHEN late THEN 1 ELSE 0 END) AS late_lines
      FROM li
      GROUP BY l_orderkey
    )
    SELECT s_name, CAST(sum(late_lines) AS BIGINT) AS numwait
    FROM per_order
    JOIN supplier ON late_supp = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_supp >= 2 AND n_late = 1 AND n_name = '{n_name}'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """


def q21_exists_formulation_sql(
    n_name: str = Q21_NATION, late_days: int = Q21_LATE_DAYS
) -> str:
    """The spec's literal EXISTS / NOT EXISTS formulation (adapted to
    the shipdate lateness rule) — used only to PROVE the aggregate
    rewrite equivalent on real data; never shipped as the plan (the
    double lineitem self-join is the shape the rewrite exists to
    avoid)."""
    return f"""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL {late_days} DAY
      AND EXISTS (
        SELECT * FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT * FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL {late_days} DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = '{n_name}'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """
