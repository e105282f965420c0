"""Driver-contract entries for the OLAP analytics queries."""

from __future__ import annotations

from ..contract import register
from . import tpch


def _tables(spark, sf_dir, *names):
    from ..contract import pin_session
    from ..sources.parquet_source import ParquetTableSource

    pin_session(spark)
    src = ParquetTableSource(spark, sf_dir)
    return [src.snapshot(n) for n in names]


@register("tpch_q1_pricing_summary", tpch.q1_oracle_sql())
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: one pruned scan + map-side-combined hash
    aggregate into 6 groups; money aggregated as exact integer cents /
    discount-micros (double summation order would diverge engines)."""
    (li,) = _tables(spark, sf_dir, "lineitem")
    return tpch.q1_pricing_summary(li)


@register("tpch_q3_shipping_priority", tpch.q3_oracle_sql())
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: filtered BROADCAST customer dim -> orders ->
    lineitem join, grouped revenue, deterministic top-10."""
    cust, orders, li = _tables(spark, sf_dir, "customer", "orders", "lineitem")
    return tpch.q3_shipping_priority(cust, orders, li)


@register("tpch_q5_local_supplier_volume", tpch.q5_oracle_sql())
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: region->nation broadcast cascade prunes customer
    and supplier before the single big lineitem x orders shuffle join;
    same-nation locality enforced on the joined row; 5-row aggregate."""
    reg, nat, cust, supp, orders, li = _tables(
        spark, sf_dir, "region", "nation", "customer", "supplier",
        "orders", "lineitem",
    )
    return tpch.q5_local_supplier_volume(reg, nat, cust, supp, orders, li)


@register("tpch_q18_large_volume_customer", tpch.q18_oracle_sql())
def tpch_q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: lineitem self-aggregation with the HAVING filter
    applied before any join; the sublinear heavy-order relation
    broadcasts onto orders then customer — the big tables never shuffle
    for a join; deterministic top-100."""
    cust, orders, li = _tables(spark, sf_dir, "customer", "orders", "lineitem")
    return tpch.q18_large_volume_customer(cust, orders, li)


@register("join_bucketed_colocated", __import__("flink_cdc_spark.analytics.bucketed", fromlist=["b"]).bucketed_revenue_oracle_sql())
def join_bucketed_colocated(spark, sf_dir):
    """Co-located bucketed join: both sides written once bucketed+sorted
    on the join key, so the repeated sort-merge join runs with ZERO
    exchanges and no per-side sort (plan-asserted in pytest) — the
    pre-partitioning strategy for every-query fact x dim joins."""
    import hashlib

    from . import bucketed

    cust, orders = _tables(spark, sf_dir, "customer", "orders")
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return bucketed.bucketed_revenue_by_segment(spark, orders, cust, suffix)


@register("tpch_q13_customer_distribution", tpch.q13_oracle_sql())
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: orders pre-aggregated to (custkey, count) before
    the LEFT join (customer never probes raw orders), null-preserving
    zero-order bucket, second bounded-key aggregate."""
    cust, orders = _tables(spark, sf_dir, "customer", "orders")
    return tpch.q13_customer_distribution(cust, orders)


@register("tpch_q4_order_priority", tpch.q4_oracle_sql())
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS): orders LEFT SEMI join lineitem with the
    late-shipment predicate as the join residual — one decorrelated
    semi-join, never a per-order subquery; bounded-key count."""
    orders, li = _tables(spark, sf_dir, "orders", "lineitem")
    return tpch.q4_order_priority(orders, li)


@register("tpch_q6_forecast_revenue", tpch.q6_oracle_sql())
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the canonical full-pushdown scan-aggregate —
    every predicate at the parquet reader, zero joins, one global
    map-side-combined sum in exact integer units."""
    (li,) = _tables(spark, sf_dir, "lineitem")
    return tpch.q6_forecast_revenue(li)


@register("tpch_q10_returned_items", tpch.q10_oracle_sql())
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: quarter-pruned orders x returnflag-pruned
    lineitem (the one big shuffle), per-customer aggregate joined to
    customer, nation broadcast, deterministic top-20."""
    cust, orders, li, nat = _tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return tpch.q10_returned_items(cust, orders, li, nat)


@register("tpch_q14_promo_effect", tpch.q14_oracle_sql())
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: month-pruned lineitem x broadcast part,
    conditional numerator and denominator in ONE aggregate pass; exact
    integer terms shipped as strings, ratio as a rounded double."""
    part, li = _tables(spark, sf_dir, "part", "lineitem")
    return tpch.q14_promo_effect(part, li)


@register("tpch_q17_small_quantity", tpch.q17_oracle_sql())
def tpch_q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: the correlated per-part average DECORRELATED
    into one grouped aggregate broadcast back onto the same filtered
    relation; the quantity test cross-multiplied to exact integers."""
    part, li = _tables(spark, sf_dir, "part", "lineitem")
    return tpch.q17_small_quantity_revenue(part, li)


@register("tpch_q22_sales_opportunity", tpch.q22_oracle_sql())
def tpch_q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: 1-row scalar aggregate cross-broadcast (exact
    integer above-average test), LEFT ANTI join against orders,
    bounded-key aggregate."""
    cust, orders = _tables(spark, sf_dir, "customer", "orders")
    return tpch.q22_sales_opportunity(cust, orders)


@register("tpch_q7_volume_shipping", tpch.q7_oracle_sql())
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: two-nation broadcast prunes BOTH dims before the
    one lineitem x orders shuffle; cross-nation residual on the joined
    row; 2-direction x 2-year aggregate."""
    nat, cust, supp, orders, li = _tables(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    return tpch.q7_volume_shipping(nat, cust, supp, orders, li)


@register("tpch_q8_market_share", tpch.q8_oracle_sql())
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: part-type broadcast prunes lineitem before the
    orders shuffle; numerator and denominator share ONE conditional
    aggregate; share as a rounded double over exact integer terms."""
    reg, nat, cust, supp, orders, li, part = _tables(
        spark, sf_dir, "region", "nation", "customer", "supplier",
        "orders", "lineitem", "part",
    )
    return tpch.q8_market_share(reg, nat, cust, supp, orders, li, part)


@register("tpch_q15_top_supplier", tpch.q15_oracle_sql())
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier-cardinality revenue view, 1-row scalar
    max cross-broadcast as the filter (exact DECIMAL equality — ties all
    return), supplier dim joined last."""
    supp, li = _tables(spark, sf_dir, "supplier", "lineitem")
    return tpch.q15_top_supplier(supp, li)


@register("tpch_q9_product_type_profit", tpch.q9_oracle_sql())
def tpch_q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (multi-fact star, registered r15 per VERDICT r14
    item 2): the name-filtered part slice prunes lineitem FIRST via a
    semi-join (AQE-broadcastable), derived partsupp and supplier ride as
    bounded broadcasts, nation is a FIXED broadcast, and orders is the
    single big shuffle join; profit in exact cent-micros DECIMAL(38,0)."""
    nat, supp, part, orders, li = _tables(
        spark, sf_dir, "nation", "supplier", "part", "orders", "lineitem"
    )
    return tpch.q9_product_type_profit(nat, supp, part, orders, li)


@register("tpch_q21_waiting_suppliers", tpch.q21_oracle_sql())
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (registered r15 per VERDICT r14 item 2): the
    equivalence-proved aggregate rewrite — ONE orderkey exchange
    computes (distinct suppliers, distinct late, sole late supplier,
    late lines) per finalized order, replacing the spec's EXISTS +
    NOT-EXISTS double lineitem self-join; the one-nation supplier dim
    broadcasts; deterministic top-100. The EXISTS-formulation
    equivalence proof lives in tests/test_tpch_remaining.py."""
    nat, supp, orders, li = _tables(
        spark, sf_dir, "nation", "supplier", "orders", "lineitem"
    )
    return tpch.q21_waiting_suppliers(nat, supp, orders, li)
