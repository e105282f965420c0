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
