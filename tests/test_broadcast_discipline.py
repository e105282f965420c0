"""Broadcast-hint size discipline for the analytics family (the r10
verdict's scale-killer finding): a hard F.broadcast() bypasses
autoBroadcastJoinThreshold, so it may only be applied to frames whose
size is corpus-independent.  Scale-proportional frames (a constant
fraction of customer/supplier/part/orders/lineitem) must reach the
join UN-hinted and let AQE pick the strategy from the runtime size.
"""

import glob
import os
import re

import pytest

from flink_cdc_spark.analytics.hints import (
    FIXED,
    SCALAR,
    SCALE_PROPORTIONAL,
    SUBLINEAR,
    broadcast_if_bounded,
)

ANALYTICS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flink_cdc_spark",
    "analytics",
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_no_raw_broadcast_hint_in_analytics_sources():
    """Every broadcast in the analytics family must go through
    broadcast_if_bounded so the bounded/proportional classification is
    explicit and reviewable (hints.py itself hosts the one real call)."""
    offenders = []
    for path in glob.glob(os.path.join(ANALYTICS_DIR, "*.py")):
        if os.path.basename(path) == "hints.py":
            continue
        for i, line in enumerate(open(path), 1):
            if re.search(r"\bF\.broadcast\s*\(", line):
                offenders.append(f"{os.path.basename(path)}:{i}: {line.strip()}")
    assert not offenders, (
        "raw F.broadcast() in analytics (use broadcast_if_bounded): "
        + "; ".join(offenders)
    )


def test_bounded_reasons_apply_the_hint(spark):
    df = spark.range(10)
    for reason in (FIXED, SUBLINEAR, SCALAR):
        hinted = broadcast_if_bounded(df, reason)
        plan = hinted._jdf.queryExecution().logical().toString()
        assert "broadcast" in plan.lower(), (reason, plan)


def test_scale_proportional_leaves_the_frame_unhinted(spark):
    df = spark.range(10)
    out = broadcast_if_bounded(df, SCALE_PROPORTIONAL)
    assert out is df  # identity: no hint node, no copy


def test_unknown_reason_rejected(spark):
    with pytest.raises(ValueError):
        broadcast_if_bounded(spark.range(1), "seems-small")


def test_aqe_still_broadcasts_proportional_frames_at_test_scale(spark):
    """The discipline must not cost anything where it's safe: at test
    scale the un-hinted segment-filtered customer dim is tiny, and AQE
    must still convert Q3's dim join to a broadcast join at runtime."""
    from flink_cdc_spark.analytics.tpch import q3_shipping_priority

    customer = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    df = q3_shipping_priority(customer, orders, lineitem)
    df.collect()  # AQE finalizes join strategies only on execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed


def test_no_sublinear_claims_left_in_analytics_sources():
    """Both r10/r11 misclassifications were 'sublinear' claims on frames
    that are really constant fractions of a fact table (Q17 per_part,
    Q18 heavy).  The family now uses only FIXED (schema-fixed dims),
    SCALAR (1-row aggregates) and SCALE_PROPORTIONAL — a new SUBLINEAR
    call site requires a measured-growth justification in review."""
    offenders = []
    for path in glob.glob(os.path.join(ANALYTICS_DIR, "*.py")):
        if os.path.basename(path) == "hints.py":
            continue
        for i, line in enumerate(open(path), 1):
            if "SUBLINEAR" in line:
                offenders.append(f"{os.path.basename(path)}:{i}: {line.strip()}")
    assert not offenders, "SUBLINEAR hint in analytics: " + "; ".join(offenders)


def test_q18_heavy_is_measured_scale_proportional(spark):
    """Pin the Q18 classification to measured row-count growth: the
    HAVING>180 survivor set must grow with the corpus (it is a constant
    fraction of orders, NOT sublinear), so the hard hint is forbidden."""
    import pyspark.sql.functions as F

    counts = {}
    for sf in ("sf0.001", "sf0.01"):
        li = spark.read.parquet(f"/root/testdata/{sf}/lineitem.parquet")
        counts[sf] = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .where(F.col("q") > 180)
            .count()
        )
    assert counts["sf0.001"] > 0
    growth = counts["sf0.01"] / counts["sf0.001"]
    assert growth > 3, (
        f"heavy-order survivors grew only {growth:.1f}x over a 10x corpus — "
        "if this ever becomes genuinely sublinear, revisit the classification"
    )
