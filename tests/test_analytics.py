"""OLAP analytics queries (TPC-H Q1/Q3 shapes): exact integer-money
aggregation semantics and deterministic top-k (the DuckDB contract rows
are the strong gate; these pin the row-level derivations)."""

import datetime

from flink_cdc_spark.analytics import tpch


def test_q1_exact_cents_aggregation(spark):
    t = datetime.datetime(1998, 1, 1)
    rows = [
        # price 10.005 -> floor(1000.5 + 0.5) = 1001 cents
        ("A", "F", 2.0, 10.005, 0.05, t),
        ("A", "F", 3.0, 20.00, 0.10, t),
        ("N", "O", 1.0, 5.00, 0.00, t),
        # beyond the cutoff: excluded
        ("N", "O", 9.0, 9.99, 0.00, datetime.datetime(1999, 1, 1)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp_ntz",
    )
    got = {(r.l_returnflag, r.l_linestatus):
           (int(r.sum_qty_cents), int(r.sum_base_cents),
            int(r.sum_disc_micros), r.count_order)
           for r in tpch.q1_pricing_summary(li).collect()}
    assert got[("A", "F")] == (
        500, 3001, 1001 * 950000 + 2000 * 900000, 2
    )
    assert got[("N", "O")] == (100, 500, 500 * 1000000, 1)


def test_q3_top10_deterministic(spark):
    t0 = datetime.datetime(1995, 1, 1)
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(100, 1, t0), (101, 1, t0), (102, 2, t0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    after = datetime.datetime(1995, 6, 1)
    li = spark.createDataFrame(
        # orders 100 and 101 tie on revenue -> ordered by orderkey
        [(100, 10.0, 0.0, after), (101, 10.0, 0.0, after),
         (102, 99.0, 0.0, after)],   # non-BUILDING: excluded
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp_ntz",
    )
    out = tpch.q3_shipping_priority(cust, orders, li).collect()
    assert [r.l_orderkey for r in out] == [100, 101]
    assert all(int(r.revenue_micros) == 1000 * 1000000 for r in out)


def test_q5_same_nation_constraint(spark):
    """Only lineitems whose supplier shares the customer's nation count;
    non-region nations are pruned by the broadcast cascade."""
    t = datetime.datetime(1996, 6, 1)
    reg = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nat = spark.createDataFrame(
        [(10, "JAPAN", 0), (11, "CHINA", 0), (20, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    cust = spark.createDataFrame(
        [(1, 10), (2, 20)], "c_custkey long, c_nationkey int"
    )
    supp = spark.createDataFrame(
        [(5, 10), (6, 11)], "s_suppkey long, s_nationkey int"
    )
    orders = spark.createDataFrame(
        [(100, 1, t), (101, 2, t)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    li = spark.createDataFrame(
        [
            (100, 5, 10.0, 0.0),   # JAPAN cust, JAPAN supp -> counts
            (100, 6, 10.0, 0.0),   # JAPAN cust, CHINA supp -> locality fails
            (101, 5, 10.0, 0.0),   # FRANCE cust -> region pruned
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    out = tpch.q5_local_supplier_volume(reg, nat, cust, supp, orders, li).collect()
    assert [(r.n_name, int(r.revenue_micros)) for r in out] == [
        ("JAPAN", 1000 * 1000000)
    ]


def test_q18_having_filter_precedes_joins(spark):
    t = datetime.datetime(1996, 6, 1)
    cust = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(100, 1, t, 50.0), (101, 2, t, 60.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz, o_totalprice double",
    )
    li = spark.createDataFrame(
        [(100, 100.0), (100, 90.0),    # 190 > 180 -> heavy
         (101, 30.0)],                 # light -> excluded
        "l_orderkey long, l_quantity double",
    )
    out = tpch.q18_large_volume_customer(cust, orders, li).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.c_custkey, r.o_orderkey, int(r.o_total_cents),
            int(r.sum_qty_cents)) == (1, 100, 5000, 19000)


def test_bucketed_join_has_no_exchange_before_join(spark):
    """The co-located bucketed join's physical plan contains NO Exchange
    below the SortMergeJoin (bucket i joins bucket i directly); the only
    exchange is the final aggregate's."""
    from flink_cdc_spark.analytics import bucketed

    orders = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(100)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, f"SEG{i % 3}") for i in range(7)],
        "c_custkey long, c_mktsegment string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed.bucketed_revenue_by_segment(spark, orders, cust, "ut")
        rows = {r.c_mktsegment: (r.n_orders, int(r.total_cents))
                for r in out.collect()}
        # after execution the AQE plan is final
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan[:800]
    join_part = plan.split("SortMergeJoin")[-1]
    # everything BELOW the join (its inputs) must be exchange-free
    assert "Exchange" not in join_part, join_part[:800]
    assert "SelectedBucketsCount" in plan  # bucketed scans engaged
    # independent recompute
    import collections
    exp = collections.defaultdict(lambda: [0, 0])
    for i in range(100):
        seg = f"SEG{(i % 7) % 3}"
        exp[seg][0] += 1
        exp[seg][1] += int(i * 100)
    assert rows == {k: tuple(v) for k, v in exp.items()}


def test_q13_includes_zero_order_customers(spark):
    t = datetime.datetime(1996, 6, 1)
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(100, 1, t), (101, 1, t), (102, 2, t)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    out = {r.c_count: r.custdist
           for r in tpch.q13_customer_distribution(cust, orders).collect()}
    assert out == {2: 1, 1: 1, 0: 1}  # cust 3 has zero orders, kept
