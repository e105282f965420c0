"""Randomized differential for the analytics family (the r9 verdict's
item 7): random order/lineitem/customer histories — NOT the synthetic
corpus — run through the Spark TPC-H implementations and the
rolling/funnel event features, compared against independent brute-force
Python models that re-derive the exact integer-cents semantics from
scratch.

The contract sweep proves oracle parity on the fixed corpus; this suite
probes the input space around it: orders with no line items, customers
with no orders, revenue ties at the top-N boundary, events exactly at
the rolling-window edge, funnels that stall at every stage. Each prior
differential wave (expressions r9, coercion r9, chunk split r9) caught a
real bug — the models here are deliberately naive (dict loops, no SQL)
so a shared mistake with the Spark plans is implausible.
"""

import datetime
import math
import random

import pytest

from flink_cdc_spark.analytics import tpch
from flink_cdc_spark.datapipe import features

SEED = 0xA11A


def cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def micros(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5))


EPOCH = datetime.datetime(1970, 1, 1)


def us(dt: datetime.datetime) -> int:
    return int((dt - EPOCH).total_seconds() * 1_000_000)


@pytest.fixture(scope="module")
def star(spark):
    """A small random TPC-H-shaped star with deliberate edge cases:
    price/qty values drawn from a tiny set (top-N ties), ~10% of
    customers orderless, ~10% of orders itemless."""
    rng = random.Random(SEED)
    regions = [(r, name) for r, name in enumerate(["ASIA", "EUROPE", "AMERICA"])]
    nations = [(n, f"NATION_{n}", n % len(regions)) for n in range(7)]
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE"]
    customers = [
        (c, rng.choice(segs), rng.randrange(len(nations)))
        for c in range(60)
    ]
    suppliers = [(s, rng.randrange(len(nations))) for s in range(20)]
    t0 = datetime.datetime(1995, 1, 1)
    orders, lineitems = [], []
    for o in range(250):
        cust = rng.randrange(60)
        odate = t0 + datetime.timedelta(days=rng.randrange(1200))
        total = rng.choice([100.0, 2500.5, 903.33, 17.89])
        orders.append((o, cust, odate, total, rng.choice(["O", "F", "P"])))
        for ln in range(rng.choice([0, 1, 1, 2, 3])):  # some itemless orders
            ship = odate + datetime.timedelta(days=rng.randrange(120))
            lineitems.append(
                (
                    o,
                    ln + 1,
                    rng.randrange(20),
                    float(rng.choice([1, 5, 30, 50])),
                    rng.choice([100.0, 2500.5, 903.33]),
                    rng.choice([0.0, 0.05, 0.1]),
                    ship,
                    rng.choice(["R", "N"]),
                    rng.choice(["F", "O"]),
                )
            )
    return {
        "region": spark.createDataFrame(
            regions, "r_regionkey LONG, r_name STRING"
        ),
        "nation": spark.createDataFrame(
            nations, "n_nationkey LONG, n_name STRING, n_regionkey LONG"
        ),
        "customer": spark.createDataFrame(
            customers, "c_custkey LONG, c_mktsegment STRING, c_nationkey LONG"
        ),
        "supplier": spark.createDataFrame(
            suppliers, "s_suppkey LONG, s_nationkey LONG"
        ),
        "orders": spark.createDataFrame(
            orders,
            "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP_NTZ, "
            "o_totalprice DOUBLE, o_orderstatus STRING",
        ),
        "lineitem": spark.createDataFrame(
            lineitems,
            "l_orderkey LONG, l_linenumber LONG, l_suppkey LONG, "
            "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
            "l_shipdate TIMESTAMP_NTZ, l_returnflag STRING, "
            "l_linestatus STRING",
        ),
        "raw": {
            "regions": regions,
            "nations": nations,
            "customers": customers,
            "suppliers": suppliers,
            "orders": orders,
            "lineitems": lineitems,
        },
    }


def test_q1_vs_python_model(star):
    cutoff = datetime.datetime(1998, 9, 2)
    model = {}
    for (_, _, _, q, p, d, ship, rf, ls) in star["raw"]["lineitems"]:
        if ship > cutoff:
            continue
        g = model.setdefault((rf, ls), [0, 0, 0, 0])
        g[0] += cents(q)
        g[1] += cents(p)
        g[2] += cents(p) * (1_000_000 - micros(d))
        g[3] += 1
    got = {
        (r.l_returnflag, r.l_linestatus): [
            r.sum_qty_cents,
            r.sum_base_cents,
            int(r.sum_disc_micros),
            r.count_order,
        ]
        for r in tpch.q1_pricing_summary(star["lineitem"]).collect()
    }
    assert got == model


def test_q3_vs_python_model(star):
    seg, date = "BUILDING", datetime.datetime(1995, 3, 15)
    seg_cust = {c for c, s, _ in star["raw"]["customers"] if s == seg}
    okeys = {
        o: odate
        for (o, cust, odate, _, _) in star["raw"]["orders"]
        if cust in seg_cust and odate < date
    }
    rev = {}
    for (o, _, _, _, p, d, ship, _, _) in star["raw"]["lineitems"]:
        if o in okeys and ship > date:
            rev[o] = rev.get(o, 0) + cents(p) * (1_000_000 - micros(d))
    ranked = sorted(
        ((r, us(okeys[o]), o) for o, r in rev.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    model = [(o, r, d) for r, d, o in ranked]
    got = [
        (r.l_orderkey, r.revenue_micros, r.o_orderdate_us)
        for r in tpch.q3_shipping_priority(
            star["customer"], star["orders"], star["lineitem"],
            segment=seg, date="1995-03-15",
        ).collect()
    ]
    assert got == model


def test_q5_vs_python_model(star):
    r_name = "ASIA"
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    raw = star["raw"]
    asia = {r for r, name in raw["regions"] if name == r_name}
    nat = {n: name for n, name, rk in raw["nations"] if rk in asia}
    cust_nk = {c: nk for c, _, nk in raw["customers"] if nk in nat}
    supp_nk = {s: nk for s, nk in raw["suppliers"] if nk in nat}
    order_cust = {
        o: cust for (o, cust, odate, _, _) in raw["orders"]
        if d0 <= odate < d1
    }
    model = {}
    for (o, _, s, _, p, d, _, _, _) in raw["lineitems"]:
        cust = order_cust.get(o)
        if cust is None or cust not in cust_nk or s not in supp_nk:
            continue
        if cust_nk[cust] != supp_nk[s]:
            continue
        name = nat[cust_nk[cust]]
        model[name] = model.get(name, 0) + cents(p) * (1_000_000 - micros(d))
    got = {
        r.n_name: int(r.revenue_micros)
        for r in tpch.q5_local_supplier_volume(
            star["region"], star["nation"], star["customer"],
            star["supplier"], star["orders"], star["lineitem"],
            r_name=r_name, date_from="1996-01-01", date_to="1997-01-01",
        ).collect()
    }
    assert got == model


def test_q13_vs_python_model(star):
    per_cust = {}
    for (_, cust, _, _, _) in star["raw"]["orders"]:
        per_cust[cust] = per_cust.get(cust, 0) + 1
    dist = {}
    for (c, _, _) in star["raw"]["customers"]:
        n = per_cust.get(c, 0)  # zero-order customers MUST appear
        dist[n] = dist.get(n, 0) + 1
    got = {
        r.c_count: r.custdist
        for r in tpch.q13_customer_distribution(
            star["customer"], star["orders"]
        ).collect()
    }
    assert got == dist


def test_q18_vs_python_model(star):
    thresh = 60 * 100  # low threshold so the random data has heavy orders
    qty = {}
    for (o, _, _, q, _, _, _, _, _) in star["raw"]["lineitems"]:
        qty[o] = qty.get(o, 0) + cents(q)
    heavy = {o: s for o, s in qty.items() if s > thresh}
    rows = [
        (cust, o, us(odate), cents(total), heavy[o])
        for (o, cust, odate, total, _) in star["raw"]["orders"]
        if o in heavy
    ]
    model = sorted(rows, key=lambda t: (-t[3], t[2], t[1]))[:100]
    got = [
        (r.c_custkey, r.o_orderkey, r.o_orderdate_us, r.o_total_cents,
         r.sum_qty_cents)
        for r in tpch.q18_large_volume_customer(
            star["customer"], star["orders"], star["lineitem"],
            qty_cents=thresh,
        ).collect()
    ]
    assert got == model
    assert got, "threshold produced no heavy orders — fixture broken"


@pytest.fixture(scope="module")
def rand_events(spark):
    """Random event stream with edge probes: bursts at identical
    instants, gaps of exactly the rolling window, users with one event."""
    rng = random.Random(SEED ^ 0xE)
    t0 = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows, eid = [], 0
    for u in range(12):
        t = t0
        for _ in range(rng.randrange(1, 25)):
            step = rng.choice(
                [datetime.timedelta(0), day, 3 * day, 7 * day,
                 7 * day + datetime.timedelta(microseconds=1)]
            )
            t = t + step
            rows.append(
                (eid, u, t, rng.choice(["view", "click", "purchase"]),
                 rng.choice([0.0, 1.25, 99.99, 3.333]))
            )
            eid += 1
    return rows, spark.createDataFrame(
        rows,
        "event_id LONG, user_id LONG, ts TIMESTAMP_NTZ, "
        "event_type STRING, value DOUBLE",
    )


def test_rolling_features_vs_python_model(rand_events):
    rows, df = rand_events
    span = 7 * 86_400 * 1_000_000
    by_user = {}
    for (eid, u, t, _, v) in rows:
        by_user.setdefault(u, []).append((us(t), eid, micros(v)))
    model = {}
    for u, evs in by_user.items():
        for t, eid, _ in evs:
            in_win = [(t2, v2) for t2, _, v2 in evs if t - span <= t2 <= t]
            model[eid] = (len(in_win), sum(v for _, v in in_win))
    got = {
        r.event_id: (r.n_trail, r.sum_trail_micros)
        for r in features.rolling_event_features(df).collect()
    }
    assert got == model


def test_funnel_stages_vs_python_model(rand_events):
    rows, df = rand_events
    span = 7 * 86_400 * 1_000_000
    by_user = {}
    for (eid, u, t, et, _) in rows:
        by_user.setdefault(u, []).append((us(t), et))
    model = {}
    for u, evs in by_user.items():
        t1 = min((t for t, et in evs if et == "view"), default=None)
        t2 = t3 = None
        if t1 is not None:
            t2 = min(
                (t for t, et in evs
                 if et == "click" and t1 <= t <= t1 + span),
                default=None,
            )
        if t2 is not None:
            t3 = min(
                (t for t, et in evs
                 if et == "purchase" and t2 <= t <= t1 + span),
                default=None,
            )
        stage = 3 if t3 is not None else 2 if t2 is not None else (
            1 if t1 is not None else 0
        )
        model[u] = (stage, t1, t2, t3)
    got = {
        r.user_id: (r.stage, r.t1_us, r.t2_us, r.t3_us)
        for r in features.funnel_stages(df).collect()
    }
    assert got == model
