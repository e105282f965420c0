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
        (c, f"Customer#{c}", rng.choice(segs), rng.randrange(len(nations)),
         round(rng.uniform(-1000, 10000), 2))
        for c in range(60)
    ]
    suppliers = [(s, rng.randrange(len(nations))) for s in range(20)]
    parts = [
        (p, rng.choice(["PROMO", "STANDARD", "ECONOMY"]),
         rng.choice(["Brand#1", "Brand#2", "Brand#3"]))
        for p in range(30)
    ]
    # r14 (Q2/Q9/Q11/Q16/Q19/Q20/Q21 models): new fields APPEND to the
    # tuples AND draw from a SEPARATE rng, so both the positional
    # indexing and the original random stream — hence every pre-r14
    # model's data — stay byte-identical
    rng14 = random.Random(SEED ^ 0x14)
    suppliers = [
        s + (f"Supplier#{s[0]:03d}", round(rng14.uniform(-1000, 10000), 2))
        for s in suppliers
    ]
    parts = [
        p + (rng14.randrange(1, 21),
             rng14.choice(["red", "blue", "green", "hot"]) + " "
             + rng14.choice(["widget", "bolt", "gear"]))
        for p in parts
    ]
    t0 = datetime.datetime(1995, 1, 1)
    orders, lineitems = [], []
    for o in range(250):
        cust = rng.randrange(60)
        odate = t0 + datetime.timedelta(days=rng.randrange(1200))
        total = rng.choice([100.0, 2500.5, 903.33, 17.89])
        orders.append((o, cust, odate, total, rng.choice(["O", "F", "P"]),
                       rng.choice(["1-URGENT", "2-HIGH", "5-LOW"])))
        for ln in range(rng.choice([0, 1, 1, 2, 3])):  # some itemless orders
            ship = odate + datetime.timedelta(days=rng.randrange(120))
            lineitems.append(
                (
                    o,
                    ln + 1,
                    rng.randrange(20),
                    rng.randrange(30),
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
            customers,
            "c_custkey LONG, c_name STRING, c_mktsegment STRING, "
            "c_nationkey LONG, c_acctbal DOUBLE",
        ),
        "part": spark.createDataFrame(
            parts,
            "p_partkey LONG, p_type STRING, p_brand STRING, p_size LONG, "
            "p_name STRING",
        ),
        "supplier": spark.createDataFrame(
            suppliers,
            "s_suppkey LONG, s_nationkey LONG, s_name STRING, "
            "s_acctbal DOUBLE",
        ),
        "orders": spark.createDataFrame(
            orders,
            "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP_NTZ, "
            "o_totalprice DOUBLE, o_orderstatus STRING, "
            "o_orderpriority STRING",
        ),
        "lineitem": spark.createDataFrame(
            lineitems,
            "l_orderkey LONG, l_linenumber LONG, l_suppkey LONG, "
            "l_partkey LONG, l_quantity DOUBLE, l_extendedprice DOUBLE, "
            "l_discount DOUBLE, l_shipdate TIMESTAMP_NTZ, "
            "l_returnflag STRING, l_linestatus STRING",
        ),
        "raw": {
            "regions": regions,
            "nations": nations,
            "customers": customers,
            "parts": parts,
            "suppliers": suppliers,
            "orders": orders,
            "lineitems": lineitems,
        },
    }


def test_q1_vs_python_model(star):
    cutoff = datetime.datetime(1998, 9, 2)
    model = {}
    for (_, _, _, _, q, p, d, ship, rf, ls) in star["raw"]["lineitems"]:
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
    seg_cust = {c for c, _, s, _, _ in star["raw"]["customers"] if s == seg}
    okeys = {
        o: odate
        for (o, cust, odate, _, _, _) in star["raw"]["orders"]
        if cust in seg_cust and odate < date
    }
    rev = {}
    for (o, _, _, _, _, p, d, ship, _, _) in star["raw"]["lineitems"]:
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
    cust_nk = {c: nk for c, _, _, nk, _ in raw["customers"] if nk in nat}
    supp_nk = {s[0]: s[1] for s in raw["suppliers"] if s[1] in nat}
    order_cust = {
        o: cust for (o, cust, odate, _, _, _) in raw["orders"]
        if d0 <= odate < d1
    }
    model = {}
    for (o, _, s, _, _, p, d, _, _, _) in raw["lineitems"]:
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
    for (_, cust, _, _, _, _) in star["raw"]["orders"]:
        per_cust[cust] = per_cust.get(cust, 0) + 1
    dist = {}
    for (c, _, _, _, _) in star["raw"]["customers"]:
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
    for (o, _, _, _, q, _, _, _, _, _) in star["raw"]["lineitems"]:
        qty[o] = qty.get(o, 0) + cents(q)
    heavy = {o: s for o, s in qty.items() if s > thresh}
    rows = [
        (cust, o, us(odate), cents(total), heavy[o])
        for (o, cust, odate, total, _, _) in star["raw"]["orders"]
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


def test_q4_vs_python_model(star):
    d0, d1 = datetime.datetime(1996, 7, 1), datetime.datetime(1996, 10, 1)
    odate = {o: (dt, pr) for (o, _, dt, _, _, pr) in star["raw"]["orders"]}
    late = set()
    for (o, _, _, _, _, _, _, ship, _, _) in star["raw"]["lineitems"]:
        if ship > odate[o][0]:
            late.add(o)
    model = {}
    for o, (dt, pr) in odate.items():
        if d0 <= dt < d1 and o in late:
            model[pr] = model.get(pr, 0) + 1
    got = {
        r.o_orderpriority: r.order_count
        for r in tpch.q4_order_priority(
            star["orders"], star["lineitem"],
            date_from="1996-07-01", date_to="1996-10-01",
        ).collect()
    }
    assert got == model


def test_q6_vs_python_model(star):
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    rev = n = 0
    for (_, _, _, _, q, p, d, ship, _, _) in star["raw"]["lineitems"]:
        dm = micros(d)
        if d0 <= ship < d1 and q < tpch.Q6_QTY and \
                tpch.Q6_DISC_LO <= dm <= tpch.Q6_DISC_HI:
            rev += cents(p) * dm
            n += 1
    row = tpch.q6_forecast_revenue(star["lineitem"]).collect()[0]
    assert (int(row.revenue_exact) if row.revenue_exact is not None else None,
            row.n) == ((rev if n else None), n)


def test_q10_vs_python_model(star):
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    raw = star["raw"]
    quarter = {
        o: cust for (o, cust, dt, _, _, _) in raw["orders"] if d0 <= dt < d1
    }
    rev = {}
    for (o, _, _, _, _, p, d, _, rf, _) in raw["lineitems"]:
        if rf == "R" and o in quarter:
            cust = quarter[o]
            rev[cust] = rev.get(cust, 0) + cents(p) * (1_000_000 - micros(d))
    nat_name = {n: name for n, name, _ in raw["nations"]}
    cust_info = {c: (nm, nk, bal) for c, nm, _, nk, bal in raw["customers"]}
    rows = [
        (c, cust_info[c][0], nat_name[cust_info[c][1]],
         cents(cust_info[c][2]), r)
        for c, r in rev.items()
    ]
    model = sorted(rows, key=lambda t: (-t[4], t[0]))[:20]
    got = [
        (r.c_custkey, r.c_name, r.n_name, r.acctbal_cents, r.revenue_micros)
        for r in tpch.q10_returned_items(
            star["customer"], star["orders"], star["lineitem"],
            star["nation"], date_from="1996-01-01", date_to="1996-04-01",
        ).collect()
    ]
    assert got == model
    assert got, "no returned items in the quarter — fixture broken"


def test_q14_vs_python_model(star):
    d0, d1 = datetime.datetime(1996, 9, 1), datetime.datetime(1996, 10, 1)
    ptype = {p[0]: p[1] for p in star["raw"]["parts"]}
    promo = total = 0
    for (_, _, _, pk, _, p, d, ship, _, _) in star["raw"]["lineitems"]:
        if d0 <= ship < d1:
            r = cents(p) * (1_000_000 - micros(d))
            total += r
            if ptype[pk] == "PROMO":
                promo += r
    row = tpch.q14_promo_effect(star["part"], star["lineitem"]).collect()[0]
    assert int(row.promo_micros) == promo and int(row.total_micros) == total
    assert abs(row.promo_pct - 100.0 * promo / total) < 1e-3
    assert total, "no lineitems in the month — fixture broken"


def test_q17_vs_python_model(star):
    brand_parts = {p[0] for p in star["raw"]["parts"] if p[2] == "Brand#1"}
    per_part = {}
    for (_, _, _, pk, q, p, _, _, _, _) in star["raw"]["lineitems"]:
        if pk in brand_parts:
            g = per_part.setdefault(pk, [0, 0])
            g[0] += cents(q)
            g[1] += 1
    tot = n = 0
    for (_, _, _, pk, q, p, _, _, _, _) in star["raw"]["lineitems"]:
        if pk in brand_parts:
            s, c = per_part[pk]
            if cents(q) * tpch.Q17_FRACTION * c < s:
                tot += cents(p)
                n += 1
    row = tpch.q17_small_quantity_revenue(
        star["part"], star["lineitem"], brand="Brand#1"
    ).collect()[0]
    assert (row.total_cents if row.total_cents is not None else 0, row.n) \
        == (tot if n else 0, n)
    assert n, "no small-quantity rows — fixture broken"


def test_q22_vs_python_model(star):
    nations, since = (1, 3, 5), datetime.datetime(1996, 6, 1)
    raw = star["raw"]
    cust = {
        c: (nk, cents(bal)) for c, _, _, nk, bal in raw["customers"]
        if nk in nations
    }
    pos = [b for _, b in cust.values() if b > 0]
    sum_pos, cnt_pos = sum(pos), len(pos)
    recent = {
        cu for (_, cu, dt, _, _, _) in raw["orders"] if dt >= since
    }
    model = {}
    for c, (nk, b) in cust.items():
        if b * cnt_pos > sum_pos and c not in recent:
            g = model.setdefault(nk, [0, 0])
            g[0] += 1
            g[1] += b
    got = {
        r.c_nationkey: [r.numcust, r.totacctbal_cents]
        for r in tpch.q22_sales_opportunity(
            star["customer"], star["orders"],
            nations=nations, since="1996-06-01",
        ).collect()
    }
    assert got == model
    assert got, "no lapsed rich customers — fixture broken"


def test_q7_vs_python_model(star):
    na, nb = "NATION_1", "NATION_2"
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1998, 1, 1)
    raw = star["raw"]
    nat_name = {n: name for n, name, _ in raw["nations"]}
    supp_nat = {s[0]: nat_name[s[1]] for s in raw["suppliers"]}
    cust_nat = {c: nat_name[nk] for c, _, _, nk, _ in raw["customers"]}
    order_cust = {o: cu for (o, cu, _, _, _, _) in raw["orders"]}
    model = {}
    for (o, _, s, _, _, p, d, ship, _, _) in raw["lineitems"]:
        if not (d0 <= ship < d1):
            continue
        sn, cn = supp_nat[s], cust_nat[order_cust[o]]
        if {sn, cn} != {na, nb}:
            continue
        key = (sn, cn, ship.year)
        model[key] = model.get(key, 0) + cents(p) * (1_000_000 - micros(d))
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): int(r.revenue_micros)
        for r in tpch.q7_volume_shipping(
            star["nation"], star["customer"], star["supplier"],
            star["orders"], star["lineitem"],
            nation_a=na, nation_b=nb,
            date_from="1996-01-01", date_to="1998-01-01",
        ).collect()
    }
    assert got == model
    assert got, "no cross-nation trade in range — fixture broken"


def test_q8_vs_python_model(star):
    n_name, r_name, p_type = "NATION_1", "ASIA", "PROMO"
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1998, 1, 1)
    raw = star["raw"]
    asia = {r for r, name in raw["regions"] if name == r_name}
    region_nk = {n for n, _, rk in raw["nations"] if rk in asia}
    nat_name = {n: name for n, name, _ in raw["nations"]}
    supp_nat = {s[0]: nat_name[s[1]] for s in raw["suppliers"]}
    cust_ok = {c for c, _, _, nk, _ in raw["customers"] if nk in region_nk}
    ptype = {p[0]: p[1] for p in raw["parts"]}
    orders = {
        o: (cu, dt.year) for (o, cu, dt, _, _, _) in raw["orders"]
        if d0 <= dt < d1
    }
    model = {}
    for (o, _, s, pk, _, p, d, _, _, _) in raw["lineitems"]:
        if o not in orders or ptype[pk] != p_type:
            continue
        cu, yr = orders[o]
        if cu not in cust_ok:
            continue
        rev = cents(p) * (1_000_000 - micros(d))
        nat, tot = model.get(yr, (0, 0))
        model[yr] = (nat + (rev if supp_nat[s] == n_name else 0), tot + rev)
    got = {
        r.o_year: (int(r.nation_micros), int(r.total_micros))
        for r in tpch.q8_market_share(
            star["region"], star["nation"], star["customer"],
            star["supplier"], star["orders"], star["lineitem"],
            star["part"], n_name=n_name, r_name=r_name, p_type=p_type,
            date_from="1996-01-01", date_to="1998-01-01",
        ).collect()
    }
    assert got == model
    assert got, "no typed revenue in range — fixture broken"


def test_q15_vs_python_model(star):
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)
    per_supp = {}
    for (_, _, s, _, _, p, d, ship, _, _) in star["raw"]["lineitems"]:
        if d0 <= ship < d1:
            per_supp[s] = per_supp.get(s, 0) + cents(p) * (1_000_000 - micros(d))
    mx = max(per_supp.values())
    model = {(s, r) for s, r in per_supp.items() if r == mx}
    got = {
        (r.s_suppkey, int(r.revenue_micros))
        for r in tpch.q15_top_supplier(
            star["supplier"].selectExpr(
                "s_suppkey", "concat('S', s_suppkey) AS s_name", "s_nationkey"
            ),
            star["lineitem"],
            date_from="1996-01-01", date_to="1996-07-01",
        ).collect()
    }
    assert got == model


# -- r14: the remaining TPC-H family vs naive Python models ------------------
# (tests/test_tpch_remaining.py gates the same queries against DuckDB on
# the real corpus; this layer probes the random input space — itemless
# orders, min-cost ties, no-shipment (part, supplier) pairs, sole-late
# multi-line suppliers.)


def _partsupp_model(parts, n_supp=20):
    """The derived-partsupp closed form (analytics/tpch.derived_partsupp),
    re-derived naively: (p_partkey, ps_suppkey, availqty, supplycost_cents)."""
    out = []
    for p in parts:
        pk = p[0]
        for i in range(4):
            out.append((
                pk,
                (pk + i) % n_supp,
                1 + (pk * 11 + i * 17) % 9999,
                100 + (pk * 31 + i * 97) % 100000,
            ))
    return out


def test_q2_vs_python_model(star):
    raw = star["raw"]
    reg = {r: name for r, name in raw["regions"]}
    nat = {n: (name, reg[rk]) for n, name, rk in raw["nations"]}
    supp = {
        s[0]: (s[2], nat[s[1]][0], cents(s[3]))
        for s in raw["suppliers"]
        if nat[s[1]][1] == "EUROPE"
    }
    keep = {p[0] for p in raw["parts"] if p[3] <= 15 and p[1] == "STANDARD"}
    costed = [
        (acct, sname, nname, pk, cost)
        for pk, sk, _aq, cost in _partsupp_model(raw["parts"])
        if pk in keep and sk in supp
        for sname, nname, acct in [supp[sk]]
    ]
    min_cost = {}
    for _a, _s, _n, pk, cost in costed:
        min_cost[pk] = min(min_cost.get(pk, cost), cost)
    winners = [r for r in costed if r[4] == min_cost[r[3]]]
    model = sorted(winners, key=lambda r: (-r[0], r[2], r[1], r[3]))[:100]
    got = [
        (r.s_acctbal_cents, r.s_name, r.n_name, r.p_partkey,
         r.ps_supplycost_cents)
        for r in tpch.q2_min_cost_supplier(
            star["region"], star["nation"], star["supplier"], star["part"]
        ).collect()
    ]
    assert got == model
    assert got, "no qualifying part/supplier — fixture broken"


def test_q9_vs_python_model(star):
    raw = star["raw"]
    nat_name = {n: name for n, name, _ in raw["nations"]}
    supp_nat = {s[0]: nat_name[s[1]] for s in raw["suppliers"]}
    keep = {p[0] for p in raw["parts"] if "red" in p[4]}
    sc = {
        (pk, sk): cost
        for pk, sk, _aq, cost in _partsupp_model(raw["parts"])
        if pk in keep
    }
    oyear = {o: dt.year for (o, _, dt, _, _, _) in raw["orders"]}
    model = {}
    for (o, _, s, pk, q, p, d, _, _, _) in raw["lineitems"]:
        if (pk, s) not in sc:
            continue
        amount = (
            cents(p) * (1_000_000 - micros(d))
            - sc[(pk, s)] * cents(q) * 10_000
        )
        key = (supp_nat[s], oyear[o])
        model[key] = model.get(key, 0) + amount
    got = {
        (r.n_name, r.o_year): int(r.profit_cmicros)
        for r in tpch.q9_product_type_profit(
            star["nation"], star["supplier"], star["part"], star["orders"],
            star["lineitem"],
        ).collect()
    }
    assert got == model
    assert got, "no red-part shipments — fixture broken"


def test_q11_vs_python_model(star):
    n_name = "NATION_3"
    raw = star["raw"]
    nk = {n for n, name, _ in raw["nations"] if name == n_name}
    in_nation = {s[0] for s in raw["suppliers"] if s[1] in nk}
    per_part, total = {}, 0
    for pk, sk, aq, cost in _partsupp_model(raw["parts"]):
        if sk not in in_nation:
            continue
        v = cost * aq
        per_part[pk] = per_part.get(pk, 0) + v
        total += v
    model = {
        pk: v for pk, v in per_part.items() if v * 1_000_000 > total * 1000
    }
    got = {
        r.p_partkey: int(r.value_cents)
        for r in tpch.q11_important_stock(
            star["nation"], star["supplier"], star["part"], n_name=n_name
        ).collect()
    }
    assert got == model
    assert got, "no stock in nation — fixture broken"


def test_q12_vs_python_model(star):
    raw = star["raw"]
    ometa = {
        o: (dt, pri) for (o, _, dt, _, _, pri) in raw["orders"]
    }
    model = {}
    for (o, ln, _, _, _, _, _, ship, _, _) in raw["lineitems"]:
        dt, pri = ometa[o]
        if ship <= dt + datetime.timedelta(days=90):
            continue
        mode = ["MAIL", "SHIP", "AIR"][ln % 3]
        hi, lo = model.setdefault(mode, [0, 0])
        if pri in ("1-URGENT", "2-HIGH"):
            model[mode][0] += 1
        else:
            model[mode][1] += 1
    got = {
        r.ship_mode: [r.high_line_count, r.low_line_count]
        for r in tpch.q12_shipmode_priority(
            star["orders"], star["lineitem"]
        ).collect()
    }
    assert got == model
    assert got, "no late lines — fixture broken"


def test_q16_vs_python_model(star):
    sizes = (1, 4, 9, 14)
    raw = star["raw"]
    excluded = {s[0] for s in raw["suppliers"] if s[3] < 0}
    attrs = {
        p[0]: (p[2], p[1], p[3])
        for p in raw["parts"]
        if p[2] != "Brand#2" and p[1] != "PROMO" and p[3] in sizes
    }
    per = {}
    for pk, sk, _aq, _c in _partsupp_model(raw["parts"]):
        if pk in attrs and sk not in excluded:
            per.setdefault(attrs[pk], set()).add(sk)
    model = {k: len(v) for k, v in per.items()}
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in tpch.q16_parts_supplier_relationship(
            star["supplier"], star["part"], sizes=sizes
        ).collect()
    }
    assert got == model
    assert got, "no qualifying attribute triple — fixture broken"


Q19_STAR_BRANCHES = (
    ("Brand#1", 1, 10, 100, 600),
    ("Brand#2", 1, 15, 400, 3100),
    ("Brand#3", 1, 20, 2900, 5100),
)


def test_q19_vs_python_model(star):
    raw = star["raw"]
    pattr = {p[0]: (p[2], p[3]) for p in raw["parts"]}
    rev = 0
    hit = False
    for (_, _, _, pk, q, p, d, _, _, _) in raw["lineitems"]:
        brand, size = pattr[pk]
        qc = cents(q)
        for b, lo_sz, hi_sz, lo_q, hi_q in Q19_STAR_BRANCHES:
            if brand == b and lo_sz <= size <= hi_sz and lo_q <= qc <= hi_q:
                rev += cents(p) * (1_000_000 - micros(d))
                hit = True
                break
    row = tpch.q19_discounted_revenue(
        star["part"], star["lineitem"], branches=Q19_STAR_BRANCHES
    ).collect()[0]
    assert int(row.revenue_cmicros) == rev
    assert hit, "no branch matched — fixture broken"


def test_q20_vs_python_model(star):
    n_name = "NATION_2"
    d0, d1 = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    raw = star["raw"]
    keep = {p[0] for p in raw["parts"] if "blue" in p[4]}
    shipped = {}
    for (_, _, s, pk, q, _, _, ship, _, _) in raw["lineitems"]:
        if pk in keep and d0 <= ship < d1:
            shipped[(pk, s)] = shipped.get((pk, s), 0) + cents(q)
    qualifying = {
        sk
        for pk, sk, aq, _c in _partsupp_model(raw["parts"])
        if pk in keep and (pk, sk) in shipped
        and aq * 200 > shipped[(pk, sk)]
    }
    nk = {n for n, name, _ in raw["nations"] if name == n_name}
    model = sorted(
        s[2] for s in raw["suppliers"] if s[1] in nk and s[0] in qualifying
    )
    got = [
        r.s_name
        for r in tpch.q20_potential_promotion(
            star["nation"], star["supplier"], star["part"],
            star["lineitem"], n_name=n_name,
        ).collect()
    ]
    assert got == model


def test_q21_vs_python_model(star):
    n_name = "NATION_4"  # the star rolls no sole-late supplier in NATION_1
    raw = star["raw"]
    ometa = {
        o: dt for (o, _, dt, _, st, _) in raw["orders"] if st == "F"
    }
    per_order = {}
    for (o, _, s, _, _, _, _, ship, _, _) in raw["lineitems"]:
        if o not in ometa:
            continue
        late = ship > ometa[o] + datetime.timedelta(days=60)
        supps, late_lines = per_order.setdefault(o, (set(), {}))
        supps.add(s)
        if late:
            late_lines[s] = late_lines.get(s, 0) + 1
    nk = {n for n, name, _ in raw["nations"] if name == n_name}
    sname = {s[0]: s[2] for s in raw["suppliers"] if s[1] in nk}
    numwait = {}
    for o, (supps, late_lines) in per_order.items():
        if len(supps) >= 2 and len(late_lines) == 1:
            (s, n_lines), = late_lines.items()
            if s in sname:
                numwait[sname[s]] = numwait.get(sname[s], 0) + n_lines
    model = sorted(
        numwait.items(), key=lambda kv: (-kv[1], kv[0])
    )[:100]
    got = [
        (r.s_name, r.numwait)
        for r in tpch.q21_waiting_suppliers(
            star["nation"], star["supplier"], star["orders"],
            star["lineitem"], n_name=n_name,
        ).collect()
    ]
    assert got == model
    assert got, "no waiting suppliers — fixture broken"
