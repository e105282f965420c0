"""The remaining TPC-H family (Q2, Q9, Q11, Q12, Q16, Q19, Q20, Q21),
oracle-gated vs DuckDB on the real sf0.01 corpus — capacity policy (c):
coverage growth via pytest differentials instead of registry rows (the
registry sits at its 142-row bound; analytics/tpch.py r14 section).

partsupp and the commit/receipt/shipmode columns are absent from the
synthetic corpus, so four queries run over deterministic derivations
both engines compute identically (derived_partsupp / partsupp_cte_sql,
linenumber-derived ship modes, shipdate-vs-orderdate lateness) — the
derivations are part of the compared semantics, documented per query.
"""

import os

import duckdb
import pytest

from flink_cdc_spark.analytics import tpch

SF_DIR = os.environ.get("TPCH_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


@pytest.fixture(scope="module")
def tdf(spark):
    return {
        t: spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        for t in TABLES
    }


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, f'{t}.parquet')}')"
        )
    yield con
    con.close()


def _compare(got_df, oracle_con, sql, label):
    got = sorted(tuple(r) for r in got_df.collect())
    want = sorted(tuple(r) for r in oracle_con.execute(sql).fetchall())
    assert len(got) == len(want), (
        f"{label}: row count {len(got)} != oracle {len(want)}"
    )
    assert got == want, (
        f"{label}: first diff: "
        f"{next((a, b) for a, b in zip(got, want) if a != b)}"
    )


def test_q2_min_cost_supplier(tdf, oracle):
    _compare(
        tpch.q2_min_cost_supplier(
            tdf["region"], tdf["nation"], tdf["supplier"], tdf["part"]
        ),
        oracle, tpch.q2_oracle_sql(), "q2",
    )


def test_q9_product_type_profit(tdf, oracle):
    _compare(
        tpch.q9_product_type_profit(
            tdf["nation"], tdf["supplier"], tdf["part"], tdf["orders"],
            tdf["lineitem"],
        ),
        oracle, tpch.q9_oracle_sql(), "q9",
    )


def test_q11_important_stock(tdf, oracle):
    _compare(
        tpch.q11_important_stock(tdf["nation"], tdf["supplier"], tdf["part"]),
        oracle, tpch.q11_oracle_sql(), "q11",
    )


def test_q12_shipmode_priority(tdf, oracle):
    _compare(
        tpch.q12_shipmode_priority(tdf["orders"], tdf["lineitem"]),
        oracle, tpch.q12_oracle_sql(), "q12",
    )


def test_q16_parts_supplier_relationship(tdf, oracle):
    _compare(
        tpch.q16_parts_supplier_relationship(tdf["supplier"], tdf["part"]),
        oracle, tpch.q16_oracle_sql(), "q16",
    )


def test_q19_discounted_revenue(tdf, oracle):
    _compare(
        tpch.q19_discounted_revenue(tdf["part"], tdf["lineitem"]),
        oracle, tpch.q19_oracle_sql(), "q19",
    )


def test_q20_potential_promotion(tdf, oracle):
    _compare(
        tpch.q20_potential_promotion(
            tdf["nation"], tdf["supplier"], tdf["part"], tdf["lineitem"]
        ),
        oracle, tpch.q20_oracle_sql(), "q20",
    )


def test_q21_waiting_suppliers(tdf, oracle):
    _compare(
        tpch.q21_waiting_suppliers(
            tdf["nation"], tdf["supplier"], tdf["orders"], tdf["lineitem"]
        ),
        oracle, tpch.q21_oracle_sql(), "q21",
    )


def test_q21_aggregate_rewrite_equals_exists_formulation(oracle):
    """The single-exchange aggregate rewrite must equal the spec's
    literal EXISTS / NOT EXISTS double self-join — both run in DuckDB
    on the real corpus, so a shared rewrite mistake can't hide."""
    agg = oracle.execute(tpch.q21_oracle_sql()).fetchall()
    spec = oracle.execute(tpch.q21_exists_formulation_sql()).fetchall()
    assert agg == spec
