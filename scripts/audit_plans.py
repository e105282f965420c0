"""Plan-discipline audit: for every contract query, report the physical
plan properties that matter at 100 TB — exchanges (shuffles), scans with
their read-schema width, filters reaching the scan, Python/pandas UDF
nodes, and driver-side collects (there should be none in data paths).

Usage: python scripts/audit_plans.py [query ...]    (default: batch-plan
queries at sf0.001; queries that execute eagerly during construction —
streaming runners, live-JDBC loops — are audited end-to-end too, just
against the tiny sf.)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")


def audit(name, df):
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    scans = re.findall(r"FileScan \w+ \[([^\]]*)\]", plan)
    jdbc_scans = plan.count("JDBCRelation")
    exchanges = plan.count("Exchange ")
    pandas_nodes = sum(plan.count(k) for k in
                      ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython"))
    py_row_udf = plan.count("BatchEvalPython")  # row-at-a-time: should be 0
    # Spark truncates long plan strings MID-list ("PushedFilters: [IsNotNull(x), GreaterTh...")
    # so the bracket may never close — match up to the ']' OR the '...' truncation
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*?)(?:\]|\.\.\.)", plan)
    pushed_n = sum(1 for p in pushed if p.strip())
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    print(
        f"{name:34s} exch={exchanges:2d} scans={len(scans)+jdbc_scans:2d} "
        f"pushed={pushed_n} bhj={bhj} smj={smj} "
        f"arrow_udf={pandas_nodes} ROW_UDF={py_row_udf}"
        + ("  <-- row-at-a-time Python!" if py_row_udf else "")
    )
    for cols in scans[:3]:
        ncols = len([c for c in cols.split(",") if c.strip()])
        print(f"{'':36s}scan reads {ncols} col(s)")


def main():
    from flink_cdc_spark import contract
    from flink_cdc_spark.datapipe import dedup
    from flink_cdc_spark.session import get_spark

    # audit the real pre-materialization plans: eager localCheckpoint
    # results explain as a bare ExistingRDD scan (exch=0 — the r8
    # verdict's audit blind spot)
    dedup.MATERIALIZE_RESULTS = False

    spark = get_spark("plan-audit")
    wanted = sys.argv[1:]
    for name, fn in contract.queries().items():
        if wanted and name not in wanted:
            continue
        try:
            audit(name, fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 - audit keeps going
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
