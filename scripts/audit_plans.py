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

# Queries allowed to carry WindowExec nodes with NO partition spec (the
# "Moving all data to a single partition" warning). Every entry must be
# a window whose INPUT is post-aggregate and bounded — one row per
# band/term/group, never corpus-proportional — so the single task is a
# few rows, not the data. Keyed by query -> max allowed count; any
# global window elsewhere (or above the cap) fails the audit, so a new
# corpus-sized global sort can't hide behind the known-benign warnings.
GLOBAL_WINDOW_OK = {
    # banded_global_rank per-band offsets: one row per (scope, band)
    # aggregate — bounded by band count (operators/ordered_seq.py); the
    # mongo rows scope their offsets `within` a key, so they audit at 0
    "db2_asn_cd_decode": 1,
    "sqlserver_cdc_table_decode": 1,
    # BPE pair rank over the alphabet^2 merge-candidate aggregate
    # (datapipe/sampling.py) — vocabulary-bounded, not corpus-bounded
    "text_bpe_pair_counts": 1,
}


def _top_level_groups(s):
    """Split a Window node's argument tail into its top-level [...] groups:
    3 groups = [exprs], [partition], [order]; 2 = no partition spec."""
    groups, depth, cur = [], 0, None
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                cur = None
                continue
        if cur is not None:
            cur.append(ch)
    return groups


def count_global_windows(plan):
    """WindowExec nodes with no partition spec. Plan-string shapes:
    3 groups = [exprs], [partition], [order]; 2 groups is ambiguous —
    partition-only ([exprs], [cols]) is fine, order-only ([exprs],
    [col ASC ...]) is the global single-task window we're hunting.
    Sort directions only ever appear in order specs."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) == 2 and re.search(r" (ASC|DESC) ", groups[1]):
            n += 1
    return n


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
    gwin = count_global_windows(plan)
    gwin_bad = gwin > GLOBAL_WINDOW_OK.get(name, 0)
    print(
        f"{name:34s} exch={exchanges:2d} scans={len(scans)+jdbc_scans:2d} "
        f"pushed={pushed_n} bhj={bhj} smj={smj} gwin={gwin} "
        f"arrow_udf={pandas_nodes} ROW_UDF={py_row_udf}"
        + ("  <-- row-at-a-time Python!" if py_row_udf else "")
        + ("  <-- UNAUDITED GLOBAL WINDOW (bounded input? add to GLOBAL_WINDOW_OK)"
           if gwin_bad else "")
    )
    for cols in scans[:3]:
        ncols = len([c for c in cols.split(",") if c.strip()])
        print(f"{'':36s}scan reads {ncols} col(s)")
    return not gwin_bad


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
    ok = True
    errors = 0
    for name, fn in contract.queries().items():
        if wanted and name not in wanted:
            continue
        try:
            ok = audit(name, fn(spark, SF_DIR)) and ok
        except Exception as e:  # noqa: BLE001 - audit keeps going
            # a plan that fails to BUILD was never inspected — that must
            # fail the gate, not silently pass it (advisor r11)
            errors += 1
            ok = False
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
    if not ok:
        print(
            "AUDIT FAILED: "
            + (f"{errors} plan(s) failed to build; " if errors else "")
            + "unaudited global window(s) or uninspected plans — see above"
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
