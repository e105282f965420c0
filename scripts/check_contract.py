"""Replicates the driver's correctness gate locally: runs every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compares row count,
column names, and an order-insensitive value hash.

Usage: python scripts/check_contract.py [query_name ...] [--sf-dir DIR]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(norm_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = "/root/testdata/sf0.01"
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif not a.startswith("--"):
            args.append(a)

    import __spark_entry__ as entrymod
    from flink_cdc_spark.session import get_spark

    spark = get_spark("check_contract")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if sorted(scols_l) != sorted(dcols):
            problems.append(f"columns {sorted(scols_l)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sh = table_hash(scols_l, srows)
            dh = table_hash(dcols, drows)
            if sh != dh:
                problems.append("value hash mismatch")
                # show a sample diff
                sset = {tuple(norm_value(v) for v in r) for r in srows}
                dset = {tuple(norm_value(v) for v in r) for r in drows}
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_d:
                    problems.append(f"duckdb-only: {only_d}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok    {name} ({dt:.1f}s): rows={len(srows)} hash match")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
