"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution with a count-style action (no
driver-side row materialization beyond what the operator needs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from flink_cdc_spark import contract
    from flink_cdc_spark.session import get_spark

    spark = get_spark("bench")

    # warm the JVM + parquet footers once with a trivial job
    spark.range(1).count()

    timings = {}
    for name, fn in contract.queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    out = {
        "metric": "pipeline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
