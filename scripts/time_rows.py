"""Warm median-of-3 timer for individual registry rows at sf0.1 —
the interleaved-A/B building block (see memory: bench-host-calibration).
Usage: python scripts/time_rows.py q1 q2 ...  [--sf DIR]
Prints one JSON line {"selector": ops_per_ms, "rows": {name: median_sec}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    from bench import _bench_selectors

    sel = _bench_selectors()

    from flink_cdc_spark import contract
    from flink_cdc_spark.session import get_spark

    spark = get_spark("time_rows")
    spark.range(1).count()
    qs = contract.queries()
    rows = {}
    for name in names:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm-up, untimed
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        rows[name] = round(sorted(runs)[1], 3)
    print(json.dumps({
        "selector": sel.get("cached_median"),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
