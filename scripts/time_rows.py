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

    from bench import _host_weather, _make_probe, _read_proc_stat

    probe = _make_probe()
    ref = max(probe() for _ in range(3))

    spark = get_spark("time_rows")
    spark.range(1).count()
    qs = contract.queries()
    rows = {}
    weather = {}
    for name in names:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm-up, untimed
        p0 = probe()
        j0 = _read_proc_stat()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        hw = _host_weather(j0, _read_proc_stat())
        p1 = probe()
        ref = max(ref, p0, p1)
        rows[name] = round(sorted(runs)[1], 3)
        weather[name] = {
            "steal_pct": hw["steal_pct"] if hw else None,
            "probe_ratio": round(min(p0, p1) / ref, 3),
            "runs": [round(r, 2) for r in runs],
        }
    print(json.dumps({
        "selector": sel.get("cached_median"),
        "rows": rows,
        "window": weather,
    }))


if __name__ == "__main__":
    main()
