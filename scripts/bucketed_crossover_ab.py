"""Synthetic large-state A/B for the bucketed key-restricted read
(r17, VERDICT r16 item 6): the registry keeps the bucketed read ON for
`streaming_retract_aggregate` as the pinned at-scale shape, justified
until now by plan shape only (file-listing pruning). This script
demonstrates the CROSSOVER with numbers: at state >> delta, the
touched-buckets read beats the full merge-on-read scan.

Kept OUT of the registry/bench (it generates its own synthetic state —
the driver's queries must compute from the parquet inputs only).

Shape: N_KEYS-row keyed state (one base from compaction + N_DELTAS
later delta commits, the realistic multi-commit merge-on-read), probed
by a TOUCHED-key epoch delta. Both layouts get the identical key-level
semi-join the state machines use; what differs is only the scan under
it — full listing vs bucket-pruned listing. Interleaved warm
median-of-3 per side.

Usage: python scripts/bucketed_crossover_ab.py [N_KEYS [N_BUCKETS [TOUCHED]]]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
TOUCHED = int(sys.argv[3]) if len(sys.argv) > 3 else 40
N_DELTAS = 3

STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("w", T.LongType()),
    ]
)


def build(store, spark, bucketed: bool):
    from flink_cdc_spark.sources.envelope import wrap_as_inserts

    base = spark.range(N_KEYS).select(
        F.col("id"), (F.col("id") * 7).alias("v"), (F.col("id") % 97).alias("w")
    )
    kw = dict(bucket_keys=["id"], num_buckets=N_BUCKETS) if bucketed else {}
    store.merge("t", wrap_as_inserts(base, "t"), STRUCT, ["id"], batch_unique=True, **kw)
    store.compact("t")  # the big commit becomes the base
    for i in range(N_DELTAS):
        upd = spark.range(N_KEYS // 1000).select(
            (F.col("id") * 997 + i).alias("id"),
            F.lit(-1).cast("long").alias("v"),
            F.lit(i).cast("long").alias("w"),
        )
        store.merge("t", wrap_as_inserts(upd, "t"), STRUCT, ["id"], batch_unique=True)


def timed_read(store, spark, keys_df, touched: bool) -> float:
    t0 = time.perf_counter()
    state = store.read("t", touched=keys_df if touched else None)
    state.join(F.broadcast(keys_df), "id", "left_semi").write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    from flink_cdc_spark.session import get_spark
    from flink_cdc_spark.sinks.lsm_store import LsmStateStore

    spark = get_spark("bucketed_crossover_ab")
    spark.range(1).count()
    root = tempfile.mkdtemp(prefix="bucket_ab_")
    try:
        flat_store = LsmStateStore(spark, os.path.join(root, "flat"), compact_every=99)
        bkt_store = LsmStateStore(spark, os.path.join(root, "bkt"), compact_every=99)
        build(flat_store, spark, bucketed=False)
        build(bkt_store, spark, bucketed=True)
        # an epoch delta's key set: TOUCHED keys spread over the id space
        keys_df = spark.range(TOUCHED).select(
            (F.col("id") * (N_KEYS // TOUCHED) + 13).alias("id")
        )
        n_buckets_touched = len(bkt_store.touched_buckets("t", keys_df) or [])
        # warm both paths once, then interleave 3 timed reps per side
        timed_read(flat_store, spark, keys_df, touched=False)
        timed_read(bkt_store, spark, keys_df, touched=True)
        full, pruned = [], []
        for _ in range(3):
            full.append(timed_read(flat_store, spark, keys_df, touched=False))
            pruned.append(timed_read(bkt_store, spark, keys_df, touched=True))
        med = lambda xs: sorted(xs)[1]  # noqa: E731
        print(json.dumps({
            "n_keys": N_KEYS,
            "n_buckets": N_BUCKETS,
            "touched_keys": TOUCHED,
            "touched_buckets": n_buckets_touched,
            "full_scan_sec": [round(x, 3) for x in full],
            "pruned_sec": [round(x, 3) for x in pruned],
            "full_median": round(med(full), 3),
            "pruned_median": round(med(pruned), 3),
            "speedup": round(med(full) / med(pruned), 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
