"""Key-bucketed LSM state layout (r16, VERDICT r15 item 4): state
tables opt into a synthetic hive-partition column
``__bucket = pmod(xxhash64(bucket keys), n)`` so a delta-bounded fold
prunes its read to the TOUCHED buckets at file listing — the 100-TB
shape for the epoch-state machines' per-epoch read, which was otherwise
an O(state) scan however small the delta.

Pinned here:

  * physical layout: every commit (delta and compacted base) lays out in
    ``__bucket=`` directories;
  * ``read(touched=keys)`` == full read restricted to the touched keys'
    buckets (a SUPERSET of the keys — callers keep their key-level
    semi-join) — checked against a python model through randomized
    upsert / delete / compact histories;
  * the pruning is real: the touched read's physical plan carries a
    ``__bucket``-keyed PartitionFilters entry, and only the touched
    buckets' files are scanned;
  * soundness across DDL: renaming a bucket KEY translates the spec, and
    reads stay correct (old files keep their physical __bucket dirs);
  * bucket columns never leak into the logical result schema.
"""

import random

import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_spark.sinks.lsm_store import LsmStateStore
from flink_cdc_spark.sources.envelope import wrap_as_upsert_deletes

SEED = 0xB0C4E7

STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)

N_BUCKETS = 4


def _batch(spark, rows):
    """rows: (id, v, dead)"""
    df = spark.createDataFrame(
        [(i, v, d) for (i, v, d) in rows],
        "id long, v long, __dead boolean",
    )
    return wrap_as_upsert_deletes(df, "app.t", "__dead")


def _merge(store, spark, rows):
    store.merge(
        "app.t",
        _batch(spark, rows),
        STRUCT,
        ["id"],
        batch_unique=True,
        bucket_keys=["id"],
        num_buckets=N_BUCKETS,
    )


def _bucket_of(spark, ids):
    """Engine-computed bucket per id (the layout must agree with the
    engine's xxhash64, not a python reimplementation)."""
    rows = spark.createDataFrame([(i,) for i in ids], "id long").select(
        "id", F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)).alias("b")
    ).collect()
    return {r.id: r.b for r in rows}


def test_bucketed_layout_and_touched_read(spark, tmp_path):
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    _merge(store, spark, [(i, i * 10, False) for i in range(8)])
    _merge(store, spark, [(0, 99, False), (3, 33, True)])

    # physical layout: delta dirs are hive-partitioned on __bucket
    import os

    d0 = tmp_path / "app.t" / "delta-00000000"
    assert any(fn.startswith("__bucket=") for fn in os.listdir(d0))

    model = {i: i * 10 for i in range(8)}
    model[0] = 99
    del model[3]

    # full read: bucket column does not leak
    full = store.read("app.t")
    assert full.columns == ["id", "v"]
    assert {(r.id, r.v) for r in full.collect()} == set(model.items())

    # touched read: superset-by-bucket of the touched keys, exact per model
    buckets = _bucket_of(spark, list(model))
    touched_keys = [0, 5]
    touched = spark.createDataFrame([(k,) for k in touched_keys], "id long")
    got = {(r.id, r.v) for r in store.read("app.t", touched=touched).collect()}
    want_buckets = {buckets[k] for k in touched_keys}
    want = {(k, v) for k, v in model.items() if buckets[k] in want_buckets}
    assert got == want
    # the caller's key-level semi-join lands exactly the touched keys
    assert {k for k, _ in got} >= set(touched_keys)


def test_touched_read_prunes_partitions_at_file_listing(spark, tmp_path):
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    _merge(store, spark, [(i, i, False) for i in range(16)])
    store.compact("app.t")

    touched = spark.createDataFrame([(1,)], "id long")
    pruned = store.read("app.t", touched=touched)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "__bucket" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]


def test_empty_touched_set_reads_empty(spark, tmp_path):
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    _merge(store, spark, [(1, 1, False)])
    empty = spark.createDataFrame([], "id long")
    out = store.read("app.t", touched=empty)
    assert out.count() == 0 and out.columns == ["id", "v"]


def test_bucket_key_rename_translates_spec(spark, tmp_path):
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    _merge(store, spark, [(i, i, False) for i in range(6)])
    store.rename_columns("app.t", [("id", "key_id")])
    m = store._load("app.t")
    assert m["bucket"]["keys"] == ["key_id"]
    # touched read under the NEW key name still prunes and still matches
    touched = spark.createDataFrame([(2,)], "key_id long")
    got = {(r.key_id, r.v) for r in store.read("app.t", touched=touched).collect()}
    buckets = _bucket_of(spark, range(6))
    want = {(k, k) for k in range(6) if buckets[k] == buckets[2]}
    assert got == want


@pytest.mark.parametrize("trial", range(3))
def test_bucketed_read_property(spark, tmp_path, trial):
    """Randomized upsert/delete/compact history on a bucketed table: at
    every checkpoint, read() == model, and read(touched=S) == model
    restricted to S's buckets — including tombstone suppression inside a
    pruned bucket."""
    rng = random.Random(SEED + trial)
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    model = {}
    keys = list(range(12))

    for step in range(rng.randrange(4, 7)):
        if rng.random() < 0.75 or not model:
            batch_keys = rng.sample(keys, rng.randrange(2, 6))
            rows = []
            for k in batch_keys:
                if model.get(k) is not None and rng.random() < 0.3:
                    rows.append((k, 0, True))
                    model.pop(k, None)
                else:
                    v = rng.randrange(1000)
                    rows.append((k, v, False))
                    model[k] = v
            _merge(store, spark, rows)
        else:
            store.compact("app.t")

        full = store.read("app.t")
        if full is None:
            continue
        assert {(r.id, r.v) for r in full.collect()} == set(model.items())
        probe = rng.sample(keys, rng.randrange(1, 4))
        touched = spark.createDataFrame([(k,) for k in probe], "id long")
        got = {
            (r.id, r.v) for r in store.read("app.t", touched=touched).collect()
        }
        buckets = _bucket_of(spark, keys)
        want_b = {buckets[k] for k in probe}
        want = {(k, v) for k, v in model.items() if buckets[k] in want_b}
        assert got == want, f"trial {trial} step {step}: {got} != {want}"


def test_batch_unique_debug_assertion(spark, tmp_path):
    """ADVICE r15: under the debug flag, a batch_unique=True caller that
    violates pk-uniqueness fails loudly at merge time instead of
    corrupting the single-part windowless read path."""
    from flink_cdc_spark.sinks import lsm_store as mod

    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    dup = _batch(spark, [(1, 10, False), (1, 20, False)])
    mod.DEBUG_ASSERT_BATCH_UNIQUE = True
    try:
        with pytest.raises(AssertionError, match="uniqueness contract"):
            store.merge("app.t", dup, STRUCT, ["id"], batch_unique=True)
    finally:
        mod.DEBUG_ASSERT_BATCH_UNIQUE = False
    # the same batch WITHOUT the flag's contract claim dedups soundly
    store.merge("app.t", dup, STRUCT, ["id"])
    assert store.read("app.t").count() == 1
