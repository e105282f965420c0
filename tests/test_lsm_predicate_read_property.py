"""Property differential for LsmStateStore.read(predicate) — the
lake-reader pruning path. The soundness rule (lsm_store.read docstring):
a predicate over columns whose value is immutable per key may be
applied to each commit scan BEFORE the merge window, because filtering
whole pk-partitions commutes with the window. Randomized upsert /
delete / compact histories (partitioned tables, half the trials with a
mid-history RENAME of the partition column) must satisfy, at every
checkpoint:

    read(t, predicate) == read(t).where(predicate) == python model

including tombstone suppression across the filter (a delete's before
image carries the partition value, so its tombstone lands in the same
partition as the row it kills).
"""

import random

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.lsm_store import LsmStateStore
from flink_cdc_spark.sources.envelope import (
    wrap_as_inserts,
    wrap_as_upsert_deletes,
)

SEED = 0x9A2D

STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

PARTS = ["p0", "p1", "p2"]


def _batch(spark, rows):
    """rows: (id, part, v, dead)"""
    df = spark.createDataFrame(
        [(i, p, v, d) for (i, p, v, d) in rows],
        "id long, part string, v long, __dead boolean",
    )
    return wrap_as_upsert_deletes(df, "app.t", "__dead")


@pytest.mark.parametrize("trial", range(4))
def test_predicate_read_equals_postfilter_and_model(spark, tmp_path, trial):
    rng = random.Random(SEED + trial)
    store = LsmStateStore(spark, str(tmp_path), compact_every=100)
    part_col = "part"
    # pin each key's partition once — the immutability contract
    part_of = {k: rng.choice(PARTS) for k in range(12)}
    model = {}
    renamed = False

    n_ops = rng.randrange(4, 7)
    for step in range(n_ops):
        op = rng.random()
        if op < 0.6 or not model:
            # upsert/delete batch over random keys
            keys = rng.sample(sorted(part_of), rng.randrange(2, 6))
            rows = []
            for k in keys:
                if model.get(k) is not None and rng.random() < 0.3:
                    rows.append((k, part_of[k], 0, True))
                    model.pop(k, None)
                else:
                    v = rng.randrange(1000)
                    rows.append((k, part_of[k], v, False))
                    model[k] = v
            if renamed:
                struct = T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("zone", T.StringType()),
                        T.StructField("v", T.LongType()),
                    ]
                )
                env = _renamed_batch(spark, rows)
            else:
                struct = STRUCT
                env = _batch(spark, rows)
            store.merge(
                "app.t", env, struct, ["id"], partition_keys=[part_col]
            )
        elif op < 0.8:
            store.compact("app.t")
        elif not renamed and trial % 2 == 1:
            store.rename_columns("app.t", [("part", "zone")])
            part_col, renamed = "zone", True

        # checkpoint: filtered read == post-filtered read == model
        target = rng.choice(PARTS)
        pred = f"{part_col} = '{target}'"
        full = store.read("app.t")
        if full is None:
            continue
        got_pred = {(r.id, r.v) for r in store.read("app.t", pred).collect()}
        got_post = {(r.id, r.v) for r in full.where(pred).collect()}
        want = {
            (k, v) for k, v in model.items() if part_of[k] == target
        }
        assert got_pred == got_post == want, (
            f"trial {trial} step {step} pred={pred}: "
            f"pred={sorted(got_pred)} post={sorted(got_post)} "
            f"model={sorted(want)}"
        )


def _renamed_batch(spark, rows):
    df = spark.createDataFrame(
        [(i, p, v, d) for (i, p, v, d) in rows],
        "id long, zone string, v long, __dead boolean",
    )
    return wrap_as_upsert_deletes(df, "app.t", "__dead")
