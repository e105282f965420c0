"""Randomized differential for the Hudi sink's precombine semantics
(sinks/hudi_sink.py): random upsert batches where every record — update
OR delete — carries its own precombine (ordering) value, replayed
through MOR (with random compaction points) and COW tables, final read
compared against a sequential model that keeps per-key the
max-(ordering, instant) winner. The interesting cases unit tests don't
sweep: an out-of-order UPDATE with a lower precombine value must LOSE
to already-written state; a DELETE whose before-image ordering is stale
must lose too (the key stays alive); compaction must preserve each
winner's ordering value so later stale log records still lose."""

import random

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.hudi_sink import (
    COPY_ON_WRITE,
    MERGE_ON_READ,
    HudiTableConfig,
    HudiTableStore,
)
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

SEED = 0x4D01

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("ord", T.DoubleType(), True),
    ]
)

ENV = T.StructType(
    [
        T.StructField("__table_id", T.StringType()),
        T.StructField("__op", T.StringType()),
        T.StructField("before", PAYLOAD),
        T.StructField("after", PAYLOAD),
        T.StructField("__meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("__seq", T.LongType()),
    ]
)


@pytest.mark.parametrize("table_type", [MERGE_ON_READ, COPY_ON_WRITE])
@pytest.mark.parametrize("trial", [0, 1])
def test_hudi_precombine_vs_sequential_model(spark, tmp_path, table_type, trial):
    rng = random.Random(SEED + trial * 7 + (table_type == COPY_ON_WRITE))
    st = HudiTableStore(spark, str(tmp_path / "hudi"))
    st.create_table(
        "db.t",
        PAYLOAD,
        HudiTableConfig(
            table_type=table_type,
            record_key_fields=["id"],
            ordering_field="ord",
            num_buckets=4,
        ),
    )

    # per-key pool of DISTINCT ordering values, consumed in random order
    # so records routinely arrive out of precombine order
    pools = {}

    def next_ord(k):
        pool = pools.setdefault(
            k, rng.sample(range(1, 1000), 30)
        )
        return float(pool.pop())

    # model: id -> list of (ord, instant, deleted, name)
    records = {}
    seq = 0
    keys = list(range(1, 13))

    for _batch in range(rng.randrange(3, 6)):
        rows = []
        for _ in range(rng.randrange(3, 10)):
            k = rng.choice(keys)
            o = next_ord(k)
            name = rng.choice(["a", "b", "c", "d"])
            r = rng.random()
            if r < 0.25 and k in records:
                # delete competing with its own (possibly stale) ordering
                rows.append(
                    ("db.t", OP_DELETE, (k, name, o), None, {}, seq)
                )
                records.setdefault(k, []).append((o, None, True, name))
            else:
                op = OP_UPDATE if k in records else OP_INSERT
                before = (k, "x", 0.0) if op == OP_UPDATE else None
                rows.append(("db.t", op, before, (k, name, o), {}, seq))
                records.setdefault(k, []).append((o, None, False, name))
            seq += 1
        instant = st.upsert(
            "db.t", spark.createDataFrame(rows, ENV), PAYLOAD
        )
        # stamp this batch's records with their instant for tie-breaks
        # (orderings are unique per key, so the instant never actually
        # decides — it documents the contract)
        for k in records:
            records[k] = [
                (o, i if i is not None else instant, d, n)
                for (o, i, d, n) in records[k]
            ]
        if table_type == MERGE_ON_READ and rng.random() < 0.3:
            st.compact("db.t")

    model = {}
    for k, recs in records.items():
        o, i, deleted, name = max(recs, key=lambda t: (t[0], t[1]))
        if not deleted:
            model[k] = (name, o)

    got = {
        r["id"]: (r["name"], r["ord"]) for r in st.read("db.t").collect()
    }
    assert got == model, f"{table_type} trial {trial} diverged"
