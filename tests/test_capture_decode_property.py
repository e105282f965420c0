"""Differential property test: the Db2 ASN and SQL Server CT capture-table
decoders, fed randomized valid changelogs, must materialize to exactly the
state a naive per-key dict replay produces."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.db2_source import decode_cd_table
from flink_cdc_spark.sources.sqlserver_source import decode_cdc_table

# compact action alphabet: (key 0-4, op 0=insert/1=update/2=delete, value)
actions_strategy = st.lists(
    st.tuples(
        st.integers(0, 4), st.integers(0, 2), st.integers(0, 999)
    ),
    min_size=1,
    max_size=25,
)


def _legalize(actions):
    """Filter to a VALID history (insert only when absent, update/delete
    only when present) and compute the expected final state."""
    state, ops = {}, []
    for key, op, val in actions:
        if op == 0 and key not in state:
            state[key] = val
            ops.append(("I", key, val, None))
        elif op == 1 and key in state:
            old = state[key]
            state[key] = val
            ops.append(("U", key, val, old))
        elif op == 2 and key in state:
            ops.append(("D", key, state.pop(key), None))
    return ops, state


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(actions_strategy)
def test_db2_decode_matches_replay(spark, actions):
    ops, expect = _legalize(actions)
    if not ops:
        return
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        commit = f"{n:08d}"
        if op == "I":
            rows.append((commit, "01", "I", key, val))
        elif op == "D":
            rows.append((commit, "01", "D", key, val))
        else:  # Db2 stores an update as D(old) then I(new) in one commit
            rows.append((commit, "01", "D", key, old))
            rows.append((commit, "02", "I", key, val))
    df = spark.createDataFrame(
        rows,
        "IBMSNAP_COMMITSEQ string, IBMSNAP_INTENTSEQ string, "
        "IBMSNAP_OPERATION string, id long, val long",
    )
    env = decode_cd_table(df, "DB2INST1.T")
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_sqlserver_decode_matches_replay(spark, actions):
    ops, expect = _legalize(actions)
    if not ops:
        return
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        lsn = f"{n:08d}"
        if op == "I":
            rows.append((lsn, "01", 2, key, val))
        elif op == "D":
            rows.append((lsn, "01", 1, key, val))
        else:  # CT updates: 3 = before, 4 = after, same (lsn, seqval)
            rows.append((lsn, "01", 3, key, old))
            rows.append((lsn, "01", 4, key, val))
    df = spark.createDataFrame(
        rows,
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, val long",
    )
    env = decode_cdc_table(df, "dbo.t")
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_mongodb_decode_matches_replay(spark, actions):
    """Change-stream docs (updateLookup mode) for a random valid history
    materialize to the dict-replay state."""
    import json as _json

    from pyspark.sql import types as T

    from flink_cdc_spark.sources.mongodb_source import (
        decode_change_stream,
        encode_resume_token,
    )

    ops, expect = _legalize(actions)
    if not ops:
        return
    lines = []
    for n, (op, key, val, old) in enumerate(ops):
        oid = f"{key:024x}"
        doc = {
            "_id": {"_data": encode_resume_token(1, n)},
            "operationType": {"I": "insert", "U": "update", "D": "delete"}[op],
            "ns": {"db": "app", "coll": "t"},
            "documentKey": {"_id": {"$oid": oid}},
        }
        if op != "D":
            doc["fullDocument"] = {
                "_id": {"$oid": oid},
                "id": {"$numberLong": str(key)},
                "val": {"$numberLong": str(val)},
            }
        lines.append((_json.dumps(doc),))
    raw = spark.createDataFrame(lines, "value string")
    payload = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("val", T.LongType()),
        ]
    )
    env = decode_change_stream(raw, "app.t", payload, database="app", collection="t")
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["_id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_tidb_decode_matches_replay(spark, actions):
    """cdcpb PUT/DELETE events over real record-key / row-v2 wire bytes
    materialize to the dict-replay state."""
    from pyspark.sql import types as T

    from flink_cdc_spark.sources.tidb_source import decode_cdc_events
    from flink_cdc_spark.sources.tikv_wire import encode_row_key, encode_row_v2

    ops, expect = _legalize(actions)
    if not ops:
        return
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        k = bytearray(encode_row_key(9, key))
        img = lambda v: bytearray(encode_row_v2({1: key, 2: v}))
        if op == "I":
            rows.append((n, "PUT", k, img(val), None))
        elif op == "U":
            rows.append((n, "PUT", k, img(val), img(old)))
        else:
            rows.append((n, "DELETE", k, None, img(val)))
    raw = spark.createDataFrame(
        rows,
        "commit_ts long, op_type string, key binary, value binary, old_value binary",
    )
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    env = decode_cdc_events(
        raw, 9, "tidb.t", {"id": (1, "long"), "val": (2, "long")}, payload
    )
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_debezium_json_roundtrip_matches_replay(spark, actions):
    """envelope -> debezium-json -> envelope is faithful for random valid
    histories (the kafka sink/source codec pair)."""
    from pyspark.sql import types as T

    from flink_cdc_spark.sources.envelope import envelope_schema
    from flink_cdc_spark.sources.kafka_json import (
        decode_debezium_json,
        encode_debezium_json,
    )

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    records = encode_debezium_json(env)
    decoded = decode_debezium_json(records, payload)
    got = {r["id"]: r["val"]
           for r in materialize_changelog(decoded, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_canal_json_roundtrip_matches_replay(spark, actions):
    """envelope -> canal-json -> envelope (pkNames carried) is faithful
    for random valid histories."""
    from pyspark.sql import types as T

    from flink_cdc_spark.sources.envelope import envelope_schema
    from flink_cdc_spark.sources.kafka_json import (
        decode_canal_json,
        encode_canal_json,
    )

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    records = encode_canal_json(env, pk_names=["id"])
    decoded = decode_canal_json(records, payload)
    got = {r["id"]: r["val"]
           for r in materialize_changelog(decoded, ["id"]).collect()}
    assert got == expect


def _sink_roundtrip_property(spark, actions, encode, decode, pk=("id",)):
    from pyspark.sql import types as T

    from flink_cdc_spark.sources.envelope import envelope_schema

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    decoded = decode(encode(env), payload)
    got = {r["id"]: r["val"]
           for r in materialize_changelog(decoded, list(pk)).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_fluss_roundtrip_matches_replay(spark, actions):
    from flink_cdc_spark.sinks.fluss_sink import decode_fluss, encode_fluss

    _sink_roundtrip_property(
        spark, actions,
        lambda env: encode_fluss(env, pk_names=["id"]),
        lambda recs, payload: decode_fluss(recs, payload, "app.t"),
    )


@SETTINGS
@given(actions_strategy)
def test_maxcompute_roundtrip_matches_replay(spark, actions):
    from flink_cdc_spark.sinks.maxcompute_sink import (
        decode_maxcompute,
        encode_maxcompute,
    )

    _sink_roundtrip_property(
        spark, actions,
        lambda env: encode_maxcompute(env, pk_names=["id"]),
        lambda recs, payload: decode_maxcompute(recs, payload, "app.t"),
    )


@SETTINGS
@given(actions_strategy)
def test_doris_roundtrip_matches_replay(spark, actions):
    from flink_cdc_spark.sinks.doris_sink import decode_doris, encode_doris

    _sink_roundtrip_property(
        spark, actions,
        lambda env: encode_doris(env, label_prefix="prop"),
        lambda recs, payload: decode_doris(recs, payload, "app.t"),
    )


@SETTINGS
@given(actions_strategy)
def test_starrocks_roundtrip_matches_replay(spark, actions):
    from flink_cdc_spark.sinks.starrocks_sink import (
        decode_starrocks,
        encode_starrocks,
    )

    _sink_roundtrip_property(
        spark, actions,
        encode_starrocks,
        lambda recs, payload: decode_starrocks(recs, payload, "app.t"),
    )


@SETTINGS
@given(actions_strategy, actions_strategy)
def test_iceberg_commits_match_replay_with_time_travel(spark, tmp_path_factory, a1, a2):
    """Two Iceberg commits of random valid histories: the head read equals
    the full replay, and time travel at the first snapshot equals the
    replay of only the first batch."""
    import tempfile
    import shutil

    from pyspark.sql import types as T

    from flink_cdc_spark.sinks.iceberg_store import IcebergTableStore
    from flink_cdc_spark.sources.envelope import envelope_schema

    ops1, expect1 = _legalize(a1)
    # batch 2 continues from batch-1 state
    state = dict(expect1)
    ops2 = []
    for key, op, val in a2:
        if op == 0 and key not in state:
            state[key] = val
            ops2.append(("I", key, val, None))
        elif op == 1 and key in state:
            old = state[key]
            state[key] = val
            ops2.append(("U", key, val, old))
        elif op == 2 and key in state:
            ops2.append(("D", key, state.pop(key), None))
    if not ops1 or not ops2:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )

    def env_of(ops, base):
        rows = []
        for n, (op, key, val, old) in enumerate(ops):
            seq = base + n
            if op == "I":
                rows.append(("app.t", "INSERT", None, (key, val), {}, seq))
            elif op == "U":
                rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, seq))
            else:
                rows.append(("app.t", "DELETE", (key, val), None, {}, seq))
        return spark.createDataFrame(rows, envelope_schema(payload))

    root = tempfile.mkdtemp(prefix="iceprop_")
    try:
        store = IcebergTableStore(spark, root)
        store.create_table("app.t", payload, ["id"])
        s1 = store.commit("app.t", env_of(ops1, 0), payload)
        store.commit("app.t", env_of(ops2, 10_000), payload)
        head = {r["id"]: r["val"] for r in store.read("app.t").collect()}
        assert head == state
        at1 = {r["id"]: r["val"]
               for r in store.read("app.t", snapshot_id=s1).collect()}
        assert at1 == expect1
    finally:
        shutil.rmtree(root, ignore_errors=True)


@SETTINGS
@given(actions_strategy)
def test_hudi_upsert_matches_replay(spark, actions):
    """One mixed MOR upsert batch of a random valid history reads back as
    the dict-replay state (incl. same-batch update-then-delete)."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from flink_cdc_spark.sinks.hudi_sink import (
        MERGE_ON_READ,
        HudiTableConfig,
        HudiTableStore,
    )
    from flink_cdc_spark.sources.envelope import envelope_schema

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    root = tempfile.mkdtemp(prefix="hudiprop_")
    try:
        store = HudiTableStore(spark, root)
        store.create_table(
            "app.t", payload,
            HudiTableConfig(["id"], table_type=MERGE_ON_READ, num_buckets=2),
        )
        store.upsert("app.t", env, payload)
        got = {r["id"]: r["val"] for r in store.read("app.t").collect()}
        assert got == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)


@SETTINGS
@given(actions_strategy)
def test_lsm_merge_matches_replay(spark, actions):
    """One LSM delta commit of a random valid history reads back as the
    dict-replay state."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from flink_cdc_spark.sinks.lsm_store import LsmStateStore
    from flink_cdc_spark.sources.envelope import envelope_schema

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    root = tempfile.mkdtemp(prefix="lsmprop_")
    try:
        store = LsmStateStore(spark, root, compact_every=100)
        store.merge("app.t", env, payload, ["id"])
        got = {r["id"]: r["val"] for r in store.read("app.t").collect()}
        assert got == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)


@SETTINGS
@given(actions_strategy)
def test_mysql_binlog_wire_matches_replay(spark, tmp_path_factory, actions):
    """The whole binary binlog path — writer -> v4 wire bytes -> parser ->
    DDL-resolved envelope -> materialize — reproduces the dict replay for
    random valid histories (update before-images track current state)."""
    import os
    import tempfile
    import shutil

    from flink_cdc_spark.sources.mysql_binlog_wire import BinlogWriter
    from flink_cdc_spark.sources.mysql_source import MySqlBinaryBinlogDecoder

    ops, expect = _legalize(actions)
    if not ops:
        return
    types = ["BIGINT", "BIGINT"]
    w = BinlogWriter()
    w.query("app", "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, val BIGINT)")
    w.table_map(5, "app", "t", types)
    for op, key, val, old in ops:
        if op == "I":
            w.write_rows(5, types, [[key, val]])
        elif op == "U":
            w.update_rows(5, types, [([key, old], [key, val])])
        else:
            w.delete_rows(5, types, [[key, val]])
    w.xid()
    root = tempfile.mkdtemp(prefix="binlogprop_")
    try:
        path = os.path.join(root, "bin.000001")
        with open(path, "wb") as f:
            f.write(w.to_bytes())
        dec = MySqlBinaryBinlogDecoder(spark)
        _, _, schemas = dec.scan_control(path)
        env = dec.read_envelope(path, "app.t", schemas["app.t"].to_spark_struct())
        got = {r["id"]: r["val"]
               for r in materialize_changelog(env, ["id"]).collect()}
        assert got == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)


@SETTINGS
@given(actions_strategy)
def test_es_bulk_roundtrip_matches_replay(spark, actions):
    """envelope -> _bulk NDJSON -> envelope: delete entries reconstruct
    their identity from _id; the materialized index equals the replay."""
    from pyspark.sql import types as T

    from flink_cdc_spark.sinks.elasticsearch_sink import (
        decode_es_bulk,
        encode_es_bulk,
    )
    from flink_cdc_spark.sources.envelope import envelope_schema

    ops, expect = _legalize(actions)
    if not ops:
        return
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        if op == "I":
            rows.append(("app.t", "INSERT", None, (key, val), {}, n))
        elif op == "U":
            rows.append(("app.t", "UPDATE", (key, old), (key, val), {}, n))
        else:
            rows.append(("app.t", "DELETE", (key, val), None, {}, n))
    env = spark.createDataFrame(rows, envelope_schema(payload))
    decoded = decode_es_bulk(
        encode_es_bulk(env, pk_names=["id"]), payload, table_id="app.t"
    )
    got = {r["id"]: r["val"]
           for r in materialize_changelog(decoded, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(st.lists(st.tuples(st.booleans(), st.binary(max_size=30)),
                min_size=1, max_size=20))
def test_kafka_segment_wire_roundtrip(spark, records):
    """RecordBatch v2 segments: writer -> parser preserves offsets, keys
    and values (incl. null keys/values) with valid CRCs."""
    import os
    import tempfile
    import shutil

    from flink_cdc_spark.sources.kafka_segment_wire import (
        parse_segment_bytes,
        write_segment,
    )

    kvs = [
        ((b"k%d" % i) if has_key else None, v if i % 3 else None)
        for i, (has_key, v) in enumerate(records)
    ]
    root = tempfile.mkdtemp(prefix="segprop_")
    try:
        path = os.path.join(root, "00000000000000000000.log")
        write_segment(path, [kvs], base_offset=7)
        parsed = list(parse_segment_bytes(open(path, "rb").read()))
        assert [o for o, _, _ in parsed] == list(range(7, 7 + len(kvs)))
        assert [(k, v) for _, k, v in parsed] == kvs
    finally:
        shutil.rmtree(root, ignore_errors=True)


@SETTINGS
@given(actions_strategy)
def test_oracle_logminer_matches_replay(spark, actions):
    """LogMiner-shape debezium records decode + materialize to the dict
    replay (SCN ordering)."""
    import json as _json

    from pyspark.sql import types as T

    from flink_cdc_spark.sources.oracle_source import decode_logminer_records

    ops, expect = _legalize(actions)
    if not ops:
        return
    lines = []
    for n, (op, key, val, old) in enumerate(ops):
        img = lambda v: {"id": key, "val": v}
        doc = {
            "op": {"I": "c", "U": "u", "D": "d"}[op],
            "before": img(old) if op == "U" else (img(val) if op == "D" else None),
            "after": img(val) if op != "D" else None,
            "source": {"db": "ORCL", "table": "T", "scn": str(n)},
        }
        lines.append((_json.dumps(doc),))
    raw = spark.createDataFrame(lines, "value string")
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    env = decode_logminer_records(raw, payload)
    got = {r["id"]: r["val"]
           for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_vitess_vstream_matches_replay(spark, actions):
    """Debezium-vitess records (one shard) decode + materialize to the
    dict replay."""
    import json as _json

    from pyspark.sql import types as T

    from flink_cdc_spark.sources.vitess_source import decode_vstream

    ops, expect = _legalize(actions)
    if not ops:
        return
    lines = []
    for n, (op, key, val, old) in enumerate(ops):
        img = lambda v: {"id": key, "val": v}
        doc = {
            "before": img(old) if op == "U" else (img(val) if op == "D" else None),
            "after": img(val) if op != "D" else None,
            "op": {"I": "c", "U": "u", "D": "d"}[op],
            "source": {"keyspace": "ks", "table": "t", "shard": "-",
                       "gtid": f"aaa:{n + 1}"},
        }
        lines.append((_json.dumps(doc),))
    raw = spark.createDataFrame(lines, "value string")
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    env = decode_vstream(raw, payload)
    got = {r["id"]: r["val"]
           for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_transform_filter_split_matches_model(spark, actions):
    """The PostTransformOperator semantics (projection on both images,
    filter-on-UPDATE Y/Y->U, Y/N->D, N/Y->I, N/N->drop) over random valid
    histories match an independent per-event replay model."""
    from flink_cdc_spark.core.events import CreateTableEvent, DataChangeEvent
    from flink_cdc_spark.core.schema import new_schema
    from flink_cdc_spark.core.table_id import TableId
    from flink_cdc_spark.pipeline.composer import EventPipelineComposer
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    ops, _ = _legalize(actions)
    if not ops:
        return
    tid = TableId.parse("db.t")
    schema = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("val", "BIGINT")
        .primary_key("id")
        .build()
    )
    events = [CreateTableEvent(tid, schema)]
    for op, key, val, old in ops:
        if op == "I":
            events.append(DataChangeEvent.insert(tid, (key, val)))
        elif op == "U":
            events.append(DataChangeEvent.update(tid, (key, old), (key, val)))
        else:
            events.append(DataChangeEvent.delete(tid, (key, val)))

    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: db.t
    projection: "id, val * 2 AS dval"
    filter: "dval >= 500"
pipeline: {execution.runtime-mode: BATCH, schema.change.behavior: EVOLVE}
"""
    composer = EventPipelineComposer(spark, parse_pipeline_yaml(yaml_text))
    result = composer.run(events)
    env = result.changelogs["db.t"]
    got = {r["id"]: r["dval"]
           for r in materialize_changelog(env, ["id"]).collect()}

    # independent model of the reference's split semantics
    state = {}
    proj = lambda key, v: (key, v * 2)
    keep = lambda img: img[1] is not None and img[1] >= 500
    for op, key, val, old in ops:
        if op == "I":
            after = proj(key, val)
            if keep(after):
                state[key] = after[1]
        elif op == "U":
            before, after = proj(key, old), proj(key, val)
            fb, fa = keep(before), keep(after)
            if fa:
                state[key] = after[1]
            elif fb:
                state.pop(key, None)
        else:
            before = proj(key, val)
            if keep(before):
                state.pop(key, None)
    assert got == state


@SETTINGS
@given(actions_strategy)
def test_route_merge_matches_model(spark, actions):
    """N->1 routing: two source tables merged into one sink table keep
    per-source-key isolation (keys disambiguated upstream) and match the
    merged replay."""
    from flink_cdc_spark.core.events import CreateTableEvent, DataChangeEvent
    from flink_cdc_spark.core.schema import new_schema
    from flink_cdc_spark.core.table_id import TableId
    from flink_cdc_spark.pipeline.composer import EventPipelineComposer
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    ops, _ = _legalize(actions)
    if not ops:
        return
    schema = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("val", "BIGINT")
        .primary_key("id")
        .build()
    )
    t1, t2 = TableId.parse("db.t1"), TableId.parse("db.t2")
    events = [CreateTableEvent(t1, schema), CreateTableEvent(t2, schema)]
    # interleave the history across both tables with disjoint key bands
    for n, (op, key, val, old) in enumerate(ops):
        tid, band = (t1, 0) if n % 2 == 0 else (t2, 1000)
        k = key + band
        if op == "I":
            events.append(DataChangeEvent.insert(tid, (k, val)))
        elif op == "U":
            events.append(DataChangeEvent.update(tid, (k, old), (k, val)))
        else:
            events.append(DataChangeEvent.delete(tid, (k, val)))
    # the legalized history was built per ORIGINAL key; banding splits it
    # across tables. Replay with the reference ValuesDatabase semantics
    # (insert/update both PUT the after image, delete removes) — an
    # update routed to a table that never saw the insert still upserts.
    model = {}
    for n, (op, key, val, old) in enumerate(ops):
        k = key + (0 if n % 2 == 0 else 1000)
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = val

    yaml_text = """
source: {type: values}
sink: {type: values}
route:
  - source-table: db.\\.*
    sink-table: mart.merged
pipeline: {execution.runtime-mode: BATCH, schema.change.behavior: EVOLVE}
"""
    composer = EventPipelineComposer(spark, parse_pipeline_yaml(yaml_text))
    result = composer.run(events)
    env = result.changelogs["mart.merged"]
    got = {r["id"]: r["val"]
           for r in materialize_changelog(env, ["id"]).collect()}
    assert got == model
