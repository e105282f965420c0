"""MongoDB change-stream source: resume tokens, extended-JSON decode,
updateLookup vs full-changelog semantics (flink-connector-mongodb-cdc
MongoDBConnectorDeserializationSchema / ...FullChangelogDeserializationSchema
/ ResumeTokenUtils scope)."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_spark.sources.mongodb_source import (
    MongoDBSourceConfig,
    decode_change_stream,
    decode_resume_token,
    encode_resume_token,
    mongodb_streams,
    _unwrap,
)
from flink_cdc_spark.sinks.materialize import materialize_changelog


# -- resume tokens ----------------------------------------------------------


def test_resume_token_roundtrip():
    hexed = encode_resume_token(1700000000, 42)
    assert decode_resume_token(hexed) == (1700000000, 42)
    # BinData form (raw bytes) accepted too
    assert decode_resume_token(bytes.fromhex(hexed)) == (1700000000, 42)


def test_resume_token_rejects_bad_ktype():
    bad = "7f" + "00" * 8
    with pytest.raises(ValueError, match="keyType"):
        decode_resume_token(bad)


def test_resume_token_rejects_short_and_nonbytes():
    with pytest.raises(ValueError):
        decode_resume_token("82" + "00" * 3)
    with pytest.raises(ValueError):
        decode_resume_token(12345)


# -- extended JSON unwrap ---------------------------------------------------


def test_unwrap_wrappers():
    doc = {
        "_id": {"$oid": "64e000000000000000000001"},
        "n_long": {"$numberLong": "9007199254740993"},
        "n_int": {"$numberInt": "7"},
        "n_double": {"$numberDouble": "2.5"},
        "n_decimal": {"$numberDecimal": "123456789012345678.90"},
        "when": {"$date": "1996-01-02T03:04:05.678Z"},
        "when_ms": {"$date": {"$numberLong": "86400000"}},
        "blob": {"$binary": {"base64": "aGk=", "subType": "00"}},
        "nested": {"a": [{"$numberInt": "1"}, {"$numberInt": "2"}]},
    }
    u = _unwrap(doc)
    assert u["_id"] == "64e000000000000000000001"
    assert u["n_long"] == 9007199254740993
    assert u["n_int"] == 7
    assert u["n_double"] == 2.5
    assert u["n_decimal"] == "123456789012345678.90"  # textual, cast parses
    assert u["when"] == "1996-01-02 03:04:05.678"
    assert u["when_ms"] == "1970-01-02 00:00:00.000000"
    assert u["blob"] == "aGk="
    assert u["nested"]["a"] == [1, 2]


# -- change-stream decode ---------------------------------------------------

PAYLOAD = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _doc(op, t, i, oid, full=None, before=None, db="app", coll="orders"):
    d = {
        "_id": {"_data": encode_resume_token(t, i)},
        "operationType": op,
        "clusterTime": {"$timestamp": {"t": t, "i": i}},
        "ns": {"db": db, "coll": coll},
        "documentKey": {"_id": {"$oid": oid}},
    }
    if full is not None:
        d["fullDocument"] = full
    if before is not None:
        d["fullDocumentBeforeChange"] = before
    return json.dumps(d)


def _img(oid, qty, price):
    return {
        "_id": {"$oid": oid},
        "qty": {"$numberLong": str(qty)},
        "price": {"$numberDouble": str(price)},
    }


OID1 = "64e000000000000000000001"
OID2 = "64e000000000000000000002"
OID3 = "64e000000000000000000003"


@pytest.fixture()
def stream_lines(spark):
    lines = [
        _doc("insert", 100, 1, OID1, full=_img(OID1, 5, 1.5)),
        _doc("insert", 100, 2, OID2, full=_img(OID2, 7, 2.5)),
        _doc("insert", 100, 3, OID3, full=_img(OID3, 9, 3.5)),
        # update with both images present in the stream
        _doc("update", 101, 1, OID1, full=_img(OID1, 6, 1.75),
             before=_img(OID1, 5, 1.5)),
        # replace
        _doc("replace", 102, 1, OID2, full=_img(OID2, 70, 2.5),
             before=_img(OID2, 7, 2.5)),
        # delete (documentKey only in updateLookup; before image available)
        _doc("delete", 103, 1, OID3, before=_img(OID3, 9, 3.5)),
        # control ops the deserializer skips
        _doc("drop", 104, 1, OID1),
        _doc("invalidate", 104, 2, OID1),
        # a different collection, filtered out
        _doc("insert", 105, 1, OID1, full=_img(OID1, 1, 1.0), coll="other"),
    ]
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_update_lookup_mode(spark, stream_lines):
    env = decode_change_stream(
        stream_lines, "app.orders", PAYLOAD,
        database="app", collection="orders",
    )
    rows = {(r[0], r[1]): r for r in (
        (r["__op"], r["__seq"], r["before"], r["after"], r["__meta"])
        for r in env.collect()
    )}
    assert len(rows) == 6  # drop/invalidate/other-collection skipped
    upd = rows[("UPDATE", (101 << 32) | 1)]
    assert upd[2] is None  # updateLookup: post-image only
    assert upd[3]["qty"] == 6 and upd[3]["price"] == 1.75
    dele = rows[("DELETE", (103 << 32) | 1)]
    assert dele[3] is None
    assert dele[2]["_id"] == OID3 and dele[2]["qty"] is None  # key-only image
    repl = rows[("UPDATE", (102 << 32) | 1)]
    assert repl[3]["qty"] == 70
    meta = rows[("INSERT", (100 << 32) | 1)][4]
    assert meta["database_name"] == "app"
    assert meta["collection_name"] == "orders"
    assert meta["op_ts"] == "100000"


def test_full_changelog_mode(spark, stream_lines):
    env = decode_change_stream(
        stream_lines, "app.orders", PAYLOAD,
        full_changelog=True, database="app", collection="orders",
    )
    by_key = {(r["__op"], r["__seq"]): r for r in env.collect()}
    upd = by_key[("UPDATE", (101 << 32) | 1)]
    assert upd["before"]["qty"] == 5 and upd["after"]["qty"] == 6
    dele = by_key[("DELETE", (103 << 32) | 1)]
    assert dele["before"]["qty"] == 9  # fullDocumentBeforeChange image


def test_materialized_state(spark, stream_lines):
    env = decode_change_stream(
        stream_lines, "app.orders", PAYLOAD,
        database="app", collection="orders",
    )
    final = materialize_changelog(env, ["_id"])
    state = {r["_id"]: (r["qty"], r["price"]) for r in final.collect()}
    assert state == {OID1: (6, 1.75), OID2: (70, 2.5)}


# -- options / resolver -----------------------------------------------------


def test_config_from_dict():
    cfg = MongoDBSourceConfig.from_dict(
        {
            "hosts": "rs0:27017,rs1:27017",
            "database": "app",
            "collection": "orders",
            "scan.full-changelog": "true",
            "scan.incremental.snapshot.enabled": "true",
            "scan.incremental.snapshot.chunk.size.mb": "128",
            "poll.max.batch.size": "2048",
        }
    )
    assert cfg.full_changelog is True
    assert cfg.incremental_snapshot_enabled is True
    assert cfg.incremental_snapshot_chunk_size_mb == 128
    assert cfg.poll_max_batch_size == 2048
    assert "rs0:27017" in cfg.connection_uri()


def test_config_rejects_bad_scheme():
    with pytest.raises(ValueError, match="scheme"):
        MongoDBSourceConfig.from_dict({"scheme": "http", "hosts": "x"})


def test_live_resolver_fails_fast(spark):
    # mongodb_streams is a generator (replay mode yields TableStreams);
    # live-mode errors raise on iteration
    with pytest.raises(SystemExit, match="hosts"):
        list(mongodb_streams(spark, {}))
    with pytest.raises(SystemExit, match="changestream-file"):
        list(mongodb_streams(spark, {"hosts": "rs0:27017"}))


def test_changestream_file_replay_cli(spark, tmp_path):
    """Offline change-stream replay end-to-end from YAML: collections
    discovered from ns fields, schemas inferred from the images, final
    state materialized per collection."""
    import json as _json

    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    lines = [
        _doc("insert", 100, 1, OID1, full=_img(OID1, 5, 1.5)),
        _doc("insert", 100, 2, OID2, full=_img(OID2, 7, 2.5)),
        _doc("update", 101, 1, OID1, full=_img(OID1, 6, 1.75)),
        _doc("delete", 102, 1, OID2),
        # a second collection in the same stream
        _doc("insert", 103, 1, OID3, full=_img(OID3, 9, 3.5), coll="users"),
    ]
    stream = tmp_path / "changes.jsonl"
    stream.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: mongodb
  changestream-file: {stream}
  tables: app.\\.*
sink:
  type: parquet
  path: {out}
pipeline:
  name: mongo-replay
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    assert set(summary.tables) == {"app.orders", "app.users"}
    orders = spark.read.parquet(str(out / "app.orders"))
    state = {r["_id"]: (r["qty"], r["price"]) for r in orders.collect()}
    assert state == {OID1: (6, 1.75)}
    users = spark.read.parquet(str(out / "app.users"))
    assert {r["qty"] for r in users.collect()} == {9}


def test_changestream_schema_widens_across_stream(spark, tmp_path):
    """Schemaless reality: a field appearing only in LATER documents still
    lands in the inferred schema; early rows carry NULL for it."""
    import json as _json

    from flink_cdc_spark.sources.mongodb_source import (
        infer_collection_schema,
        decode_change_stream,
    )

    early = _doc("insert", 100, 1, OID1, full={"_id": {"$oid": OID1},
                                               "qty": {"$numberLong": "5"}})
    late = _doc("insert", 101, 1, OID2, full={"_id": {"$oid": OID2},
                                              "qty": {"$numberLong": "7"},
                                              "rating": {"$numberDouble": "4.5"}})
    raw = spark.createDataFrame([(early,), (late,)], "value string")
    payload = infer_collection_schema(raw, "app", "orders")
    assert set(payload.fieldNames()) >= {"_id", "qty", "rating"}
    env = decode_change_stream(raw, "app.orders", payload,
                               database="app", collection="orders")
    rows = {r["after"]["_id"]: r["after"] for r in env.collect()}
    assert rows[OID1]["rating"] is None  # early row null-pads
    assert rows[OID2]["rating"] == 4.5


def test_mongo_streaming_bridge_schema_evolution(spark, tmp_path):
    """Change-stream streaming replay: a field appearing in a LATER slice
    becomes an in-band ADD COLUMN through the checkpointed runner."""
    from flink_cdc_spark.streaming.mongo_bridge import MongoChangeStreamBridge

    lines = [
        _doc("insert", 100, 1, OID1,
             full={"_id": {"$oid": OID1}, "qty": {"$numberLong": "5"}}),
        _doc("insert", 100, 2, OID2,
             full={"_id": {"$oid": OID2}, "qty": {"$numberLong": "7"}}),
        _doc("update", 200, 1, OID1,
             full={"_id": {"$oid": OID1}, "qty": {"$numberLong": "6"},
                   "rating": {"$numberDouble": "4.5"}}),
        _doc("delete", 300, 1, OID2),
    ]
    stream = tmp_path / "stream.jsonl"
    stream.write_text("\n".join(lines) + "\n")
    bridge = MongoChangeStreamBridge(
        spark, str(stream), str(tmp_path / "work"), "app", "orders", slices=3
    )
    schema = bridge.export_all()
    assert [c.name for c in schema.columns] == ["_id", "qty", "rating"]
    bridge.run()
    state = {r["_id"]: (r["qty"], r["rating"])
             for r in bridge.current_state().collect()}
    assert state == {OID1: (6, 4.5)}


def test_changestream_replay_default_selector(spark, tmp_path):
    """Omitting `tables` must fall back to a VALID match-all selector:
    every discovered collection replays (regression: the old default
    `.*.\\.*` split into a bare `*` part and re.compile raised)."""
    lines = [
        _doc("insert", 100, 1, OID1, full=_img(OID1, 5, 1.5)),
        _doc("insert", 103, 1, OID3, full=_img(OID3, 9, 3.5), coll="users"),
    ]
    stream = tmp_path / "changes.jsonl"
    stream.write_text("\n".join(lines) + "\n")
    streams = list(
        mongodb_streams(spark, {"changestream-file": str(stream)})
    )
    assert {str(s.table_id) for s in streams} == {"app.orders", "app.users"}
