"""TiDB KV-event decode: RowKey/row-v2 codec roundtrips, PUT/DELETE
semantics (flink-connector-tidb-cdc
RowDataTiKVChangeEventDeserializationSchema scope)."""

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sources import tikv_wire as w
from flink_cdc_spark.sources.tidb_source import (
    TiDBSourceConfig,
    decode_cdc_events,
    tidb_streams,
    tidb_type,
)
from flink_cdc_spark.sinks.materialize import materialize_changelog


# -- wire codec -------------------------------------------------------------


def test_row_key_roundtrip_and_order():
    for tid, h in [(1, 1), (77, -5), (2**40, 2**62), (-3, 0)]:
        assert w.decode_row_key(w.encode_row_key(tid, h)) == (tid, h)
    # memcomparable: byte order == numeric order for same table
    keys = [w.encode_row_key(9, h) for h in (-10, -1, 0, 1, 10, 2**40)]
    assert keys == sorted(keys)


def test_row_key_rejects_garbage():
    with pytest.raises(ValueError):
        w.decode_row_key(b"x" * 19)
    with pytest.raises(ValueError):
        w.decode_row_key(b"t" + b"\x00" * 8 + b"_i" + b"\x00" * 8)  # index key


def test_row_v2_roundtrip():
    types = {1: "long", 2: "string", 3: "double", 4: "bytes", 5: "long"}
    vals = {1: -42, 2: "héllo", 3: -2.5, 4: b"\x00\xff", 5: None}
    enc = w.encode_row_v2(vals)
    assert enc[0] == 0x80
    assert w.decode_row_v2(enc, types) == vals
    # int width minimality: small ints use 1 byte
    tiny = w.encode_row_v2({1: 7})
    assert len(tiny) == 1 + 1 + 4 + 1 + 2 + 1


def test_row_v2_double_order_preserving():
    import struct

    doubles = [-1e9, -2.5, -0.0, 0.0, 1.5, 3.14, 1e12]
    encs = [w._encode_double_value(d) for d in doubles]
    assert encs == sorted(encs)
    for d, e in zip(doubles, encs):
        assert struct.pack(">d", w._decode_double_value(e)) == struct.pack(">d", d)


def test_row_v2_rejects_unknown_column_and_bad_header():
    with pytest.raises(ValueError, match="tableInfo"):
        w.decode_row_v2(w.encode_row_v2({9: 1}), {1: "long"})
    with pytest.raises(ValueError, match="row-format-v2"):
        w.decode_row_v2(b"\x7f\x00\x00\x00\x00\x00", {})


# -- event decode -----------------------------------------------------------

INFO = {"id": (1, "long"), "name": (2, "string"), "bal": (3, "double")}
PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
    ]
)


def _row(ts, op, handle, value=None, old=None, tid=77):
    enc = lambda d: w.encode_row_v2({INFO[k][0]: v for k, v in d.items()}) if d else None
    return (ts, op, bytearray(w.encode_row_key(tid, handle)),
            None if value is None else bytearray(enc(value)),
            None if old is None else bytearray(enc(old)))


@pytest.fixture()
def events(spark):
    rows = [
        _row(10, "PUT", 1, value={"id": 1, "name": "a", "bal": 1.5}),
        _row(11, "PUT", 2, value={"id": 2, "name": "b", "bal": 2.5}),
        # update: PUT with old value present
        _row(20, "PUT", 1, value={"id": 1, "name": "a2", "bal": 1.75},
             old={"id": 1, "name": "a", "bal": 1.5}),
        # delete decodes the OLD image
        _row(30, "DELETE", 2, old={"id": 2, "name": "b", "bal": 2.5}),
        # other table id: dropped
        _row(40, "PUT", 9, value={"id": 9, "name": "x", "bal": 0.0}, tid=78),
    ]
    return spark.createDataFrame(
        rows,
        "commit_ts long, op_type string, key binary, value binary, old_value binary",
    )


def test_decode_events(spark, events):
    env = decode_cdc_events(events, 77, "tidb.t", INFO, PAYLOAD)
    got = sorted(
        (r["__seq"], r["__op"],
         None if r["before"] is None else r["before"]["name"],
         None if r["after"] is None else (r["after"]["name"], r["after"]["bal"]))
        for r in env.collect()
    )
    assert got == [
        (10, "INSERT", None, ("a", 1.5)),
        (11, "INSERT", None, ("b", 2.5)),
        (20, "UPDATE", None, ("a2", 1.75)),  # post-image only (UPDATE_AFTER)
        (30, "DELETE", "b", None),
    ]
    meta = env.where("__op = 'DELETE'").first()["__meta"]
    assert meta["handle"] == "2"


def test_materialized_state(spark, events):
    env = decode_cdc_events(events, 77, "tidb.t", INFO, PAYLOAD)
    final = materialize_changelog(env, ["id"])
    assert {(r["id"], r["name"]) for r in final.collect()} == {(1, "a2")}


BIN_INFO = {"id": (1, "long"), "blob": (2, "bytes")}
BIN_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def test_decode_events_binary_column(spark):
    """'bytes' table-info columns survive the decode VERBATIM — including
    non-UTF8 bytes (regression: json default=str turned them into the
    Python repr "b'..'" and the cast stored that repr's UTF-8)."""
    payloads = [b"\x00\xff\xfe plain", b"\x89PNG\r\n\x1a\n"]
    rows = [
        (10 + i, "PUT", bytearray(w.encode_row_key(77, i)),
         bytearray(w.encode_row_v2({1: i, 2: p})), None)
        for i, p in enumerate(payloads)
    ]
    events = spark.createDataFrame(
        rows,
        "commit_ts long, op_type string, key binary, value binary, old_value binary",
    )
    env = decode_cdc_events(events, 77, "tidb.t", BIN_INFO, BIN_PAYLOAD)
    got = {r["after"]["id"]: bytes(r["after"]["blob"]) for r in env.collect()}
    assert got == {i: p for i, p in enumerate(payloads)}


# -- options ----------------------------------------------------------------


def test_config_and_resolver(spark):
    cfg = TiDBSourceConfig.from_dict(
        {"database-name": "d", "table-name": "t",
         "pd-addresses": "pd:2379", "tikv.grpc.timeout_in_ms": "500"}
    )
    assert cfg.pd_addresses == "pd:2379" and cfg.grpc_timeout_ms == 500
    with pytest.raises(ValueError, match="scan.startup.mode"):
        TiDBSourceConfig.from_dict({"scan.startup.mode": "earliest"})
    with pytest.raises(SystemExit, match="pd-addresses"):
        tidb_streams(spark, {})
    with pytest.raises(SystemExit, match="KV-event decoder"):
        tidb_streams(spark, {"pd-addresses": "pd:2379"})
    assert str(tidb_type("DECIMAL", 10, 2)) == "DECIMAL(10, 2)"
    assert str(tidb_type("VARCHAR")) == "STRING"
