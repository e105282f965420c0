"""MySQL binlog v4 BINARY wire format (sources/mysql_binlog_wire.py):
writer/parser roundtrip, DDL-based TABLE_MAP name resolution, and
equivalence with the JSONL replay decoder's envelope."""

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.mysql_binlog_wire import (
    BinlogWriter,
    parse_binlog_bytes,
    resolve_table_maps,
)
from flink_cdc_spark.sources.mysql_source import MySqlBinaryBinlogDecoder

TYPES = ["BIGINT", "VARCHAR(64)", "INT", "TINYINT(1)"]


def _write_fixture(path):
    """Same logical stream as the JSONL fixture in test_mysql_source:
    CREATE, writes, update, delete, mid-stream ALTER + re-mapped table."""
    w = BinlogWriter()
    w.query(
        "app",
        "CREATE TABLE orders (id BIGINT NOT NULL PRIMARY KEY, "
        "item VARCHAR(64), qty INT, flag TINYINT(1))",
    )
    w.table_map(109, "app", "orders", TYPES)
    w.write_rows(109, TYPES, [
        [1, "apple", 3, 1], [2, "pear", 1, 0], [3, "fig", 9, 1],
    ])
    w.update_rows(109, TYPES, [
        ([2, "pear", 1, 0], [2, "pear", 5, 1]),
    ])
    w.delete_rows(109, TYPES, [[3, "fig", 9, 1]])
    w.xid()
    w.query("app", "ALTER TABLE orders ADD COLUMN note VARCHAR(32)")
    types2 = TYPES + ["VARCHAR(32)"]
    w.table_map(110, "app", "orders", types2)
    w.write_rows(110, types2, [[4, "plum", 2, 1, "rush"]])
    w.xid()
    with open(path, "wb") as f:
        f.write(w.to_bytes())
    return str(path)


def test_wire_parse_roundtrip(tmp_path):
    path = _write_fixture(tmp_path / "bin.000001")
    events = list(parse_binlog_bytes(open(path, "rb").read()))
    kinds = [e["type"] for e in events]
    assert kinds == [
        "FORMAT_DESCRIPTION", "QUERY", "TABLE_MAP", "EXT_WRITE_ROWS",
        "EXT_UPDATE_ROWS", "EXT_DELETE_ROWS", "XID", "QUERY", "TABLE_MAP",
        "EXT_WRITE_ROWS", "XID",
    ]
    # positions strictly increase (event END positions)
    poss = [e["pos"] for e in events]
    assert poss == sorted(poss) and len(set(poss)) == len(poss)
    wr = events[3]
    assert wr["rows"] == [[1, "apple", 3, 1], [2, "pear", 1, 0], [3, "fig", 9, 1]]
    up = events[4]
    assert up["rows"] == [{"before": [2, "pear", 1, 0], "after": [2, "pear", 5, 1]}]
    # TABLE_MAP has types but NO names until DDL resolution
    assert "columns" not in events[2] and len(events[2]["col_codes"]) == 4


def test_null_bitmap_and_wide_varchar(tmp_path):
    w = BinlogWriter()
    types = ["BIGINT", "VARCHAR(300)", "DOUBLE"]
    w.query("db", "CREATE TABLE t (a BIGINT PRIMARY KEY, b VARCHAR(300), c DOUBLE)")
    w.table_map(7, "db", "t", types)
    long_text = "x" * 280  # forces the 2-byte varchar length (meta >= 256)
    w.write_rows(7, types, [[1, long_text, 2.5], [2, None, None]])
    events = list(parse_binlog_bytes(w.to_bytes()))
    rows = [e for e in events if e["type"] == "EXT_WRITE_ROWS"][0]["rows"]
    assert rows[0] == [1, long_text, 2.5]
    assert rows[1] == [2, None, None]


def test_table_map_names_resolve_from_ddl(tmp_path):
    path = _write_fixture(tmp_path / "bin.000001")
    events = list(parse_binlog_bytes(open(path, "rb").read()))
    resolved, schemas = resolve_table_maps(events)
    tm1, tm2 = [e for e in resolved if e["type"] == "TABLE_MAP"]
    assert [c["name"] for c in tm1["columns"]] == ["id", "item", "qty", "flag"]
    assert [c["name"] for c in tm2["columns"]] == [
        "id", "item", "qty", "flag", "note",
    ]
    # a TABLE_MAP before its DDL is unresolvable — loud failure
    w = BinlogWriter()
    w.table_map(5, "db", "unknown", ["BIGINT"])
    with pytest.raises(ValueError, match="precedes its DDL"):
        resolve_table_maps(list(parse_binlog_bytes(w.to_bytes())))


def test_binary_decoder_matches_jsonl_semantics(spark, tmp_path):
    """The wire decoder's materialized state equals the JSONL decoder's on
    the same logical stream (tinyInt1isBit booleans included)."""
    path = _write_fixture(tmp_path / "bin.000001")
    dec = MySqlBinaryBinlogDecoder(spark)
    epochs, ddls, schemas = dec.scan_control(path)
    assert [type(e).__name__ for _, e in ddls] == [
        "CreateTableEvent", "AddColumnEvent",
    ]
    schema = schemas["app.orders"]
    assert schema.get_column("flag").type.root == "BOOLEAN"
    env = dec.read_envelope(path, "app.orders", schema.to_spark_struct())
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "LocalTableScan" not in plan
    state = materialize_changelog(env, ["id"])
    rows = {r.id: (r.item, r.qty, r.flag, r.note) for r in state.collect()}
    assert rows == {
        1: ("apple", 3, True, None),
        2: ("pear", 5, True, None),
        4: ("plum", 2, True, "rush"),
    }


def test_multi_segment_glob(spark, tmp_path):
    """Rotated segments parse as one stream: per-FILE executor tasks, DDL
    from segment 1 resolving TABLE_MAPs in segment 2."""
    w1 = BinlogWriter()
    w1.query("app", "CREATE TABLE t (id BIGINT PRIMARY KEY, v INT)")
    w1.table_map(9, "app", "t", ["BIGINT", "INT"])
    w1.write_rows(9, ["BIGINT", "INT"], [[1, 10], [2, 20]])
    (tmp_path / "bin.000001").write_bytes(w1.to_bytes())
    w2 = BinlogWriter()
    w2.table_map(9, "app", "t", ["BIGINT", "INT"])
    w2.write_rows(9, ["BIGINT", "INT"], [[3, 30]])
    (tmp_path / "bin.000002").write_bytes(w2.to_bytes())

    dec = MySqlBinaryBinlogDecoder(spark)
    glob = str(tmp_path / "bin.*")
    _, _, schemas = dec.scan_control(glob)
    env = dec.read_envelope(glob, "app.t", schemas["app.t"].to_spark_struct())
    state = {r.id: r.v for r in materialize_changelog(env, ["id"]).collect()}
    assert state == {1: 10, 2: 20, 3: 30}


def test_cli_auto_detects_binary_binlog(spark, tmp_path):
    """source.type=mysql with a BINARY binlog-file routes to the wire
    decoder by magic-byte sniffing."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    path = _write_fixture(tmp_path / "bin.000001")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: mysql
  binlog-file: {path}
  tables: app.orders
sink:
  type: parquet
  path: {out}
transform:
  - source-table: app.orders
    projection: id, UPPER(item) AS item_u, qty
    filter: qty >= 2
    primary-keys: id
pipeline:
  name: mysql-wire-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "app.orders"))
    rows = {r.id: (r.item_u, r.qty) for r in written.collect()}
    assert rows == {1: ("APPLE", 3), 2: ("PEAR", 5), 4: ("PLUM", 2)}


def test_cli_oceanbase_cdc_routes_through_mysql_surface(spark, tmp_path):
    """source.type=oceanbase-cdc (OceanBaseMySqlTableSourceFactory: an
    identifier-only subclass — the OceanBase Binlog Service speaks MySQL
    binlog) decodes the same wire fixture through the MySQL path."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    path = _write_fixture(tmp_path / "bin.000001")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: oceanbase-cdc
  binlog-file: {path}
  tables: app.orders
sink:
  type: parquet
  path: {out}
pipeline:
  name: oceanbase-binlog-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "app.orders"))
    assert written.count() > 0


SID_A = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
SID_B = "11111111-2222-3333-4444-555555555555"


def test_gtid_event_roundtrip():
    w = BinlogWriter()
    w.gtid(SID_A, 5)
    w.query("app", "BEGIN")
    events = list(parse_binlog_bytes(w.to_bytes()))
    g = [e for e in events if e["type"] == "GTID"]
    assert g == [{"type": "GTID", "pos": g[0]["pos"], "sid": SID_A, "gno": 5}]
    with pytest.raises(ValueError, match="16-byte"):
        w.gtid("abcd", 1)


def test_gtid_startup_skips_contained_transactions(spark, tmp_path):
    """scan.startup.specific-offset.gtid-set: transactions whose GTID the
    start set contains are skipped WHOLE; later transactions stream."""
    types = ["BIGINT", "VARCHAR(64)"]
    w = BinlogWriter()
    w.query(
        "app",
        "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(64))",
    )
    # txn 1 (covered): inserts 1,2
    w.gtid(SID_A, 1)
    w.table_map(5, "app", "t", types)
    w.write_rows(5, types, [[1, "a"], [2, "b"]])
    w.xid()
    # txn 2 (covered, other uuid): insert 3
    w.gtid(SID_B, 7)
    w.table_map(5, "app", "t", types)
    w.write_rows(5, types, [[3, "c"]])
    w.xid()
    # txn 3 (NOT covered): insert 4, update 1 -> would resurrect id=1
    w.gtid(SID_A, 2)
    w.table_map(5, "app", "t", types)
    w.write_rows(5, types, [[4, "d"]])
    w.update_rows(5, types, [([1, "a"], [1, "a2"])])
    w.xid()
    path = tmp_path / "bin.000001"
    path.write_bytes(w.to_bytes())

    dec = MySqlBinaryBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(str(path))
    payload = schemas["app.t"].to_spark_struct()

    # no filter: all five row events
    env_all = dec.read_envelope(str(path), "app.t", payload)
    assert env_all.count() == 5

    env = dec.read_envelope(
        str(path), "app.t", payload,
        start_gtid_set=f"MySQL56/{SID_A}:1,{SID_B}:1-7",
    )
    rows = sorted(
        (r["__op"], (r["after"] or r["before"])["id"]) for r in env.collect()
    )
    assert rows == [("INSERT", 4), ("UPDATE", 1)]

    state = {r["id"]: r["v"] for r in
             materialize_changelog(env, ["id"]).collect()}
    assert state == {4: "d", 1: "a2"}


def test_newdecimal_codec_roundtrip_and_order():
    import decimal
    from itertools import combinations

    from flink_cdc_spark.sources.mysql_binlog_wire import (
        decode_newdecimal,
        encode_newdecimal,
    )

    cases = ["-987654321098765432.10", "-1.01", "-0.50", "0.00", "0.01",
             "1.50", "123456789.99", "987654321098765432.10"]
    for p, sc in ((20, 2), (25, 2)):
        encs = []
        for c in cases:
            e = encode_newdecimal(decimal.Decimal(c), p, sc)
            v, off = decode_newdecimal(e, 0, p, sc)
            assert v == decimal.Decimal(c), (c, v)
            assert off == len(e)
            encs.append(e)
        # strings/decimal.c layout is memcomparable
        for (c1, e1), (c2, e2) in combinations(zip(cases, encs), 2):
            assert (decimal.Decimal(c1) < decimal.Decimal(c2)) == (e1 < e2)


def test_newdecimal_rejects_integer_overflow():
    """Values whose integer part exceeds precision-scale digits raise
    instead of silently dropping leading digits (MySQL clamps/errors;
    a bad fixture must fail loudly, not roundtrip to a different
    number)."""
    from flink_cdc_spark.sources.mysql_binlog_wire import encode_newdecimal

    for v, p, s in [(12345, 4, 0), (-12345, 4, 0), (100, 4, 2),
                    (99.999, 4, 2)]:  # 99.999 rounds up to 100.00
        with pytest.raises(ValueError, match="overflows"):
            encode_newdecimal(v, p, s)
    # boundary values still encode
    for v, p, s in [(9999, 4, 0), (-9999, 4, 0), (99.99, 4, 2), (0.99, 2, 2)]:
        encode_newdecimal(v, p, s)


def test_datetime2_and_date_codec():
    import datetime

    from flink_cdc_spark.sources.mysql_binlog_wire import (
        decode_datetime2,
        decode_mysql_date,
        encode_datetime2,
        encode_mysql_date,
    )

    dts = [
        datetime.datetime(1970, 1, 1, 0, 0, 0),
        datetime.datetime(1999, 12, 31, 23, 59, 59, 999000),
        datetime.datetime(2024, 2, 29, 12, 30, 45, 123456),
    ]
    for fsp in (0, 3, 6):
        encs = []
        for dt in dts:
            q = dt.replace(
                microsecond=(dt.microsecond // 10 ** (6 - fsp)) * 10 ** (6 - fsp)
            ) if fsp else dt.replace(microsecond=0)
            e = encode_datetime2(q, fsp)
            v, off = decode_datetime2(e, 0, fsp)
            assert v == q and off == len(e)
            encs.append(e)
        assert encs == sorted(encs)  # packed layout is ordered
    d = datetime.date(2024, 8, 14)
    assert decode_mysql_date(encode_mysql_date(d), 0) == (d, 3)


def test_wire_rows_with_rich_types(spark, tmp_path):
    """DECIMAL / DATETIME / DATE columns flow through TABLE_MAP metadata,
    rows events, DDL resolution, and the typed envelope cast."""
    import datetime
    import decimal

    types = ["BIGINT", "DECIMAL(12,2)", "DATETIME(6)", "DATE"]
    w = BinlogWriter()
    w.query(
        "app",
        "CREATE TABLE rich (id BIGINT NOT NULL PRIMARY KEY, "
        "amount DECIMAL(12,2), at DATETIME(6), d DATE)",
    )
    w.table_map(9, "app", "rich", types)
    rows = [
        [1, decimal.Decimal("12345.67"),
         datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), datetime.date(2024, 1, 2)],
        [2, decimal.Decimal("-0.99"),
         datetime.datetime(1999, 12, 31, 23, 59, 59), datetime.date(1999, 12, 31)],
    ]
    w.write_rows(9, types, rows)
    w.xid()
    path = tmp_path / "bin.000001"
    path.write_bytes(w.to_bytes())

    dec = MySqlBinaryBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(str(path))
    payload = schemas["app.rich"].to_spark_struct()
    env = dec.read_envelope(str(path), "app.rich", payload)
    got = {r["after"]["id"]: r["after"] for r in env.collect()}
    assert got[1]["amount"] == decimal.Decimal("12345.67")
    assert got[1]["at"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 678901)
    assert got[1]["d"] == datetime.date(2024, 1, 2)
    assert got[2]["amount"] == decimal.Decimal("-0.99")


def test_timestamp2_codec():
    import datetime

    from flink_cdc_spark.sources.mysql_binlog_wire import (
        decode_timestamp2,
        encode_timestamp2,
    )

    for fsp in (0, 3, 6):
        dt = datetime.datetime(2024, 8, 14, 10, 20, 30,
                               456000 if fsp else 0)
        e = encode_timestamp2(dt, fsp)
        assert len(e) == 4 + (fsp + 1) // 2
        v, off = decode_timestamp2(e, 0, fsp)
        assert v == dt and off == len(e)
    with pytest.raises(ValueError, match="range"):
        encode_timestamp2(datetime.datetime(1960, 1, 1), 0)


def test_json_binary_object_layout():
    """json_binary small-object layout details: sorted keys, inline
    literals/int16, offset-stored strings and nested containers."""
    import struct

    from flink_cdc_spark.sources.mysql_json_binary import (
        decode_json_binary,
        encode_json_binary,
    )

    enc = encode_json_binary({"bb": "x", "a": 7, "ccc": None})
    assert enc[0] == 0x00  # small object
    count, size = struct.unpack_from("<HH", enc, 1)
    assert count == 3 and size == len(enc) - 1
    # keys serialize sorted by (length, bytes): a, bb, ccc
    assert decode_json_binary(enc) == {"a": 7, "bb": "x", "ccc": None}


def test_wire_rows_with_json_and_timestamp(spark, tmp_path):
    """JSON + TIMESTAMP columns flow through TABLE_MAP metadata and the
    typed envelope (JSON maps to STRING text, MySqlTypeUtils)."""
    import datetime
    import json as _json

    types = ["BIGINT", "JSON", "TIMESTAMP(3)"]
    w = BinlogWriter()
    w.query(
        "app",
        "CREATE TABLE j (id BIGINT NOT NULL PRIMARY KEY, doc JSON, "
        "at TIMESTAMP(3))",
    )
    w.table_map(4, "app", "j", types)
    w.write_rows(4, types, [
        [1, {"k": [1, 2, {"deep": True}], "s": "tëxt"},
         datetime.datetime(2024, 5, 6, 7, 8, 9, 123000)],
        [2, None, None],
    ])
    w.xid()
    path = tmp_path / "bin.000001"
    path.write_bytes(w.to_bytes())

    dec = MySqlBinaryBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(str(path))
    env = dec.read_envelope(str(path), "app.j", schemas["app.j"].to_spark_struct())
    got = {r["after"]["id"]: r["after"] for r in env.collect()}
    assert _json.loads(got[1]["doc"]) == {"k": [1, 2, {"deep": True}], "s": "tëxt"}
    assert got[2]["doc"] is None and got[2]["at"] is None


def test_rotate_event_chains_segments(spark, tmp_path):
    """ROTATE closes a segment naming its successor; the multi-segment
    decode (glob) replays across the chain in order."""
    types = ["BIGINT", "VARCHAR(64)"]
    w1 = BinlogWriter()
    w1.query("app", "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(64))")
    w1.table_map(5, "app", "t", types)
    w1.write_rows(5, types, [[1, "a"], [2, "b"]])
    w1.xid()
    w1.rotate("bin.000002")
    (tmp_path / "bin.000001").write_bytes(w1.to_bytes())
    w2 = BinlogWriter()
    w2.table_map(5, "app", "t", types)
    w2.update_rows(5, types, [([1, "a"], [1, "a2"])])
    w2.delete_rows(5, types, [[2, "b"]])
    w2.xid()
    (tmp_path / "bin.000002").write_bytes(w2.to_bytes())

    events = list(parse_binlog_bytes((tmp_path / "bin.000001").read_bytes()))
    rot = [e for e in events if e["type"] == "ROTATE"]
    assert rot and rot[0]["next_file"] == "bin.000002" and rot[0]["next_pos"] == 4

    dec = MySqlBinaryBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(str(tmp_path / "bin.*"))
    env = dec.read_envelope(
        str(tmp_path / "bin.*"), "app.t", schemas["app.t"].to_spark_struct()
    )
    state = {r["id"]: r["v"] for r in
             materialize_changelog(env, ["id"]).collect()}
    assert state == {1: "a2"}


def test_binlog_streaming_bridge_with_mid_stream_alter(spark, tmp_path):
    """Segments replay through the checkpointed runner: segment 2 carries
    an ALTER TABLE ADD COLUMN in-band; pre-ALTER rows null-pad, the
    post-ALTER insert lands typed, updates/deletes across the boundary
    materialize correctly."""
    from flink_cdc_spark.streaming.binlog_bridge import BinlogStreamBridge

    types = ["BIGINT", "VARCHAR(64)"]
    w1 = BinlogWriter()
    w1.query("app", "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(64))")
    w1.table_map(5, "app", "t", types)
    w1.write_rows(5, types, [[1, "a"], [2, "b"], [3, "c"]])
    w1.xid()
    w1.rotate("bin.000002")
    (tmp_path / "bin.000001").write_bytes(w1.to_bytes())

    types2 = types + ["INT"]
    w2 = BinlogWriter()
    w2.query("app", "ALTER TABLE t ADD COLUMN n INT")
    w2.table_map(6, "app", "t", types2)
    w2.write_rows(6, types2, [[4, "d", 44]])
    w2.update_rows(6, types2, [([1, "a", None], [1, "a2", 11])])
    w2.delete_rows(6, types2, [[3, "c", None]])
    w2.xid()
    (tmp_path / "bin.000002").write_bytes(w2.to_bytes())

    bridge = BinlogStreamBridge(
        spark, str(tmp_path / "bin.*"), str(tmp_path / "work")
    )
    schemas = bridge.export_all()
    assert [c.name for c in schemas["app.t"].columns] == ["id", "v", "n"]
    bridge.run()
    state = {r["id"]: (r["v"], r["n"])
             for r in bridge.current_state("app.t").collect()}
    assert state == {1: ("a2", 11), 2: ("b", None), 4: ("d", 44)}


def test_gtid_skip_resets_across_segments(spark, tmp_path):
    """The whole-transaction skip flag is per-file: a covered txn closing
    segment 1 must not bleed into segment 2's first (uncovered) txn."""
    types = ["BIGINT", "VARCHAR(64)"]
    w1 = BinlogWriter()
    w1.query("app", "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(64))")
    w1.gtid(SID_A, 1)  # covered
    w1.table_map(5, "app", "t", types)
    w1.write_rows(5, types, [[1, "skipme"]])
    w1.xid()
    w1.rotate("bin.000002")
    (tmp_path / "bin.000001").write_bytes(w1.to_bytes())
    w2 = BinlogWriter()
    # segment 2 opens WITHOUT a GTID header before its first rows —
    # the per-file skip state must start fresh (not inherited)
    w2.table_map(5, "app", "t", types)
    w2.write_rows(5, types, [[2, "keep"]])
    w2.gtid(SID_A, 2)  # uncovered
    w2.table_map(5, "app", "t", types)
    w2.write_rows(5, types, [[3, "alsokeep"]])
    w2.xid()
    (tmp_path / "bin.000002").write_bytes(w2.to_bytes())

    dec = MySqlBinaryBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(str(tmp_path / "bin.*"))
    env = dec.read_envelope(
        str(tmp_path / "bin.*"), "app.t", schemas["app.t"].to_spark_struct(),
        start_gtid_set=f"MySQL56/{SID_A}:1",
    )
    got = sorted(r["after"]["id"] for r in env.collect())
    assert got == [2, 3]


def test_specific_offset_file_pos_startup(spark, tmp_path):
    """scan.startup.specific-offset.file/.pos
    (MySqlDataSourceOptions.java:135-146): events ending at or before the
    configured offset are NOT re-emitted; the filter honors segment order
    across a rotated chain (regression: the options parsed but the whole
    chain replayed)."""
    from flink_cdc_spark.sources.mysql_source import mysql_streams

    types = ["BIGINT", "VARCHAR(64)"]
    w1 = BinlogWriter()
    w1.query(
        "app",
        "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(64))",
    )
    w1.table_map(5, "app", "t", types)
    w1.write_rows(5, types, [[1, "a"], [2, "b"]])
    seg1_cut = [
        e["pos"] for e in parse_binlog_bytes(w1.to_bytes())
        if e["type"].endswith("WRITE_ROWS")
    ][-1]
    w1.table_map(5, "app", "t", types)
    w1.write_rows(5, types, [[3, "c"]])
    w1.xid()
    (tmp_path / "bin.000001").write_bytes(w1.to_bytes())
    w2 = BinlogWriter()
    w2.table_map(5, "app", "t", types)
    w2.write_rows(5, types, [[4, "d"]])
    w2.xid()
    (tmp_path / "bin.000002").write_bytes(w2.to_bytes())

    def ids(cfg_extra):
        cfg = {
            "binlog-file": str(tmp_path / "bin.*"),
            "tables": "app.t",
            **cfg_extra,
        }
        (stream,) = list(mysql_streams(spark, cfg))
        return sorted(r["after"]["id"] for r in stream.df.collect())

    # no startup config: the whole chain replays
    assert ids({}) == [1, 2, 3, 4]
    # mid-segment-1 offset: rows 1,2 already delivered
    assert ids({
        "scan.startup.mode": "specific-offsets",
        "scan.startup.specific-offset.file": "bin.000001",
        "scan.startup.specific-offset.pos": str(seg1_cut),
    }) == [3, 4]
    # start of segment 2: everything in segment 1 skipped
    assert ids({
        "scan.startup.mode": "specific-offsets",
        "scan.startup.specific-offset.file": "bin.000002",
        "scan.startup.specific-offset.pos": "0",
    }) == [4]
    # unknown segment file fails loudly instead of replaying from scratch
    with pytest.raises(SystemExit, match="not a segment"):
        ids({
            "scan.startup.mode": "specific-offsets",
            "scan.startup.specific-offset.file": "bin.000099",
            "scan.startup.specific-offset.pos": "4",
        })


def test_metadata_list_op_ts_through_transform(spark, tmp_path):
    """`metadata.list: op_ts` (MySqlDataSourceOptions METADATA_LIST,
    transform.md:74-96): the binlog header timestamp surfaces in the
    envelope meta map and is projectable in transform expressions as a
    bare identifier — millis, per the reference's op_ts contract."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    w = BinlogWriter()
    w.query("app", "CREATE TABLE t (id BIGINT PRIMARY KEY, v INT)")
    w.table_map(9, "app", "t", ["BIGINT", "INT"])
    w.write_rows(9, ["BIGINT", "INT"], [[1, 10]], ts=1700000001)
    w.table_map(9, "app", "t", ["BIGINT", "INT"])
    w.write_rows(9, ["BIGINT", "INT"], [[2, 20]], ts=1700000002)
    path = tmp_path / "bin.000001"
    path.write_bytes(w.to_bytes())
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: mysql
  binlog-file: {path}
  tables: app.t
  metadata.list: op_ts
sink:
  type: parquet
  path: {out}
transform:
  - source-table: app.t
    projection: id, v, op_ts AS opts
    primary-keys: id
pipeline:
  name: op-ts-meta
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "app.t"))
    rows = {r.id: r.opts for r in written.collect()}
    assert rows == {1: "1700000001000", 2: "1700000002000"}


def test_metadata_list_unknown_key_fails_fast(spark, tmp_path):
    import pytest as _pytest

    from flink_cdc_spark.sources.mysql_source import mysql_streams

    with _pytest.raises(SystemExit, match="metadata.list"):
        list(mysql_streams(spark, {"binlog-file": str(tmp_path / "x"),
                                   "metadata.list": "row_kind"}))
