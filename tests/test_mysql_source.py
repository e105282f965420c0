"""MySQL pipeline source surface (sources/mysql_source.py): dialect/type
mapping (MySqlTypeUtils scope), factory options (MySqlDataSourceFactory
scope), and binlog replay decode over canned fixtures
(MySqlEventDeserializer.java:57-106 scope, minus a live server).
"""

import json

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.jdbc_snapshot import StartupMode
from flink_cdc_spark.sources.mysql_source import (
    MySqlBinlogDecoder,
    MySqlSourceConfig,
    mysql_streams,
    mysql_type,
    quote_identifier,
)


def test_type_mapping_matches_mysql_conventions():
    assert mysql_type("INT").root == "INT"
    assert mysql_type("BIGINT").root == "BIGINT"
    assert mysql_type("VARCHAR(255)").root == "VARCHAR"
    assert mysql_type("DECIMAL(10,2)").root == "DECIMAL"
    assert (mysql_type("DECIMAL(10,2)").precision, mysql_type("DECIMAL(10,2)").scale) == (10, 2)
    # tinyInt1isBit convention
    assert mysql_type("TINYINT(1)").root == "BOOLEAN"
    assert mysql_type("TINYINT(1)", tinyint1_is_bit=False).root == "TINYINT"
    assert mysql_type("TINYINT(3)").root == "TINYINT"
    # unsigned widening
    assert mysql_type("INT UNSIGNED").root == "BIGINT"
    assert mysql_type("BIGINT UNSIGNED").root == "DECIMAL"
    assert mysql_type("DATETIME").root == "TIMESTAMP"
    assert mysql_type("LONGTEXT").root == "VARCHAR"
    assert mysql_type("VARBINARY(16)").root in ("BYTES", "VARBINARY", "BINARY")
    assert not mysql_type("INT", nullable=False).nullable


def test_quoting_and_config_options():
    assert quote_identifier("a`b") == "`a``b`"
    cfg = MySqlSourceConfig.from_dict(
        {
            "hostname": "db.example.com",
            "port": "3307",
            "username": "u",
            "password": "p",
            "tables": r"app.\.*",
            "server-id": "5400-5404",
            "scan.incremental.snapshot.chunk.size": "4096",
            "connection.pool.size": "10",
            "scan.startup.mode": "latest-offset",
            "treat-tinyint1-as-boolean.enabled": "false",
        }
    )
    assert cfg.port == 3307 and cfg.chunk_size == 4096
    assert cfg.startup_mode == StartupMode.LATEST_OFFSET
    assert not cfg.tinyint1_is_bit
    assert cfg.jdbc_url("app").startswith("jdbc:mysql://db.example.com:3307/app?")
    live = cfg.to_live_config("app", "customer", "id")
    assert live.snapshot_pool == 10 and live.table_id == "app.customer"
    assert live.startup_mode == StartupMode.LATEST_OFFSET


def _binlog_fixture(path):
    """A canned binlog: CREATE, table map, writes, update, delete, and a
    mid-stream ALTER with a second table-map epoch (same binlog table id
    re-mapped, the case epoch resolution exists for)."""
    events = [
        {"type": "FORMAT_DESCRIPTION", "pos": 4},
        {"type": "QUERY", "pos": 100, "database": "app",
         "sql": "CREATE TABLE orders (id BIGINT NOT NULL PRIMARY KEY, "
                "item VARCHAR(64), qty INT, flag TINYINT(1))"},
        {"type": "TABLE_MAP", "pos": 200, "table_id": 109, "database": "app",
         "table": "orders", "columns": [
             {"name": "id", "type": "BIGINT"}, {"name": "item", "type": "VARCHAR(64)"},
             {"name": "qty", "type": "INT"}, {"name": "flag", "type": "TINYINT(1)"}]},
        {"type": "EXT_WRITE_ROWS", "pos": 210, "table_id": 109,
         "rows": [[1, "apple", 3, True], [2, "pear", 1, False], [3, "fig", 9, True]]},
        {"type": "EXT_UPDATE_ROWS", "pos": 220, "table_id": 109,
         "rows": [{"before": [2, "pear", 1, False], "after": [2, "pear", 5, True]}]},
        {"type": "EXT_DELETE_ROWS", "pos": 230, "table_id": 109,
         "rows": [[3, "fig", 9, True]]},
        {"type": "XID", "pos": 240},
        {"type": "QUERY", "pos": 300, "database": "app",
         "sql": "ALTER TABLE orders ADD COLUMN note VARCHAR(32)"},
        {"type": "TABLE_MAP", "pos": 310, "table_id": 110, "database": "app",
         "table": "orders", "columns": [
             {"name": "id", "type": "BIGINT"}, {"name": "item", "type": "VARCHAR(64)"},
             {"name": "qty", "type": "INT"}, {"name": "flag", "type": "TINYINT(1)"},
             {"name": "note", "type": "VARCHAR(32)"}]},
        {"type": "EXT_WRITE_ROWS", "pos": 320, "table_id": 110,
         "rows": [[4, "plum", 2, True, "rush"]]},
        {"type": "XID", "pos": 330},
    ]
    with open(path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
    return str(path)


def test_binlog_control_pass_ddl_and_epochs(spark, tmp_path):
    path = _binlog_fixture(tmp_path / "binlog.jsonl")
    dec = MySqlBinlogDecoder(spark)
    epochs, ddls, schemas = dec.scan_control(path)
    assert [e.pos for e in epochs] == [200, 310]
    assert [type(ev).__name__ for _, ev in ddls] == ["CreateTableEvent", "AddColumnEvent"]
    schema = schemas["app.orders"]
    assert [c.name for c in schema.columns] == ["id", "item", "qty", "flag", "note"]
    assert schema.primary_keys == ("id",)
    # tinyInt1isBit applied through the DDL parser path
    assert schema.get_column("flag").type.root == "BOOLEAN"


def test_binlog_replay_envelope_and_state(spark, tmp_path):
    path = _binlog_fixture(tmp_path / "binlog.jsonl")
    dec = MySqlBinlogDecoder(spark)
    _, _, schemas = dec.scan_control(path)
    env = dec.read_envelope(path, "app.orders", schemas["app.orders"].to_spark_struct())
    # executor-side decode: file scan + mapInPandas, nothing driver-built
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "LocalTableScan" not in plan
    ops = [r["__op"] for r in env.orderBy("__seq").collect()]
    assert ops == ["INSERT", "INSERT", "INSERT", "UPDATE", "DELETE", "INSERT"]
    state = materialize_changelog(env, ["id"])
    rows = {r.id: (r.item, r.qty, r.flag, r.note) for r in state.collect()}
    assert rows == {
        1: ("apple", 3, True, None),
        2: ("pear", 5, True, None),   # update applied
        4: ("plum", 2, True, "rush"),  # second epoch, 5-column image
    }  # 3 deleted


def test_binlog_row_payload_containing_control_tokens_not_dropped(spark, tmp_path):
    """A row whose string value serializes a control-token substring
    ('QUERY', 'XID', ...) must still decode: control-vs-row is decided
    from the parsed event type, never a substring heuristic."""
    events = [
        {"type": "TABLE_MAP", "pos": 10, "table_id": 7, "database": "app",
         "table": "logs", "columns": [
             {"name": "id", "type": "BIGINT"}, {"name": "msg", "type": "VARCHAR(64)"}]},
        {"type": "EXT_WRITE_ROWS", "pos": 20, "table_id": 7,
         "rows": [[1, 'slow "QUERY" seen'], [2, 'txn "XID" retry'],
                  [3, '"TABLE_MAP" and "ROTATE" and "FORMAT_DESCRIPTION"']]},
    ]
    path = tmp_path / "binlog_payload.jsonl"
    with open(path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
    dec = MySqlBinlogDecoder(spark)
    payload = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("msg", T.StringType())])
    env = dec.read_envelope(str(path), "app.logs", payload)
    rows = {r["after"]["id"]: r["after"]["msg"] for r in env.collect()}
    assert rows == {
        1: 'slow "QUERY" seen',
        2: 'txn "XID" retry',
        3: '"TABLE_MAP" and "ROTATE" and "FORMAT_DESCRIPTION"',
    }


def test_mysql_streams_binlog_replay_and_errors(spark, tmp_path):
    path = _binlog_fixture(tmp_path / "binlog.jsonl")
    streams = list(
        mysql_streams(spark, {"binlog-file": path, "tables": r"app.\.*"})
    )
    assert [str(s.table_id) for s in streams] == ["app.orders"]
    assert streams[0].schema.primary_keys == ("id",)
    final = materialize_changelog(streams[0].df, ["id"])
    assert final.count() == 3

    with pytest.raises(SystemExit, match="hostname"):
        list(mysql_streams(spark, {}))
    with pytest.raises(SystemExit, match="JDBC driver"):
        list(mysql_streams(spark, {"hostname": "nope.local"}))


def test_cli_mysql_binlog_source(spark, tmp_path):
    """YAML mysql source (binlog replay) -> transform -> parquet sink."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    path = _binlog_fixture(tmp_path / "binlog.jsonl")
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
pipeline:
  name: mysql-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "app.orders"))
    rows = {r.id: (r.item_u, r.qty) for r in written.collect()}
    assert rows == {1: ("APPLE", 3), 2: ("PEAR", 5), 4: ("PLUM", 2)}


def test_binlog_rows_event_exceeding_seq_band_fails_loudly(spark, tmp_path):
    """Round-5 fix pin: a single rows-event with >= 2^20 rows would overflow
    the per-position __seq band into the next binlog position's band — the
    decoder must raise instead of silently mis-ordering."""
    path = tmp_path / "binlog.jsonl"
    big = [[i] for i in range(1 << 20)]
    events = [
        {"type": "TABLE_MAP", "pos": 200, "table_id": 7, "database": "app",
         "table": "t", "columns": [{"name": "id", "type": "BIGINT"}]},
        {"type": "EXT_WRITE_ROWS", "pos": 210, "table_id": 7, "rows": big},
    ]
    with open(path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
    from pyspark.sql import types as T

    payload = T.StructType([T.StructField("id", T.LongType())])
    dec = MySqlBinlogDecoder(spark)
    env = dec.read_envelope(str(path), "app.t", payload)
    with pytest.raises(Exception, match="band would overflow"):
        env.collect()
