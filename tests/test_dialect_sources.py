"""Oracle / SQL Server pipeline-source surfaces (sources/oracle_source.py,
sources/sqlserver_source.py): type dialects (OracleTypeUtils /
SqlServerTypeUtils scope), factory options, and change decode over canned
fixtures (OracleEventDeserializer / SqlServerEventDeserializer scope,
minus live servers)."""

import json

import pytest

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.jdbc_snapshot import StartupMode
from flink_cdc_spark.sources.oracle_source import (
    OracleSourceConfig,
    decode_logminer_records,
    oracle_streams,
    oracle_type,
)
from flink_cdc_spark.sources.sqlserver_source import (
    SqlServerSourceConfig,
    capture_instance_name,
    decode_cdc_table,
    sqlserver_streams,
    sqlserver_type,
)


# -- type dialects -----------------------------------------------------------


def test_oracle_number_resolution():
    assert oracle_type("NUMBER", 10, 2).root == "DECIMAL"
    assert oracle_type("NUMBER", 5, 0).root == "INT"
    assert oracle_type("NUMBER", 12, 0).root == "BIGINT"
    assert oracle_type("NUMBER", 30, 0).root == "DECIMAL"
    # negative scale rounds into integer digits: NUMBER(8, -2) holds 10 digits
    assert oracle_type("NUMBER", 8, -2).root == "BIGINT"
    assert oracle_type("VARCHAR2(100)").root == "VARCHAR"
    assert oracle_type("BINARY_DOUBLE").root == "DOUBLE"
    assert oracle_type("DATE").root == "TIMESTAMP"  # Oracle DATE has time
    assert oracle_type("RAW").root in ("BYTES", "VARBINARY", "BINARY")
    assert not oracle_type("NUMBER", 5, 0, nullable=False).nullable


def test_sqlserver_type_mapping():
    assert sqlserver_type("money").root == "DECIMAL"
    assert (sqlserver_type("money").precision, sqlserver_type("money").scale) == (19, 4)
    assert sqlserver_type("smallmoney").precision == 10
    assert sqlserver_type("tinyint").root == "SMALLINT"  # unsigned 0-255
    assert sqlserver_type("datetime").root == "TIMESTAMP"
    assert sqlserver_type("uniqueidentifier").root == "VARCHAR"
    assert sqlserver_type("rowversion").root in ("BYTES", "VARBINARY", "BINARY")
    assert sqlserver_type("nvarchar(50)").root == "VARCHAR"
    assert sqlserver_type("decimal", 12, 3).root == "DECIMAL"


def test_configs_and_urls():
    o = OracleSourceConfig.from_dict(
        {"hostname": "ora", "port": "1522", "database": "XE",
         "connection.pool.size": "7", "scan.startup.mode": "latest-offset"}
    )
    assert o.jdbc_url() == "jdbc:oracle:thin:@ora:1522:XE"
    live = o.to_live_config("app", "orders", "id")
    assert live.snapshot_pool == 7 and live.startup_mode == StartupMode.LATEST_OFFSET
    o2 = OracleSourceConfig.from_dict({"jdbc.url": "jdbc:oracle:thin:@//h/S"})
    assert o2.jdbc_url() == "jdbc:oracle:thin:@//h/S"

    s = SqlServerSourceConfig.from_dict(
        {"hostname": "mssql", "scan.incremental.snapshot.chunk.key-column": "k2"}
    )
    assert "jdbc:sqlserver://mssql:1433" in s.jdbc_url("app")
    assert s.to_live_config("app", "t", "id").key_column == "k2"
    assert capture_instance_name("dbo", "orders") == "cdc.dbo_orders_CT"


# -- SQL Server CT-table decode ---------------------------------------------


def _ct_fixture(spark):
    """One polled slice: insert id=1, insert id=2, update id=1 (3+4 pair),
    delete id=2 — LSNs as sortable hex strings, the CT-table layout."""
    rows = [
        ("0A01", "01", 2, 1, "a", 10.0),
        ("0A02", "01", 2, 2, "b", 20.0),
        ("0A03", "01", 3, 1, "a", 10.0),   # update: before image
        ("0A03", "01", 4, 1, "a2", 11.0),  # update: after image
        ("0A04", "01", 1, 2, "b", 20.0),   # delete
    ]
    return spark.createDataFrame(
        rows,
        "`__$start_lsn` STRING, `__$seqval` STRING, `__$operation` INT, "
        "id LONG, name STRING, val DOUBLE",
    )


def test_sqlserver_ct_decode(spark):
    env = decode_cdc_table(_ct_fixture(spark), "dbo.items")
    by_seq = sorted(env.collect(), key=lambda r: r["__seq"])
    ops = [r["__op"] for r in by_seq]
    assert ops == ["INSERT", "INSERT", "UPDATE", "DELETE"]
    upd = by_seq[2]
    assert (upd["before"].name, upd["after"].name) == ("a", "a2")
    assert upd["after"].val == 11.0
    state = materialize_changelog(env, ["id"])
    rows = {r.id: (r.name, r.val) for r in state.collect()}
    assert rows == {1: ("a2", 11.0)}  # 2 deleted


def test_sqlserver_ct_decode_no_self_join(spark):
    """The 3/4 pairing must be one aggregation, not a SELF-join of the
    change relation. The r10 rank decomposition adds one BROADCAST join
    of the tiny per-LSN offset aggregate — allowed; a shuffle join of
    the big side is not. The change rows themselves must never hit a
    single-partition (global) window — the rank window must be
    partitioned by __lsn."""
    env = decode_cdc_table(_ct_fixture(spark), "dbo.items")
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "dense_rank(__sv" in plan and "windowspecdefinition(__lsn" in plan


# -- Oracle LogMiner-shape decode -------------------------------------------


def test_oracle_logminer_decode(spark):
    recs = [
        {"op": "c", "before": None, "after": {"id": 1, "v": "x"},
         "source": {"db": "ORCL", "table": "T", "scn": "1001"}, "ts_ms": 1},
        {"op": "u", "before": {"id": 1, "v": "x"}, "after": {"id": 1, "v": "y"},
         "source": {"db": "ORCL", "table": "T", "scn": "1002"}, "ts_ms": 2},
        {"op": "d", "before": {"id": 1, "v": "y"}, "after": None,
         "source": {"db": "ORCL", "table": "T", "scn": "1003"}, "ts_ms": 3},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in recs], "value STRING")
    from pyspark.sql import types as T

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    env = decode_logminer_records(df, payload)
    rows = sorted(env.collect(), key=lambda r: r["__seq"])
    assert [r["__seq"] for r in rows] == [1001, 1002, 1003]  # SCN order
    assert [r["__op"] for r in rows] == ["INSERT", "UPDATE", "DELETE"]
    assert rows[1]["after"].v == "y"


# -- CLI fail-fast -----------------------------------------------------------


def test_live_modes_fail_fast(spark):
    with pytest.raises(SystemExit, match="JDBC driver"):
        list(sqlserver_streams(spark, {"hostname": "nope"}))
    with pytest.raises(SystemExit, match="hostname"):
        list(sqlserver_streams(spark, {}))
    with pytest.raises(SystemExit, match="Oracle JDBC driver"):
        list(oracle_streams(spark, {"hostname": "nope", "database": "XE"}))


def test_sqlserver_ct_file_replay_cli(spark, tmp_path):
    """`type: sqlserver` with ct-file runs the CT decode end-to-end from
    YAML (offline replay parity with mysql binlog-file)."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    ct = spark.createDataFrame(
        [
            ("A01", "01", 2, 1, "a", 1.0),
            ("A02", "01", 2, 2, "b", 2.0),
            ("B01", "01", 3, 1, "a", 1.0),
            ("B01", "01", 4, 1, "a2", 1.5),
            ("C01", "01", 1, 2, "b", 2.0),
        ],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, name string, val double",
    )
    src_path = tmp_path / "ct"
    ct.coalesce(1).write.parquet(str(src_path))
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: sqlserver
  ct-file: {src_path}
  table-id: dbo.items
  primary-key: id
sink:
  type: parquet
  path: {out}
pipeline:
  name: ct-replay
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    got = spark.read.parquet(str(out / "dbo.items"))
    state = {r.id: (r.name, r.val) for r in got.collect()}
    assert state == {1: ("a2", 1.5)}
    assert summary.tables["dbo.items"] == 1


def test_db2_cd_file_replay_cli(spark, tmp_path):
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    cd = spark.createDataFrame(
        [
            ("0001", "01", "I", 1, "x"),
            ("0002", "01", "D", 1, "x"),
            ("0002", "02", "I", 1, "x2"),
            ("0003", "01", "I", 2, "y"),
        ],
        "IBMSNAP_COMMITSEQ string, IBMSNAP_INTENTSEQ string, "
        "IBMSNAP_OPERATION string, id long, name string",
    )
    src_path = tmp_path / "cd"
    cd.coalesce(1).write.parquet(str(src_path))
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: db2
  cd-file: {src_path}
  table-id: DB2INST1.ITEMS
  primary-key: id
sink:
  type: parquet
  path: {out}
pipeline:
  name: cd-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    got = {r.id: r.name
           for r in spark.read.parquet(str(out / "DB2INST1.ITEMS")).collect()}
    assert got == {1: "x2", 2: "y"}


def test_oracle_redo_file_replay_cli(spark, tmp_path):
    import json as _json

    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    def rec(op, scn, before, after):
        return _json.dumps(
            {"op": op, "before": before, "after": after,
             "source": {"db": "ORCL", "table": "ITEMS", "scn": str(scn)}}
        )

    lines = [
        rec("c", 10, None, {"id": 1, "name": "a"}),
        rec("c", 11, None, {"id": 2, "name": "b"}),
        rec("u", 20, {"id": 1, "name": "a"}, {"id": 1, "name": "a2"}),
        rec("d", 30, {"id": 2, "name": "b"}, None),
    ]
    redo = tmp_path / "redo.jsonl"
    redo.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: oracle
  redo-file: {redo}
  table-id: ORCL.ITEMS
  primary-key: id
sink:
  type: parquet
  path: {out}
pipeline:
  name: redo-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    got = {r.id: r.name
           for r in spark.read.parquet(str(out / "ORCL.ITEMS")).collect()}
    assert got == {1: "a2"}


def test_tidb_kv_file_replay_cli(spark, tmp_path):
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml
    from flink_cdc_spark.sources.tikv_wire import encode_row_key, encode_row_v2

    enc = lambda kid, name: bytearray(encode_row_v2({1: kid, 2: name}))
    rows = [
        (10, "PUT", bytearray(encode_row_key(3, 1)), enc(1, "a"), None),
        (11, "PUT", bytearray(encode_row_key(3, 2)), enc(2, "b"), None),
        (20, "PUT", bytearray(encode_row_key(3, 1)), enc(1, "a2"), enc(1, "a")),
        (30, "DELETE", bytearray(encode_row_key(3, 2)), None, enc(2, "b")),
    ]
    kv = spark.createDataFrame(
        rows,
        "commit_ts long, op_type string, key binary, value binary, old_value binary",
    )
    src_path = tmp_path / "kv"
    kv.coalesce(1).write.parquet(str(src_path))
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: tidb
  kv-file: {src_path}
  table-id: tidb.items
  table-id-num: 3
  primary-key: id
  table-info:
    id: "1:long"
    name: "2:string"
sink:
  type: parquet
  path: {out}
pipeline:
  name: kv-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    got = {r.id: r.name
           for r in spark.read.parquet(str(out / "tidb.items")).collect()}
    assert got == {1: "a2"}


def test_vitess_vstream_file_replay_cli(spark, tmp_path):
    import json as _json

    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    def rec(op, shard, txid, before, after):
        return _json.dumps(
            {"before": before, "after": after, "op": op,
             "source": {"keyspace": "ks", "table": "t", "shard": shard,
                        "gtid": f"aaa:{txid}"}}
        )

    lines = [
        rec("c", "-80", 1, None, {"id": 1, "v": "a"}),
        rec("c", "80-", 1, None, {"id": 2, "v": "b"}),
        rec("u", "-80", 2, {"id": 1, "v": "a"}, {"id": 1, "v": "a2"}),
        rec("d", "80-", 2, {"id": 2, "v": "b"}, None),
    ]
    stream = tmp_path / "vstream.jsonl"
    stream.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: vitess
  vstream-file: {stream}
  keyspace: ks
  table-id: ks.t
  primary-key: id
  vitess.gtid: '[{{"keyspace": "ks", "shard": "-80", "gtid": "MySQL56/aaa:1"}}]'
sink:
  type: parquet
  path: {out}
pipeline:
  name: vstream-replay
  execution.runtime-mode: BATCH
"""
    )
    run_pipeline(spark, pipeline)
    got = {r.id: r.v for r in spark.read.parquet(str(out / "ks.t")).collect()}
    # shard -80 tx 1 is covered by the start VGTID -> id=1's INSERT skipped,
    # but its later UPDATE (tx 2) upserts it back; id=2 deleted
    assert got == {1: "a2"}
