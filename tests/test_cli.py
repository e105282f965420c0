"""CLI end-to-end: python -m flink_cdc_spark run pipeline.yaml.

Coverage intent mirrors the reference CLI tests
(flink-cdc-cli/src/test/java/org/apache/flink/cdc/cli/CliFrontendTest.java):
YAML in, executed pipeline out, sink state asserted.
"""

import json
import os

import pytest

from flink_cdc_spark.cli import main, run_pipeline
from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

SF_DIR = "/root/testdata/sf0.001"


def test_cli_validate(tmp_path, capsys):
    y = tmp_path / "p.yaml"
    y.write_text(
        """
source:
  type: values
  suite: single-split-single-table
sink:
  type: values
pipeline:
  name: v-test
  execution.runtime-mode: BATCH
"""
    )
    assert main(["validate", str(y)]) == 0
    out = capsys.readouterr().out
    assert "v-test" in out and "values" in out


def test_cli_run_values_suite(tmp_path, capsys, spark):
    y = tmp_path / "p.yaml"
    y.write_text(
        """
source:
  type: values
  suite: single-split-single-table
sink:
  type: values
pipeline:
  name: values-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # suite: 3 inserts, 1 update, 1 delete -> 2 live rows
    assert out["tables"] == {"default.default.table1": 2}


def test_cli_run_parquet_transform_route(tmp_path, spark):
    """parquet source -> projection+filter transform -> route -> parquet sink."""
    out_dir = tmp_path / "out"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: parquet
  path: {out_dir}
transform:
  - source-table: default.nation
    projection: n_nationkey, n_name, UPPER(n_name) AS upper_name
    filter: n_regionkey > 1
route:
  - source-table: default.nation
    sink-table: sinkdb.nations
pipeline:
  name: parquet-e2e
  execution.runtime-mode: BATCH
"""
    )
    with open(y) as f:
        pipeline = parse_pipeline_yaml(f.read())
    summary = run_pipeline(spark, pipeline)
    assert set(summary.tables) == {"sinkdb.nations"}
    written = spark.read.parquet(str(out_dir / "sinkdb.nations"))
    assert written.columns == ["n_nationkey", "n_name", "upper_name"]
    rows = {r.n_nationkey: r for r in written.collect()}
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    expected = {r.n_nationkey for r in src if r.n_regionkey > 1}
    assert set(rows) == expected
    for r in rows.values():
        assert r.upper_name == r.n_name.upper()


def test_cli_unknown_source_type(tmp_path, spark):
    y = tmp_path / "p.yaml"
    y.write_text(
        """
source:
  type: nope
sink:
  type: values
"""
    )
    with open(y) as f:
        pipeline = parse_pipeline_yaml(f.read())
    with pytest.raises(SystemExit):
        run_pipeline(spark, pipeline)


def test_oceanbase_sink_option_surface(tmp_path, spark):
    """sink type: oceanbase — MySQL-dialect factory options validate and
    route onto the JDBC warehouse sink (OceanBaseDataSinkFactory scope)."""
    import pytest as _pytest

    from flink_cdc_spark.sinks.oceanbase_sink import (
        validate_oceanbase_options,
    )
    from flink_cdc_spark.sources.jdbc_live import derby_url

    # required options enforced
    with _pytest.raises(ValueError, match="requires option"):
        validate_oceanbase_options({"url": "jdbc:mysql://ob:2881/db"})
    # unknown options rejected (factory required/optionalOptions contract)
    with _pytest.raises(ValueError, match="unsupported option"):
        validate_oceanbase_options(
            {"url": "u", "username": "a", "password": "b", "bogus": "1"}
        )
    ob = validate_oceanbase_options(
        {
            "url": "jdbc:mysql://ob:2881/db",
            "username": "root",
            "password": "pw",
            "memstore-check.threshold": "0.8",
            "partition.enabled": "true",
            "buffer-flush.buffer-size": "500",
        }
    )
    assert ob.memstore_check_threshold == 0.8
    assert ob.partition_enabled is True
    assert ob.buffer_size == 500
    assert ob.driver_class_name == "com.mysql.cj.jdbc.Driver"

    # end-to-end: YAML with type: oceanbase runs through the warehouse sink
    url = derby_url(str(tmp_path / "obdb"))
    y = tmp_path / "ob.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: oceanbase
  url: {url}
  username: root
  password: pw
  sync-write: true
pipeline:
  name: ob-e2e
  execution.runtime-mode: BATCH
"""
    )
    with open(y) as f:
        pipeline = parse_pipeline_yaml(f.read())
    summary = run_pipeline(spark, pipeline)
    assert summary.tables["default.region"] == 5


def test_doris_sink_spools_stream_load_bodies(tmp_path, spark):
    """sink type: doris — factory options validate; the stream-load JSON
    bodies (delete-sign rows) land in spool-dir, one line per event."""
    spool = tmp_path / "doris_spool"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: doris
  fenodes: "fe:8030"
  username: root
  sink.label-prefix: cdc
  spool-dir: {spool}
pipeline:
  name: doris-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    lines = [
        json.loads(l)
        for l in spark.read.text(str(spool / "default.nation"))
        .toPandas()["value"]
    ]
    assert len(lines) == 25
    assert all(l["__DORIS_DELETE_SIGN__"] == "0" for l in lines)
    assert {l["n_nationkey"] for l in lines} == set(range(25))


def test_doris_sink_rejects_bad_options(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: doris
  username: root
pipeline:
  name: doris-bad
  execution.runtime-mode: BATCH
"""
    )
    with pytest.raises(SystemExit, match="missing required"):
        main(["run", str(y)])


def test_starrocks_sink_spools_stream_load_bodies(tmp_path, spark):
    """sink type: starrocks — __op rows spooled per table."""
    spool = tmp_path / "sr_spool"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: starrocks
  jdbc-url: "jdbc:mysql://fe:9030"
  load-url: "fe:8080"
  username: root
  password: ""
  spool-dir: {spool}
pipeline:
  name: sr-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    lines = [
        json.loads(l)
        for l in spark.read.text(str(spool / "default.region"))
        .toPandas()["value"]
    ]
    assert len(lines) == 5
    assert all(l["__op"] == 0 for l in lines)


def test_hudi_sink_writes_table_layout(tmp_path, spark):
    """sink type: hudi — option surface validates; the changelog lands in
    a Hudi-style table (timeline + bucketed file groups) and reads back."""
    path = tmp_path / "hudi_out"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: hudi
  path: {path}
  table.type: MERGE_ON_READ
pipeline:
  name: hudi-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    assert os.path.isdir(path / "default.nation" / ".hoodie")
    from flink_cdc_spark.sinks.hudi_sink import HudiTableStore

    st = HudiTableStore(spark, str(path))
    assert st.read("default.nation").count() == 25
    assert st.timeline("default.nation")[0]["action"] == "deltacommit"


def test_iceberg_sink_writes_table_format(tmp_path, spark):
    """sink type: iceberg — hadoop-catalog warehouse layout with versioned
    metadata and a snapshot, readable back through the store."""
    wh = tmp_path / "warehouse"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: iceberg
  catalog.properties.warehouse: {wh}
  table.properties.write.format.default: parquet
  table.properties.commit.retry.num-retries: "3"
pipeline:
  name: iceberg-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    from flink_cdc_spark.sinks.iceberg_store import IcebergTableStore

    st = IcebergTableStore(spark, str(wh))
    assert st.read("default.region").count() == 5
    assert len(st.snapshots("default.region")) == 1
    assert os.path.isdir(wh / "default.region" / "metadata")
    # table.properties. prefix persisted verbatim in the v2 metadata
    meta = st._load("default.region")
    assert meta["properties"] == {
        "write.format.default": "parquet",
        "commit.retry.num-retries": "3",
    }


def test_global_config_layers_under_pipeline(tmp_path, spark):
    """--global-config defaults (CliFrontendOptions GLOBAL_CONFIG): keys
    the pipeline block does not set fall back to the global file; keys it
    sets win."""
    from flink_cdc_spark.cli import main

    gc = tmp_path / "flink-cdc.yaml"
    gc.write_text(
        "pipeline:\n"
        "  parallelism: 7\n"
        "  name: global-name\n"
    )
    y = tmp_path / "p.yaml"
    out = tmp_path / "out"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: parquet
  path: {out}
pipeline:
  name: local-name
  execution.runtime-mode: BATCH
"""
    )
    rc = main(["run", str(y), "--global-config", str(gc), "--json",
               "-D", "spark.sql.shuffle.partitions=4"])
    assert rc == 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    p = parse_pipeline_yaml(y.read_text(), global_config={"parallelism": 7,
                                                          "name": "global-name"})
    assert p.config.parallelism == 7      # filled from global config
    assert p.config.name == "local-name"  # pipeline block wins


def test_cli_rejects_bad_define(tmp_path):
    from flink_cdc_spark.cli import main

    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
sink:
  type: values
pipeline:
  execution.runtime-mode: BATCH
"""
    )
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="key=value"):
        main(["run", str(y), "-D", "nonsense"])


def test_paimon_sink_writes_lsm_table(tmp_path, spark):
    """sink type: paimon — PaimonDataSinkFactory option surface
    (PaimonDataSinkOptions.java keys) drives the LSM merge-on-read store,
    including a per-table partition.key."""
    wh = tmp_path / "paimon_wh"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: paimon
  catalog.properties.metastore: filesystem
  catalog.properties.warehouse: {wh}
  commit.user-prefix: tester
  partition.key: "default.nation:n_regionkey"
  table.properties.bucket: "4"
pipeline:
  name: paimon-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    from flink_cdc_spark.sinks.lsm_store import LsmStateStore

    st = LsmStateStore(spark, str(wh))
    merged = st.read("default.nation")
    assert merged.count() == 25
    # partition.key materialized hive-style partition dirs
    table_dir = wh / "default.nation"
    assert any("n_regionkey=" in str(p) for p in table_dir.rglob("*") if p.is_dir())


def test_paimon_sink_rejects_bad_options(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: paimon
  catalog.properties.warehouse: /tmp/w
pipeline:
  name: paimon-bad
  execution.runtime-mode: BATCH
"""
    )
    with pytest.raises(SystemExit, match="metastore"):
        main(["run", str(y)])


def test_elasticsearch_sink_spools_bulk_bodies(tmp_path, spark):
    """sink type: elasticsearch — factory options validate; the exact
    _bulk NDJSON entries land in spool-dir."""
    spool = tmp_path / "es_spool"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: elasticsearch
  hosts: "http://localhost:9200"
  version: 7
  spool-dir: {spool}
pipeline:
  name: es-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    lines = (
        spark.read.text(str(spool / "default.region")).toPandas()["value"].tolist()
    )
    # each index op is an action line + a document line of _bulk NDJSON
    assert len(lines) == 10
    actions = [json.loads(l) for l in lines[0::2]]
    docs = [json.loads(l) for l in lines[1::2]]
    assert all(a["index"]["_index"] == "default.region" for a in actions)
    assert {a["index"]["_id"] for a in actions} == {str(i) for i in range(5)}
    assert {d["r_regionkey"] for d in docs} == set(range(5))


def test_elasticsearch_sink_rejects_unknown_option(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: elasticsearch
  hosts: "http://localhost:9200"
  version: 7
  bogus-option: nope
  spool-dir: {tmp_path / "s"}
pipeline:
  name: es-bad
  execution.runtime-mode: BATCH
"""
    )
    with pytest.raises(SystemExit, match="bogus-option"):
        main(["run", str(y)])


def test_fluss_sink_spools_bucketed_log(tmp_path, spark):
    """sink type: fluss — bootstrap.servers required; per-table bucket.key
    and bucket.num (FlussConfigUtils formats) shape the spooled records."""
    spool = tmp_path / "fluss_spool"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: fluss
  bootstrap.servers: "coordinator:9123"
  bucket.key: "default.nation:n_nationkey"
  bucket.num: "default.nation:5"
  properties.table.table.log.ttl: 7d
  spool-dir: {spool}
pipeline:
  name: fluss-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    recs = [
        json.loads(l)
        for l in spark.read.text(str(spool / "default.nation")).toPandas()["value"]
    ]
    assert len(recs) == 25
    assert all(r["op"] == "UPSERT" for r in recs)
    assert all(0 <= r["bucket"] < 5 for r in recs)
    assert len({r["bucket"] for r in recs}) > 1  # actually spread
    assert all(r["table_path"] == "default.nation" for r in recs)


def test_fluss_sink_rejects_malformed_bucket_key(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: fluss
  bootstrap.servers: "coordinator:9123"
  bucket.key: "no-colon-here"
  spool-dir: {tmp_path / "s"}
pipeline:
  name: fluss-bad
  execution.runtime-mode: BATCH
"""
    )
    with pytest.raises(SystemExit, match="Invalid bucket key"):
        main(["run", str(y)])


def test_maxcompute_sink_spools_tunnel_records(tmp_path, spark):
    """sink type: maxcompute — account options validate; tunnel-session
    records spool with buckets-num-bounded bucket assignment."""
    spool = tmp_path / "mc_spool"
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: maxcompute
  access-id: ak
  access-key: sk
  endpoint: "http://service.odps"
  project: test_project
  buckets-num: 4
  spool-dir: {spool}
pipeline:
  name: mc-e2e
  execution.runtime-mode: BATCH
"""
    )
    assert main(["run", str(y), "--json"]) == 0
    recs = [
        json.loads(l)
        for l in spark.read.text(str(spool / "default.region")).toPandas()["value"]
    ]
    assert len(recs) == 5
    assert all(r["op"] == "UPSERT" for r in recs)
    assert all(0 <= r["bucket"] < 4 for r in recs)
    assert all(r["session_id"] == "default.region/__default__" for r in recs)


def test_maxcompute_sink_rejects_missing_account(tmp_path):
    y = tmp_path / "p.yaml"
    y.write_text(
        f"""
source:
  type: parquet
  path: {SF_DIR}
  tables: region
  primary-key.region: r_regionkey
sink:
  type: maxcompute
  project: test_project
  spool-dir: {tmp_path / "s"}
pipeline:
  name: mc-bad
  execution.runtime-mode: BATCH
"""
    )
    with pytest.raises(SystemExit, match="missing required"):
        main(["run", str(y)])
