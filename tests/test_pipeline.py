"""End-to-end pipeline tests: YAML -> composer -> materialized tables,
checked against DuckDB on the driver-provided parquet (FIXTURES.md F4)."""

import duckdb
import pytest

from flink_cdc_spark.core.schema import Schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.pipeline import BatchPipelineComposer, parse_pipeline_yaml
from flink_cdc_spark.pipeline.composer import TableStream
from flink_cdc_spark.sources.parquet_source import MutationSpec, ParquetTableSource

from conftest import SF_DIR

YAML = """
source:
  type: parquet
  sf-dir: {sf}
  tables: default.customer

transform:
  - source-table: default.customer
    projection: c_custkey, UPPER(c_name) AS uname, c_acctbal * 2 AS doubled
    filter: c_acctbal > 0

sink:
  type: values

pipeline:
  name: test pipeline
  execution.runtime-mode: BATCH
"""


def duck(sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return con.sql(sql).fetchall()


def _stream(spark, table, table_id, pk, mutations=None):
    src = ParquetTableSource(spark, SF_DIR)
    df = src.changelog(table, table_id, mutations)
    snap = src.snapshot(table)
    schema = Schema.from_spark_struct(snap.schema, primary_keys=pk)
    return TableStream(TableId.parse(table_id), df, schema, insert_only=mutations is None)


def test_yaml_parse_roundtrip():
    p = parse_pipeline_yaml(YAML.format(sf=SF_DIR))
    assert p.source.type == "parquet"
    assert p.transforms[0].projection.startswith("c_custkey")
    assert p.config.runtime_mode == "BATCH"


def test_e2e_projection_filter_vs_duckdb(spark):
    p = parse_pipeline_yaml(YAML.format(sf=SF_DIR))
    composer = BatchPipelineComposer(spark, p)
    result = composer.compose([_stream(spark, "customer", "default.customer", ("c_custkey",))])
    out = result.tables["default.customer"]
    got = sorted((r.c_custkey, r.uname, r.doubled) for r in out.collect())
    want = sorted(
        duck(
            "SELECT c_custkey, UPPER(c_name), c_acctbal * 2 FROM customer WHERE c_acctbal > 0"
        )
    )
    assert len(got) == len(want) and got[0][0] == want[0][0]
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and abs(g[2] - w[2]) < 1e-9


def test_e2e_mutations_vs_duckdb(spark):
    spec = MutationSpec(
        key_column="o_orderkey",
        update_exprs={"o_totalprice": "o_totalprice + 1000"},
    )
    stream = _stream(spark, "orders", "default.orders", ("o_orderkey",), mutations=spec)
    yaml_text = """
source: {type: parquet}
sink: {type: values}
pipeline: {execution.runtime-mode: BATCH}
"""
    p = parse_pipeline_yaml(yaml_text)
    composer = BatchPipelineComposer(spark, p)
    result = composer.compose([stream])
    out = result.tables["default.orders"]
    got = {r.o_orderkey: r.o_totalprice for r in out.collect()}
    want = {
        r[0]: r[1]
        for r in duck(spec.oracle_final_state_sql("orders", ["o_orderkey", "o_totalprice"]))
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_e2e_route_fanout_and_merge(spark):
    yaml_text = """
source: {type: parquet}
sink: {type: values}
route:
  - source-table: default.customer
    sink-table: sink.replica_a
  - source-table: default.\\.*
    sink-table: sink.all_merged
pipeline: {execution.runtime-mode: BATCH}
"""
    p = parse_pipeline_yaml(yaml_text)
    composer = BatchPipelineComposer(spark, p)
    streams = [
        _stream(spark, "customer", "default.customer", ("c_custkey",)),
    ]
    result = composer.compose(streams)
    assert set(result.tables) == {"sink.replica_a", "sink.all_merged"}
    n = result.tables["sink.replica_a"].count()
    assert n == result.tables["sink.all_merged"].count()
    assert n == duck("SELECT count(*) FROM customer")[0][0]


def test_e2e_n_to_1_merge_schema_align(spark):
    # merge two differently-shaped tables into one sink table
    yaml_text = """
source: {type: parquet}
sink: {type: values}
route:
  - source-table: default.\\.*
    sink-table: sink.merged
pipeline: {execution.runtime-mode: BATCH}
"""
    p = parse_pipeline_yaml(yaml_text)
    composer = BatchPipelineComposer(spark, p)
    streams = [
        _stream(spark, "region", "default.region", ()),
        _stream(spark, "nation", "default.nation", ()),
    ]
    result = composer.compose(streams)
    merged = result.tables["sink.merged"]
    cols = set(merged.columns)
    assert {"r_regionkey", "r_name", "n_nationkey", "n_name", "n_regionkey"} <= cols
    assert merged.count() == 30  # 5 regions + 25 nations


def test_distributed_schema_reduction(spark):
    """Parallel-metadata-source reduction: partitions report different
    payload shapes; the driver folds them to one least-common schema
    (distributed SchemaOperator analog)."""
    from flink_cdc_spark.pipeline.distributed import (
        discover_json_payload_schemas,
        merged_schema_for_table,
        reduce_partition_schemas,
    )
    from flink_cdc_spark.core.schema import new_schema

    # two partitions with heterogeneous JSON payloads for the same table
    p0 = [('{"id": 1, "name": "a"}',)] * 5
    p1 = [('{"id": 2, "score": 1.5}',)] * 5
    df = spark.createDataFrame(p0, "after STRING").repartition(1).unionAll(
        spark.createDataFrame(p1, "after STRING").repartition(1)
    )
    ddls = discover_json_payload_schemas(df)
    assert len(ddls) >= 1
    merged = merged_schema_for_table("db.t", ddls)
    names = set(merged.column_names)
    assert {"id", "name", "score"} <= names

    s1 = new_schema().physical_column("id", "INT").physical_column("v", "INT").build()
    s2 = new_schema().physical_column("id", "BIGINT").physical_column("w", "STRING").build()
    red = reduce_partition_schemas([s1, s2])
    assert red.column_names == ["id", "v", "w"]
    assert str(red.get_column("id").type) == "BIGINT"


def test_canned_suites_through_pipeline(spark):
    """The reference's canned values-source suites replayed through the
    composer (FlinkPipelineComposerITCase shape)."""
    from flink_cdc_spark.pipeline.composer import EventPipelineComposer
    from flink_cdc_spark.sources.values_source import (
        multi_splits_single_table,
        single_split_multi_tables,
        single_split_single_table,
        suite_with_schema_evolution,
    )

    def run(events, behavior="EVOLVE"):
        yaml_text = f"""
source: {{type: values}}
sink: {{type: values}}
pipeline: {{execution.runtime-mode: BATCH, schema.change.behavior: {behavior}}}
"""
        return EventPipelineComposer(spark, parse_pipeline_yaml(yaml_text)).run(events)

    r = run(single_split_single_table())
    rows = {t.col1: t.col2 for t in r.tables["default.default.table1"].collect()}
    assert rows == {"1": "1", "2": "x"}

    r = run(single_split_multi_tables())
    assert r.tables["default.default.table1"].count() == 3
    assert r.tables["default.default.table2"].count() == 3

    r = run(multi_splits_single_table())
    assert r.tables["default.default.table1"].count() == 6

    r = run(suite_with_schema_evolution())
    t = r.tables["default.default.table1"]
    assert set(t.columns) == {"col1", "newCol2", "col3"}
    rows = {x.col1: (x.newCol2, x.col3) for x in t.collect()}
    assert rows["3"] == ("3", "c3b")
    assert rows["1"] == ("1", None)
