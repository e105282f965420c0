"""Driver-contract query registry: named queries + DuckDB oracle SQL.

Each entry exercises one operator/capability from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus an equivalent ANSI-SQL string
DuckDB runs over the same parquet tables. Column names/aliases match
exactly on both sides (the driver hash-compares by sorted column name).

Float discipline: per-row arithmetic on doubles is bit-identical across
engines; aggregates go through DECIMAL so partial-aggregation order can't
change the result.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .core.schema import Schema
from .core.table_id import TableId
from .pipeline import BatchPipelineComposer, parse_pipeline_yaml
from .pipeline.composer import TableStream
from .sources.parquet_source import MutationSpec, ParquetTableSource

QUERIES: Dict[str, Callable] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _stream(spark, sf_dir, table, table_id, pk, mutations=None) -> TableStream:
    src = ParquetTableSource(spark, sf_dir)
    df = src.changelog(table, table_id, mutations)
    schema = Schema.from_spark_struct(src.snapshot(table).schema, primary_keys=pk)
    return TableStream(TableId.parse(table_id), df, schema, insert_only=mutations is None)


def run_pipeline(spark, sf_dir, yaml_text, tables, sink_table) -> DataFrame:
    """tables: list[(table, table_id, pk_tuple, mutations_or_None)]"""
    pipeline = parse_pipeline_yaml(yaml_text)
    composer = BatchPipelineComposer(spark, pipeline)
    streams = [
        _stream(spark, sf_dir, t, tid, pk, mut) for t, tid, pk, mut in tables
    ]
    result = composer.compose(streams)
    return result.tables[sink_table]


# ---------------------------------------------------------------------------
# §2.1 transform: projection + filter (PostTransformOperator analog)
# ---------------------------------------------------------------------------


@register(
    "transform_project_filter",
    """
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           c_acctbal * 2 AS doubled,
           c_mktsegment AS segment
    FROM customer
    WHERE c_acctbal > 100 AND c_mktsegment <> 'MACHINERY'
    """,
)
def transform_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    yaml_text = """
source: {type: parquet}
sink: {type: values}
transform:
  - source-table: default.customer
    projection: c_custkey, UPPER(c_name) AS uname, c_acctbal * 2 AS doubled, c_mktsegment AS segment
    filter: c_acctbal > 100 AND c_mktsegment <> 'MACHINERY'
pipeline: {execution.runtime-mode: BATCH}
"""
    return run_pipeline(
        spark, sf_dir, yaml_text,
        [("customer", "default.customer", ("c_custkey",), None)],
        "default.customer",
    )


# ---------------------------------------------------------------------------
# §2.1 changelog materialization with update/delete tail (ValuesDatabase analog)
# ---------------------------------------------------------------------------

_ORDERS_MUT = MutationSpec(
    key_column="o_orderkey",
    update_exprs={"o_totalprice": "o_totalprice + 1000", "o_orderstatus": "'U'"},
)


@register(
    "changelog_materialize",
    """
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 10) = 3 THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice,
           CASE WHEN (o_orderkey % 10) = 3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
           o_custkey
    FROM orders
    WHERE (o_orderkey % 20) <> 7
    """,
)
def changelog_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    yaml_text = """
source: {type: parquet}
sink: {type: values}
transform:
  - source-table: default.orders
    projection: o_orderkey, o_totalprice, o_orderstatus, o_custkey
pipeline: {execution.runtime-mode: BATCH}
"""
    return run_pipeline(
        spark, sf_dir, yaml_text,
        [("orders", "default.orders", ("o_orderkey",), _ORDERS_MUT)],
        "default.orders",
    )


# ---------------------------------------------------------------------------
# §2.4 filter-on-UPDATE splitting: consistent filtered changelog
# ---------------------------------------------------------------------------


@register(
    "update_split_filter",
    """
    WITH final_state AS (
      SELECT event_id,
             user_id,
             CASE WHEN (event_id % 10) = 3 THEN value * 10 ELSE value END AS value,
             event_type
      FROM events
      WHERE (event_id % 20) <> 7
    )
    SELECT event_id, user_id, value, event_type
    FROM final_state WHERE value >= 50
    """,
)
def update_split_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # updates multiply value by 10, pushing rows across the filter boundary in
    # both directions -> exercises Y/N->DELETE and N/Y->INSERT conversion
    mut = MutationSpec(key_column="event_id", update_exprs={"value": "value * 10"})
    yaml_text = """
source: {type: parquet}
sink: {type: values}
transform:
  - source-table: default.events
    projection: event_id, user_id, value, event_type
    filter: value >= 50
pipeline: {execution.runtime-mode: BATCH}
"""
    return run_pipeline(
        spark, sf_dir, yaml_text,
        [("events", "default.events", ("event_id",), mut)],
        "default.events",
    )


# ---------------------------------------------------------------------------
# §2.1 route: 1->N fan-out and N->1 merge with schema alignment
# ---------------------------------------------------------------------------


@register(
    "route_merge_tables",
    """
    SELECT r_regionkey, r_name, NULL::INTEGER AS n_nationkey, NULL::VARCHAR AS n_name, NULL::INTEGER AS n_regionkey
    FROM region
    UNION ALL
    SELECT NULL::INTEGER, NULL::VARCHAR, n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def route_merge_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    yaml_text = """
source: {type: parquet}
sink: {type: values}
route:
  - source-table: default.\\.*
    sink-table: sink.merged
pipeline: {execution.runtime-mode: BATCH}
"""
    return run_pipeline(
        spark, sf_dir, yaml_text,
        [
            ("region", "default.region", (), None),
            ("nation", "default.nation", (), None),
        ],
        "sink.merged",
    )


# ---------------------------------------------------------------------------
# §2.5 metadata columns
# ---------------------------------------------------------------------------


@register(
    "metadata_columns",
    """
    SELECT n_nationkey,
           'default' AS ns,
           'nation' AS tbl,
           '+I' AS op,
           'default' || '.' || 'nation' AS identifier
    FROM nation
    """,
)
def metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    yaml_text = """
source: {type: parquet}
sink: {type: values}
transform:
  - source-table: default.nation
    projection: "n_nationkey, __schema_name__ AS ns, __table_name__ AS tbl, __data_event_type__ AS op, __schema_name__ || '.' || __table_name__ AS identifier"
pipeline: {execution.runtime-mode: BATCH}
"""
    return run_pipeline(
        spark, sf_dir, yaml_text,
        [("nation", "default.nation", ("n_nationkey",), None)],
        "default.nation",
    )


def queries() -> Dict[str, Callable]:
    return dict(QUERIES)


def oracle_sql() -> Dict[str, str]:
    return dict(ORACLES)
