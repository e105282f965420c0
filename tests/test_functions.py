"""UDF registry, model-function stubs, soft-delete converter, and the
remaining schema-change behaviors (TRY_EVOLVE / IGNORE / EXCEPTION)."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    CreateTableEvent,
    DataChangeEvent,
)
from flink_cdc_spark.core.router import TableIdRouter
from flink_cdc_spark.core.schema import Column, new_schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.functions import register_pipeline_udfs
from flink_cdc_spark.functions.model import register_models
from flink_cdc_spark.pipeline import parse_pipeline_yaml
from flink_cdc_spark.pipeline.composer import EventPipelineComposer
from flink_cdc_spark.pipeline.definition import ModelDef, UdfDef
from flink_cdc_spark.pipeline.schema_coordinator import (
    SchemaCoordinator,
    SchemaEvolveError,
)

TID = TableId.parse("db.t")


def _coordinator(behavior):
    return SchemaCoordinator(router=TableIdRouter([]), behavior=behavior)


def _schema():
    return (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("v", "INT")
        .primary_key("id")
        .build()
    )


def test_try_evolve_applies_valid_and_skips_invalid():
    c = _coordinator("TRY_EVOLVE")
    c.process_schema_change(CreateTableEvent(TID, _schema()))
    c.process_schema_change(AddColumnEvent.last(TID, Column("extra", ct.string())))
    assert "extra" in c.evolved_schema(TID).column_names
    # narrowing INT -> invalid change on a missing column is swallowed
    c.process_schema_change(AlterColumnTypeEvent(TID, (("nope", ct.int_()),)))
    assert c.evolved_schema(TID).column_names == ["id", "v", "extra"]


def test_ignore_keeps_sink_schema_frozen():
    c = _coordinator("IGNORE")
    c.process_schema_change(CreateTableEvent(TID, _schema()))
    c.process_schema_change(AddColumnEvent.last(TID, Column("extra", ct.string())))
    assert c.evolved_schema(TID).column_names == ["id", "v"]
    # upstream schema still tracked
    assert "extra" in c.original_schema(TID).column_names


def test_exception_behavior_raises():
    c = _coordinator("EXCEPTION")
    c.process_schema_change(CreateTableEvent(TID, _schema()))
    with pytest.raises(SchemaEvolveError):
        c.process_schema_change(AddColumnEvent.last(TID, Column("extra", ct.string())))


def test_udf_registry_function_and_class(spark):
    names = register_pipeline_udfs(
        spark,
        [
            UdfDef(name="format_money", classpath="tests.sample_udfs:format_money"),
            UdfDef(name="tier", classpath="tests.sample_udfs:TierClassifier"),
        ],
    )
    assert names == {"FORMAT_MONEY", "TIER"}
    row = spark.sql(
        "SELECT format_money(1234.5) AS m, tier(9000.0) AS t, tier(1.0) AS l"
    ).first()
    assert row.m == "$1,234.50"
    assert row.t == "high" and row.l == "low"


def test_udf_in_pipeline_projection(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: db.t
    projection: id, TIER(bal) AS tier
pipeline:
  schema.change.behavior: EVOLVE
  user-defined-function:
    - {name: tier, classpath: "tests.sample_udfs:TierClassifier"}
"""
    pipeline = parse_pipeline_yaml(yaml_text)
    udf_names = register_pipeline_udfs(spark, pipeline.udfs)
    schema = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("bal", "DOUBLE")
        .primary_key("id")
        .build()
    )
    events = [
        CreateTableEvent(TID, schema),
        DataChangeEvent.insert(TID, (1, 9000.0)),
        DataChangeEvent.insert(TID, (2, 10.0)),
    ]
    composer = EventPipelineComposer(spark, pipeline, udf_names=udf_names)
    result = composer.run(events)
    rows = {r.id: r.tier for r in result.tables["db.t"].collect()}
    assert rows == {1: "high", 2: "low"}


def test_soft_delete_converter(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: db.t
    projection: "id, v"
    converter-after-transform: SOFT_DELETE
pipeline: {schema.change.behavior: EVOLVE}
"""
    pipeline = parse_pipeline_yaml(yaml_text)
    events = [
        CreateTableEvent(TID, _schema()),
        DataChangeEvent.insert(TID, (1, 10)),
        DataChangeEvent.insert(TID, (2, 20)),
        DataChangeEvent.delete(TID, (1, 10)),
    ]
    result = EventPipelineComposer(spark, pipeline).run(events)
    rows = {r.id: r.v for r in result.tables["db.t"].collect()}
    # the delete became an INSERT of the before image: row 1 survives
    assert rows == {1: 10, 2: 20}


def test_model_stub_embedding_and_chat(spark):
    names = register_models(
        spark,
        [
            ModelDef(model_name="emb", class_name="OpenAIEmbeddingModel"),
            ModelDef(model_name="chat", class_name="OpenAIChatModel"),
        ],
    )
    assert names == {"EMB_GET_EMBEDDING", "CHAT_CHAT_PREDICT"}
    df = spark.createDataFrame([("hello",), ("world",), (None,)], ["txt"])
    out = df.select(
        F.expr("emb_get_embedding(txt)").alias("e"),
        F.expr("chat_chat_predict(txt)").alias("c"),
    ).collect()
    assert len(out[0].e) == 16
    assert abs(sum(v * v for v in out[0].e) - 1.0) < 1e-5  # unit norm
    assert out[0].c.startswith("[stub:")
    assert out[2].e is None and out[2].c is None
    # determinism
    again = df.select(F.expr("emb_get_embedding(txt)").alias("e")).collect()
    assert again[0].e == out[0].e


def test_model_stub_langchain_predict(spark):
    names = register_models(
        spark,
        [ModelDef(model_name="lc", class_name="OpenAILangChainModel")],
    )
    assert names == {"LC_LANGCHAIN_PREDICT"}
    df = spark.createDataFrame([("hello",), (None,)], ["txt"])
    out = df.select(F.expr("lc_langchain_predict(txt)").alias("p")).collect()
    assert out[0].p.startswith("[langchain-stub:")
    assert out[1].p is None
    # distinct from the plain chat stub for the same prompt
    register_models(spark, [ModelDef(model_name="c2", class_name="OpenAIChatModel")])
    chat = df.select(F.expr("c2_chat_predict(txt)").alias("p")).collect()
    assert chat[0].p != out[0].p


def test_zero_arg_udf_registers_and_runs(spark):
    """A 0-arg registered UDF must evaluate per row (plain UDF path — a
    scalar pandas UDF can't size its output batch with no input)."""
    from flink_cdc_spark.functions.registry import UdfRegistry

    reg = UdfRegistry(spark)
    reg.register("answer_fn", lambda: 42, "INT")
    out = spark.range(3).selectExpr("answer_fn() AS a").collect()
    assert [r.a for r in out] == [42, 42, 42]
