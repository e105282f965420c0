"""Kafka producer-record semantics: topic routing, partition strategy,
key formats, headers, include-schema
(PipelineKafkaRecordSerializationSchema / KafkaDataSinkOptions scope)."""

import json

import pytest
from pyspark.sql import functions as F

from flink_cdc_spark.sinks.kafka_sink import (
    KafkaSinkConfig,
    debezium_connect_schema,
    infer_topic,
    kafka_producer_records,
    parse_selectors_to_topic_map,
    strip_connect_schema,
)
from flink_cdc_spark.core.schema import new_schema


# -- options ----------------------------------------------------------------


def test_config_surface():
    cfg = KafkaSinkConfig.from_dict(
        {
            "partition.strategy": "hash-by-key",
            "key.format": "csv",
            "value.format": "canal-json",
            "sink.custom-header": "k1:v1, k2:v2",
            "sink.add-tableId-to-header-enabled": "true",
            "properties.bootstrap.servers": "broker:9092",
        }
    )
    assert cfg.partition_strategy == "hash-by-key"
    assert cfg.custom_headers == {"k1": "v1", "k2": "v2"}
    assert cfg.properties == {"bootstrap.servers": "broker:9092"}
    with pytest.raises(ValueError, match="partition.strategy"):
        KafkaSinkConfig.from_dict({"partition.strategy": "round-robin"})
    with pytest.raises(ValueError, match="key.format"):
        KafkaSinkConfig.from_dict({"key.format": "avro"})
    with pytest.raises(ValueError, match="only supported"):
        KafkaSinkConfig.from_dict(
            {"value.format": "canal-json",
             "debezium-json.include-schema.enabled": "true"}
        )
    with pytest.raises(ValueError, match="custom-header"):
        KafkaSinkConfig.from_dict({"sink.custom-header": "novalue"})


def test_topic_inference_order():
    # explicit topic wins
    cfg = KafkaSinkConfig.from_dict(
        {"topic": "unified", "sink.tableId-to-topic.mapping": "app.\\.*:t1"}
    )
    assert infer_topic(cfg, "app.orders") == "unified"
    # first matching mapping rule
    cfg = KafkaSinkConfig.from_dict(
        {"sink.tableId-to-topic.mapping": "app.orders:t_orders;app.\\.*:t_app"}
    )
    assert infer_topic(cfg, "app.orders") == "t_orders"
    assert infer_topic(cfg, "app.users") == "t_app"
    # fallback: table id string
    assert infer_topic(cfg, "other.t") == "other.t"
    rules = parse_selectors_to_topic_map("app.\\.*:t_app")
    assert len(rules) == 1 and rules[0][1] == "t_app"
    with pytest.raises(ValueError, match="mapping"):
        parse_selectors_to_topic_map("justone")


# -- connect schema block ---------------------------------------------------


def test_connect_schema_block():
    schema = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("name", "VARCHAR(10)")
        .physical_column("bal", "DECIMAL(12, 2)")
        .physical_column("born", "DATE")
        .physical_column("at6", "TIMESTAMP(6)")
        .physical_column("at3", "TIMESTAMP(3)")
        .primary_key("id")
        .build()
    )
    block = json.loads(debezium_connect_schema(schema))
    assert block["type"] == "struct" and not block["optional"]
    before, after = block["fields"]
    assert before["field"] == "before" and after["field"] == "after"
    by_name = {f["field"]: f for f in after["fields"]}
    assert by_name["id"]["type"] == "int64" and by_name["id"]["optional"] is False
    assert by_name["name"]["type"] == "string"
    assert by_name["bal"]["name"] == "org.apache.kafka.connect.data.Decimal"
    assert by_name["bal"]["parameters"]["scale"] == "2"
    assert by_name["born"]["name"] == "io.debezium.time.Date"
    assert by_name["at6"]["name"] == "io.debezium.time.MicroTimestamp"
    assert by_name["at3"]["name"] == "io.debezium.time.Timestamp"


# -- record assembly --------------------------------------------------------


@pytest.fixture()
def env(spark):
    from flink_cdc_spark.sources.envelope import envelope_schema
    from pyspark.sql import types as T

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    rows = [
        ("app.orders", "INSERT", None, (1, "a"), {}, 1),
        ("app.orders", "INSERT", None, (2, "b"), {}, 2),
        ("app.orders", "UPDATE", (1, "a"), (1, "a2"), {}, 3),
        ("app.orders", "DELETE", (2, "b"), None, {}, 4),
    ]
    return spark.createDataFrame(rows, envelope_schema(payload))


def test_records_all_to_zero_json_key(spark, env):
    cfg = KafkaSinkConfig.from_dict(
        {"sink.add-tableId-to-header-enabled": "true",
         "sink.custom-header": "env:prod"}
    )
    recs = kafka_producer_records(env, cfg, "app.orders", ["id"]).collect()
    assert {r["topic"] for r in recs} == {"app.orders"}
    assert {r["partition"] for r in recs} == {0}
    by_off = {r["__offset"]: r for r in recs}
    # DELETE key comes from the BEFORE image
    assert json.loads(by_off[4]["key"]) == {"TableId": "app.orders", "id": 2}
    assert json.loads(by_off[3]["key"]) == {"TableId": "app.orders", "id": 1}
    v = json.loads(by_off[3]["value"])
    assert v["op"] == "u" and v["after"]["v"] == "a2"
    h = by_off[1]["headers"]
    assert h["tableName"] == "orders" and h["schemaName"] == "app"
    assert h["env"] == "prod"


def test_records_hash_by_key_csv(spark, env):
    cfg = KafkaSinkConfig.from_dict(
        {"partition.strategy": "hash-by-key", "key.format": "csv"}
    )
    recs = kafka_producer_records(
        env, cfg, "app.orders", ["id"], num_partitions=8
    ).collect()
    by_off = {r["__offset"]: r for r in recs}
    assert by_off[1]["key"] == "app.orders,1"
    assert by_off[4]["key"] == "app.orders,2"  # delete keys by before image
    # same key -> same partition; all partitions within range
    assert by_off[1]["partition"] == by_off[3]["partition"]
    assert all(0 <= r["partition"] < 8 for r in recs)


def test_include_schema_wrap_and_strip(spark, env):
    schema = (
        new_schema()
        .physical_column("id", "BIGINT")
        .physical_column("v", "STRING")
        .build()
    )
    block = debezium_connect_schema(schema)
    cfg = KafkaSinkConfig.from_dict(
        {"debezium-json.include-schema.enabled": "true"}
    )
    recs = kafka_producer_records(
        env, cfg, "app.orders", ["id"], connect_schema_json=block
    )
    row = recs.orderBy("__offset").first()
    doc = json.loads(row["value"])
    assert set(doc.keys()) == {"schema", "payload"}
    assert doc["schema"]["fields"][0]["field"] == "before"
    assert doc["payload"]["op"] == "c"
    # strip recovers the plain payload for the consumer-side decode
    stripped = strip_connect_schema(recs).orderBy("__offset").first()
    assert json.loads(stripped["value"])["op"] == "c"
    with pytest.raises(ValueError, match="connect schema"):
        kafka_producer_records(env, cfg, "app.orders", ["id"])


def test_cli_kafka_sink_spool(spark, tmp_path):
    """`sink: kafka` spools producer records per table with topic routing
    and include-schema from the YAML surface."""
    import os

    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    spool = tmp_path / "spool"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: parquet
  path: /root/testdata/sf0.001
  tables: nation
  primary-key.nation: n_nationkey
sink:
  type: kafka
  partition.strategy: hash-by-key
  sink.tableId-to-topic.mapping: "default.\\\\.*:nations_topic"
  debezium-json.include-schema.enabled: "true"
  spool-dir: {spool}
transform:
  - source-table: default.nation
    projection: n_nationkey, n_name
    primary-keys: n_nationkey
pipeline:
  name: kafka-spool
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    out = os.path.join(str(spool), "default.nation")
    lines = [json.loads(r.value) for r in spark.read.text(out).collect()]
    assert summary.tables["default.nation"] == len(lines) == 25
    assert {l["topic"] for l in lines} == {"nations_topic"}
    doc = json.loads(lines[0]["value"])
    assert set(doc.keys()) == {"schema", "payload"}
    assert json.loads(lines[0]["key"])["TableId"] == "default.nation"
