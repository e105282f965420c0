"""Elasticsearch sink surface (sinks/elasticsearch_sink.py):
ElasticsearchEventSerializer conventions over the bulk wire format."""

import json

from flink_cdc_spark.sinks.elasticsearch_sink import decode_es_bulk, encode_es_bulk
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE


def _env(spark):
    from pyspark.sql import types as T

    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("region", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("__table_id", T.StringType()),
            T.StructField("__op", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("__meta", T.MapType(T.StringType(), T.StringType())),
            T.StructField("__seq", T.LongType()),
        ]
    )
    rows = [
        ("db.t", OP_INSERT, None, (1, "eu", 1.0), {}, 1),
        ("db.t", OP_UPDATE, (1, "eu", 1.0), (1, "us", 2.0), {}, 2),
        ("db.t", OP_DELETE, (2, "eu", 9.0), None, {}, 3),
    ]
    return spark.createDataFrame(rows, schema), payload


def test_bulk_entry_shapes_and_id(spark):
    env, _ = _env(spark)
    entries = {r["__seq"]: r["bulk"] for r in encode_es_bulk(env, ["id"]).collect()}
    action, doc = entries[1].split("\n")
    assert json.loads(action) == {"index": {"_index": "db.t", "_id": "1"}}
    assert json.loads(doc) == {"id": 1, "region": "eu", "v": 1.0}
    # delete: single action line, id from the before image
    assert json.loads(entries[3]) == {"delete": {"_index": "db.t", "_id": "2"}}


def test_composite_pk_id_joined_with_underscore(spark):
    env, _ = _env(spark)
    entries = encode_es_bulk(env, ["id", "region"]).collect()
    first = [r["bulk"] for r in entries if r["__seq"] == 1][0]
    assert json.loads(first.split("\n")[0])["index"]["_id"] == "1_eu"


def test_sharding_suffix_from_key(spark):
    env, _ = _env(spark)
    entries = {r["__seq"]: r["bulk"] for r in
               encode_es_bulk(env, ["id"], sharding_key="region").collect()}
    assert json.loads(entries[1].split("\n")[0])["index"]["_index"] == "db.t_eu"
    # deletes target the unsharded index (no after image to shard by)
    assert json.loads(entries[3])["delete"]["_index"] == "db.t"


def test_roundtrip_materializes_index_state(spark):
    from flink_cdc_spark.sinks.materialize import materialize_changelog

    env, payload = _env(spark)
    decoded = decode_es_bulk(encode_es_bulk(env, ["id"]), payload, table_id="db.t")
    state = {r.id: (r.region, r.v) for r in
             materialize_changelog(decoded, ["id"]).collect()}
    assert state == {1: ("us", 2.0)}  # updated doc kept, id=2 deleted


def test_sharded_decode_strips_suffix_but_not_on_deletes(spark):
    """A table id that itself contains the sharding separator must decode
    verbatim for delete entries (the encoder never shards deletes), while
    sharded index entries get exactly the shard suffix stripped."""
    from pyspark.sql import types as T

    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("region", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("__table_id", T.StringType()),
            T.StructField("__op", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("__meta", T.MapType(T.StringType(), T.StringType())),
            T.StructField("__seq", T.LongType()),
        ]
    )
    rows = [
        ("db.order_items", OP_INSERT, None, (1, "eu"), {}, 1),
        ("db.order_items", OP_DELETE, (2, "us"), None, {}, 2),
    ]
    env = spark.createDataFrame(rows, schema)
    encoded = encode_es_bulk(env, ["id"], sharding_key="region")
    decoded = decode_es_bulk(encoded, payload, sharding_separator="_")
    tids = {r["__seq"]: r["__table_id"] for r in decoded.collect()}
    # index entry was sharded to db.order_items_eu -> suffix stripped back
    assert tids[1] == "db.order_items"
    # delete entry was never sharded -> must NOT lose its _items suffix
    assert tids[2] == "db.order_items"
