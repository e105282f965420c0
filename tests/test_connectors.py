"""Connector surface: Kafka changelog JSON formats (round-trips) and the
JDBC chunk-splitting math."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_spark.sources import kafka_json
from flink_cdc_spark.sources.envelope import payload_struct
from flink_cdc_spark.sources.jdbc_snapshot import (
    ChunkRange,
    chunk_predicates,
    distribution_factor,
    plan_chunks,
    split_evenly,
    split_unevenly,
)
from flink_cdc_spark.sources.parquet_source import MutationSpec, ParquetTableSource
from tests.conftest import SF_DIR


def _changelog(spark):
    mut = MutationSpec(key_column="o_orderkey", update_exprs={"o_totalprice": "o_totalprice + 1"})
    return ParquetTableSource(spark, SF_DIR).changelog("orders", "db.orders", mut)


def _normalize(df):
    return {
        (r["__table_id"], r["__op"], tuple(r["before"]) if r["before"] else None,
         tuple(r["after"]) if r["after"] else None)
        for r in df.collect()
    }


def test_debezium_roundtrip(spark):
    env = _changelog(spark)
    payload = payload_struct(env)
    encoded = kafka_json.encode_debezium_json(env)
    assert set(encoded.columns) == {"key", "value", "__offset"}
    sample = encoded.select("value").first().value
    assert '"op"' in sample and '"source"' in sample
    decoded = kafka_json.decode_debezium_json(encoded, payload)
    assert _normalize(decoded) == _normalize(env)


def test_canal_roundtrip(spark):
    env = _changelog(spark)
    payload = payload_struct(env)
    encoded = kafka_json.encode_canal_json(env, pk_names=["o_orderkey"])
    sample = encoded.select("value").first().value
    assert '"type"' in sample and '"pkNames"' in sample
    decoded = kafka_json.decode_canal_json(encoded, payload)
    assert _normalize(decoded) == _normalize(env)


def test_debezium_op_mapping(spark):
    env = _changelog(spark)
    decoded = kafka_json.decode_debezium_json(
        kafka_json.encode_debezium_json(env), payload_struct(env)
    )
    ops = {r["__op"] for r in decoded.select("__op").distinct().collect()}
    assert ops == {"INSERT", "UPDATE", "DELETE"}


# --------------------------------------------------------------------------
# chunk splitting
# --------------------------------------------------------------------------


def test_distribution_factor():
    assert distribution_factor(1, 100, 100) == 1.0
    assert distribution_factor(1, 1000, 100) == 10.0


def test_split_evenly_dense():
    # 100k rows, dense keys 0..99999, chunk 8096 -> ceil-ish chunks
    chunks = split_evenly(0, 99_999, 100_000, 8096)
    assert chunks[0].lo is None and chunks[-1].hi is None
    # contiguous half-open coverage
    for a, b in zip(chunks, chunks[1:]):
        assert a.hi == b.lo
    assert 11 <= len(chunks) <= 14


def test_split_evenly_sparse_keys():
    # sparse: 10k rows over key space 0..999999 -> factor 100, step 8096*100
    chunks = split_evenly(0, 999_999, 10_000, 8096)
    assert len(chunks) == 2  # 10k rows is barely above one chunk
    assert chunks[0].hi == 809_600


def test_split_small_table_single_chunk():
    assert split_evenly(5, 10_000, 500, 8096) == [ChunkRange(None, None)]


def test_split_unevenly_probing():
    # keys clustered: next-chunk-max callback jumps by 2*chunk_size
    def probe(lo, size):
        return min(lo + 2 * size, 100_000)

    chunks = split_unevenly(0, 100_000, probe, 8096)
    assert chunks[0].lo is None and chunks[-1].hi is None
    assert len(chunks) > 2


def test_plan_chunks_uses_uneven_for_skew():
    called = {}

    def probe(lo, size):
        called["yes"] = True
        return min(lo + size * 5000, 10_000_000)

    # factor = 10M / 5000 = 2000 > upper bound 1000 -> uneven path
    chunks = plan_chunks(0, 9_999_999, 5000, 8096, query_next_chunk_max=probe)
    assert called.get("yes")
    assert chunks[-1].hi is None


def test_chunk_predicates_render():
    chunks = [ChunkRange(None, 10), ChunkRange(10, 20), ChunkRange(20, None)]
    preds = chunk_predicates(chunks, "id")
    assert preds == ["id <= 10", "id > 10 AND id <= 20", "id > 20"]
