"""Kafka RecordBatch v2 segment format (sources/kafka_segment_wire.py):
varint/zigzag framing, CRC-32C verification, segment-parallel reads, and
composition with the debezium-json codec."""

import pytest

from flink_cdc_spark.sources.kafka_segment_wire import (
    encode_batch,
    parse_segment_bytes,
    read_topic_segments,
    read_varint,
    write_segment,
    write_varint,
)


def test_varint_zigzag_roundtrip():
    for n in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -(2**31), 10**12):
        data = write_varint(n)
        got, off = read_varint(data, 0)
        assert got == n and off == len(data)


def test_batch_roundtrip_and_crc():
    records = [(b"k1", b"v1"), (None, b"v2"), (b"k3", None)]
    blob = encode_batch(7, records)
    got = list(parse_segment_bytes(blob))
    assert got == [(7, b"k1", b"v1"), (8, None, b"v2"), (9, b"k3", None)]
    # flip one payload byte -> CRC must catch it
    corrupted = bytearray(blob)
    corrupted[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(parse_segment_bytes(bytes(corrupted)))


def test_multi_batch_segment_offsets(tmp_path):
    path = tmp_path / "00000000000000000000.log"
    nxt = write_segment(
        str(path),
        [[(b"a", b"1"), (b"b", b"2")], [(b"c", b"3")]],
        base_offset=100,
    )
    assert nxt == 103
    got = list(parse_segment_bytes(path.read_bytes()))
    assert [o for o, _, _ in got] == [100, 101, 102]


def test_segment_read_feeds_debezium_decode(spark, tmp_path):
    """Real segment files -> executor-side batch parse -> debezium-json
    decode -> materialized state: the full Kafka-source path over the
    broker's actual storage format."""
    import json

    from flink_cdc_spark.sinks.materialize import materialize_changelog
    from flink_cdc_spark.sources.kafka_json import decode_debezium_json
    from pyspark.sql import types as T

    def dbz(op, before, after):
        return json.dumps(
            {"before": before, "after": after, "op": op,
             "source": {"db": "db", "table": "t"}, "ts_ms": 0}
        ).encode()

    seg1 = [
        (b"1", dbz("c", None, {"id": 1, "v": "a"})),
        (b"2", dbz("c", None, {"id": 2, "v": "b"})),
    ]
    seg2 = [
        (b"1", dbz("u", {"id": 1, "v": "a"}, {"id": 1, "v": "z"})),
        (b"2", dbz("d", {"id": 2, "v": "b"}, None)),
    ]
    nxt = write_segment(str(tmp_path / "00000000000000000000.log"), [seg1])
    write_segment(str(tmp_path / "00000000000000000002.log"), [seg2],
                  base_offset=nxt)

    records = read_topic_segments(spark, str(tmp_path / "*.log"))
    plan = records._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    env = decode_debezium_json(
        records.selectExpr("value", "offset AS __offset"), payload
    )
    state = {r.id: r.v for r in materialize_changelog(env, ["id"]).collect()}
    assert state == {1: "z"}
