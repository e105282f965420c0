"""`source: kafka` — topic replay through RecordBatch v2 segments and the
shared debezium/canal codecs, composed through the batch pipeline.

The reference ships Kafka as a pipeline sink
(pipeline-connector-kafka/.../KafkaDataSinkFactory.java); this covers the
consumer loop over what that sink produced.
"""

import json

import pytest
from pyspark.sql import functions as F

from flink_cdc_spark.cli import main, run_pipeline
from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml
from flink_cdc_spark.sources.kafka_segment_wire import write_segment
from flink_cdc_spark.sources.kafka_source import kafka_streams


def _dbz(op, before, after, db="app", table="orders", ts=1000):
    return json.dumps(
        {"before": before, "after": after, "op": op,
         "source": {"db": db, "table": table}, "ts_ms": ts}
    )


def _write_topic(tmp_path, values):
    d = tmp_path / "topic"
    d.mkdir()
    write_segment(
        str(d / "00000000.log"),
        [[(str(i).encode(), v.encode()) for i, v in enumerate(values)]],
    )
    return d


def test_debezium_topic_replay(spark, tmp_path):
    rows = [
        _dbz("c", None, {"id": 1, "v": "a"}),
        _dbz("c", None, {"id": 2, "v": "b"}),
        _dbz("u", {"id": 1, "v": "a"}, {"id": 1, "v": "a2"}),
        _dbz("d", {"id": 2, "v": "b"}, None),
        # a second table interleaved on the same topic
        _dbz("c", None, {"k": 7, "n": 1.5}, table="items"),
    ]
    topic = _write_topic(tmp_path, rows)
    streams = {
        str(s.table_id): s
        for s in kafka_streams(
            spark,
            {"topic-dir": str(topic), "primary-key.app.orders": "id",
             "primary-key.app.items": "k"},
        )
    }
    assert set(streams) == {"app.orders", "app.items"}
    assert streams["app.orders"].schema.primary_keys == ("id",)
    ops = [
        (r["__op"], r["__seq"]) for r in
        streams["app.orders"].df.orderBy("__seq").collect()
    ]
    assert [o for o, _ in ops] == ["INSERT", "INSERT", "UPDATE", "DELETE"]


def test_kafka_source_cli_e2e(spark, tmp_path):
    """YAML in, materialized sink state out — last-image-wins per key."""
    rows = [
        _dbz("c", None, {"id": 1, "v": "a"}),
        _dbz("c", None, {"id": 2, "v": "b"}),
        _dbz("c", None, {"id": 3, "v": "c"}),
        _dbz("u", {"id": 1, "v": "a"}, {"id": 1, "v": "a2"}),
        _dbz("d", {"id": 2, "v": "b"}, None),
    ]
    topic = _write_topic(tmp_path, rows)
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: kafka
  topic-dir: {topic}
  primary-key.app.orders: id
sink:
  type: parquet
  path: {out}
pipeline:
  name: kafka-replay
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    assert summary.tables == {"app.orders": 2}
    state = {r.id: r.v for r in spark.read.parquet(str(out / "app.orders")).collect()}
    assert state == {1: "a2", 3: "c"}


def test_canal_topic_replay_picks_pk_from_records(spark, tmp_path):
    def canal(t, data, old=None, pk=("id",)):
        return json.dumps(
            {"type": t, "data": data, "old": old, "database": "app",
             "table": "orders", "pkNames": list(pk), "ts": 5}
        )

    rows = [
        canal("INSERT", [{"id": 1, "v": "a"}]),
        canal("UPDATE", [{"id": 1, "v": "a2"}], old=[{"id": 1, "v": "a"}]),
        canal("DELETE", [{"id": 9, "v": "x"}]),
    ]
    topic = _write_topic(tmp_path, rows)
    (stream,) = list(kafka_streams(spark, {"topic-dir": str(topic),
                                           "value.format": "canal-json"}))
    assert stream.schema.primary_keys == ("id",)
    ops = [r["__op"] for r in stream.df.orderBy("__seq").collect()]
    assert ops == ["INSERT", "UPDATE", "DELETE"]


def test_kafka_source_decodes_topic_once(spark, tmp_path, monkeypatch):
    """An N-table topic must run the Python segment decode ONCE per
    replay (localCheckpoint), not once per (discovery, inference, table)
    consumer — observed with an accumulator ticking per upstream
    partition evaluation, the test_batch_data_plane_scanned_once_per_batch
    pattern."""
    from flink_cdc_spark.sources import kafka_source as ks

    rows = [
        _dbz("c", None, {"id": 1, "v": "a"}),
        _dbz("u", {"id": 1, "v": "a"}, {"id": 1, "v": "a2"}),
        _dbz("c", None, {"k": 7, "n": 2}, table="items"),
        _dbz("d", {"k": 7, "n": 2}, None, table="items"),
    ]
    topic = _write_topic(tmp_path, rows)
    acc = spark.sparkContext.accumulator(0)
    real = ks.read_topic_segments

    def counted(spark_, glob):
        df = real(spark_, glob)

        def tick(batches):
            acc.add(1)
            for pdf in batches:
                yield pdf

        return df.mapInPandas(tick, schema=df.schema)

    monkeypatch.setattr(ks, "read_topic_segments", counted)
    streams = {str(s.table_id): s for s in ks.kafka_streams(
        spark,
        {"topic-dir": str(topic), "primary-key.app.orders": "id",
         "primary-key.app.items": "k"},
    )}
    evals_after_build = acc.value
    # the (eager) localCheckpoint evaluates each decode partition exactly
    # once during kafka_streams (the small-segment split redistributes
    # blobs across up to defaultParallelism partitions)
    par = spark.sparkContext.defaultParallelism
    assert 1 <= evals_after_build <= par
    # every downstream consumer reads the checkpoint, not the decode: a
    # rescan-per-table design would re-tick per consumer (discovery + 2x
    # inference + 2x decode)
    assert streams["app.orders"].df.count() == 2
    assert streams["app.items"].df.count() == 2
    assert acc.value == evals_after_build


def test_kafka_source_fails_fast(spark, tmp_path):
    with pytest.raises(SystemExit, match="topic-dir"):
        list(kafka_streams(spark, {}))
    with pytest.raises(SystemExit, match="broker"):
        list(kafka_streams(spark, {"properties.bootstrap.servers": "b:9092"}))
    with pytest.raises(SystemExit, match="value.format"):
        list(kafka_streams(spark, {"topic-dir": str(tmp_path),
                                   "value.format": "avro"}))


def test_segment_cache_registry_keyed_by_session_and_glob(spark):
    """advisor r11: the latest-wins registry must key by (applicationId,
    glob) — two sessions sharing a glob must not unpersist each other —
    and entries whose SparkContext has stopped must be evicted on the
    next registration instead of pinning dead plans forever."""
    from flink_cdc_spark.sources import kafka_source as ks

    ks._SEGMENT_CACHE.clear()
    app = spark.sparkContext.applicationId

    a1 = spark.range(3)
    out1 = ks._register_decoded_topic(spark, "/g/a/*.log", a1)
    assert (app, "/g/a/*.log") in ks._SEGMENT_CACHE
    assert out1.storageLevel.useMemory

    # second glob in the same session: both live
    b1 = ks._register_decoded_topic(spark, "/g/b/*.log", spark.range(2))
    assert len(ks._SEGMENT_CACHE) == 2

    # re-registration for the SAME (session, glob): latest wins, the
    # predecessor is unpersisted
    a2 = ks._register_decoded_topic(spark, "/g/a/*.log", spark.range(4))
    assert len(ks._SEGMENT_CACHE) == 2
    assert ks._SEGMENT_CACHE[(app, "/g/a/*.log")] is a2
    assert not out1.storageLevel.useMemory  # unpersisted
    assert b1.storageLevel.useMemory  # untouched

    # a stale entry whose context is stopped is dropped on registration
    class _DeadCtx:
        _jsc = None

    class _DeadSession:
        sparkContext = _DeadCtx()

    class _DeadDF:
        sparkSession = _DeadSession()

        def unpersist(self):
            raise AssertionError("stopped-context entries are dropped, not unpersisted")

    ks._SEGMENT_CACHE[("dead-app", "/g/a/*.log")] = _DeadDF()
    ks._register_decoded_topic(spark, "/g/c/*.log", spark.range(1))
    assert ("dead-app", "/g/a/*.log") not in ks._SEGMENT_CACHE
    for df in ks._SEGMENT_CACHE.values():
        df.unpersist()
    ks._SEGMENT_CACHE.clear()


def test_segment_cache_reregistration_of_same_plan_stays_cached(spark):
    """Repeat invocations decode the SAME glob, so the successor's
    analyzed plan equals the predecessor's — and Spark's CacheManager
    dedupes entries by plan. If the registry persisted the successor
    before unpersisting the predecessor, the unpersist would evict the
    shared entry and every downstream consumer would silently recompute
    the full decode (the +1.3s/invocation regression this pins)."""
    from flink_cdc_spark.sources import kafka_source as ks

    ks._SEGMENT_CACHE.clear()

    def decode():  # same analyzed plan each invocation
        return spark.range(100).selectExpr("id", "id * 2 AS v")

    v1 = ks._register_decoded_topic(spark, "/g/same/*.log", decode())
    v1.count()  # materialize the first cache
    v2 = ks._register_decoded_topic(spark, "/g/same/*.log", decode())
    v2.count()
    assert v2.storageLevel.useMemory, (
        "successor lost its cache entry — unpersist ran after persist "
        "on an identical plan"
    )
    v2.unpersist()
    ks._SEGMENT_CACHE.clear()
