"""Cross-micro-batch stateful dedup via applyInPandasWithState."""

import json

import pytest


def _write_batch(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_streaming_dedup_across_batches(spark, tmp_path):
    from flink_cdc_spark.streaming.stateful import streaming_exact_dedup

    src = tmp_path / "src"
    out_rows = []
    src.mkdir()
    _write_batch(src / "b0.json", [(1, "hello world"), (2, "other doc"), (3, "hello   WORLD")])

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING").json(str(src))
    )
    deduped = streaming_exact_dedup(stream)

    def sink(batch, _bid):
        out_rows.extend((r.doc_id, r.fingerprint) for r in batch.collect())

    def run_once():
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    # docs 1 and 3 normalize to the same content -> keeper is min doc_id
    ids = sorted(i for i, _ in out_rows)
    assert ids == [1, 2]

    # second batch: a repeat of doc 1's content (doc 9) and a new doc 4 —
    # state must remember fingerprints across batches/restarts
    _write_batch(src / "b1.json", [(9, "hello world"), (4, "brand new")])
    run_once()
    ids = sorted(i for i, _ in out_rows)
    assert ids == [1, 2, 4]
