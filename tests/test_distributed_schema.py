"""Distributed (parallel-metadata) schema reduction through the live
streaming runner — reference scope:
runtime/operators/schema/distributed/SchemaOperator+SchemaCoordinator.
"""

import json

from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml
from flink_cdc_spark.streaming import StreamingPipelineRunner


def _write(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _data(seq, payload, table="db.t"):
    return {
        "kind": "DATA", "table_id": table, "op": "INSERT",
        "before": None, "after": json.dumps(payload), "meta": {}, "seq": seq,
    }


def _runner(spark, tmp_path):
    return StreamingPipelineRunner(
        spark,
        parse_pipeline_yaml(
            """
source: {type: wire}
sink: {type: lake}
pipeline: {schema.change.behavior: EVOLVE}
"""
        ),
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        parallel_metadata=True,
        primary_keys={"db.t": ["id"]},
    )


def test_divergent_partitions_reduce_to_least_common_schema(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files = two partitions, different key sets, no DDL anywhere
    _write(src / "p0.json", [_data(1, {"id": 1, "a": "x"}),
                             _data(2, {"id": 2, "a": "y"})])
    _write(src / "p1.json", [_data(3, {"id": 3, "a": "z", "b": 5})])
    runner = _runner(spark, tmp_path)
    runner.run_available(str(src))
    rows = {r.id: (r.a, r.b) for r in runner.state.read("db.t").collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 5)}
    # the coordinator holds the reduced schema with the configured pk
    from flink_cdc_spark.core.table_id import TableId

    s = runner.coordinator.evolved_schema(TableId.parse("db.t"))
    assert s.primary_keys == ("id",)
    assert {c.name for c in s.columns} == {"id", "a", "b"}


def test_later_batch_widens_schema_via_difference(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [_data(1, {"id": 1, "a": "x"})])
    runner = _runner(spark, tmp_path)
    runner.run_available(str(src))
    assert set(runner.state.read("db.t").columns) == {"id", "a"}
    # second batch introduces a new column and an int->float widening
    _write(src / "b1.json", [_data(2, {"id": 2, "a": "y", "score": 1.5})])
    runner.run_available(str(src))
    rows = {r.id: (r.a, r.score) for r in runner.state.read("db.t").collect()}
    assert rows == {1: ("x", None), 2: ("y", 1.5)}
