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


def test_wire_ddl_as_raw_sql(spark, tmp_path):
    """A wire DDL record may carry a raw SQL statement; it parses through
    ddl_parser and applies like the JSON encoding."""
    import json as _json

    from flink_cdc_spark.streaming.wire import write_wire_file
    from flink_cdc_spark.sources.values_source import single_split_single_table

    src = tmp_path / "src"
    src.mkdir()
    events = single_split_single_table("db.t1")
    write_wire_file(src / "b0.json", events)
    # raw-SQL DDL + one post-DDL insert encoded manually
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({
            "kind": "DDL", "table_id": "db.t1", "seq": 100,
            "ddl": "ALTER TABLE t1 ADD COLUMN col3 VARCHAR(10)",
        }) + "\n")
        f.write(_json.dumps({
            "kind": "DATA", "table_id": "db.t1", "op": "INSERT",
            "before": None, "after": _json.dumps({"col1": "9", "col2": "x", "col3": "z"}),
            "meta": {}, "seq": 101,
        }) + "\n")
    runner = StreamingPipelineRunner(
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
    )
    runner.run_available(str(src))
    rows = {r.col1: (r.col2, r.col3) for r in runner.state.read("db.t1").collect()}
    assert rows["9"] == ("x", "z")
    assert rows["1"] == ("1", None)  # pre-DDL rows null-pad


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
