"""Strict YAML-definition validation — the reference's rules corpus
(flink-cdc-pipeline-e2e-tests/src/test/resources/rules/{incomplete,
unexpected,malformed}.yaml) driven against the port of
YamlPipelineDefinitionParser.java:130-146,281-347,451-500: unknown keys
fail loudly with the allowed-key listing, required keys are checked per
block, list blocks must be arrays."""

import pytest

from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

_VALID = """
source: {type: values}
sink: {type: values}
"""


def _err(yaml_text):
    with pytest.raises(ValueError) as ei:
        parse_pipeline_yaml(yaml_text)
    return str(ei.value)


def test_valid_minimal_still_parses():
    p = parse_pipeline_yaml(_VALID)
    assert p.source.type == "values" and p.sink.type == "values"


def test_missing_sink():
    msg = _err("source: {type: values}\n")
    assert 'Missing required field "sink" in top-level configuration' in msg


def test_missing_source():
    msg = _err("sink: {type: values}\n")
    assert 'Missing required field "source" in top-level configuration' in msg


def test_unexpected_top_level_key():
    msg = _err(_VALID + "mapping:\n  - source: a\n    sink: b\n")
    assert "Unexpected key `mapping` in YAML top-level block." in msg
    assert "['source', 'sink', 'route', 'transform', 'pipeline']" in msg
    assert "Runtime Configurations" in msg


def test_unexpected_transform_key():
    msg = _err(
        _VALID + "transform:\n  - source-table: foo.bar\n    mapping: x\n"
    )
    assert "Unexpected key `mapping` in YAML transform block." in msg
    assert "converter-after-transform" in msg


def test_missing_transform_source_table():
    msg = _err(_VALID + "transform:\n  - projection: \\*\n")
    assert 'Missing required field "source-table" in transform configuration' in msg


def test_unexpected_route_key():
    msg = _err(
        _VALID
        + "route:\n  - source-table: foo.bar\n    sink-table: fun.baz\n"
        + "    regex-style: java\n"
    )
    assert "Unexpected key `regex-style` in YAML route block." in msg
    assert "replace-symbol" in msg


def test_missing_route_sink_table():
    msg = _err(_VALID + "route:\n  - source-table: foo.bar\n")
    assert 'Missing required field "sink-table" in route configuration' in msg


def test_unexpected_udf_key():
    msg = _err(
        _VALID
        + "pipeline:\n  user-defined-function:\n"
        + "    - name: addone\n      classpath: a.b.C\n      language: clojure\n"
    )
    assert "Unexpected key `language` in YAML UDF block." in msg
    assert "['name', 'classpath', 'options']" in msg


def test_route_must_be_array():
    msg = _err(_VALID + "route:\n  source-table: foo.bar\n  sink-table: z.y\n")
    assert "Perhaps you missed a dash prefix" in msg


def test_transform_must_be_array():
    msg = _err(_VALID + "transform:\n  source-table: foo.bar\n")
    assert "YAML transform block is expecting an array children" in msg


def test_model_must_be_array():
    msg = _err(
        _VALID
        + "pipeline:\n  model:\n    model-name: GET_EMBEDDING\n"
        + "    class-name: OpenAIEmbeddingModel\n"
    )
    assert "YAML model block is expecting an array children" in msg


def test_udf_must_be_array():
    msg = _err(
        _VALID
        + "pipeline:\n  user-defined-function:\n    name: addone\n"
        + "    classpath: a.b.C\n"
    )
    assert "YAML UDF block is expecting an array children" in msg


def test_cli_validate_prints_message_not_traceback(tmp_path, capsys):
    """`validate` on a bad definition exits 1 with the clean message (the
    CliFrontend behavior), never a traceback."""
    import pytest as _pytest

    from flink_cdc_spark.cli import main

    y = tmp_path / "bad.yaml"
    y.write_text("source: {type: values}\nsink: {type: values}\nmapping: [1]\n")
    with _pytest.raises(SystemExit) as ei:
        main(["validate", str(y)])
    assert "Unexpected key `mapping` in YAML top-level block." in str(ei.value)
