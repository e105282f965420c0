"""YAML pipeline definition parser.

Port of the reference CLI parser
(flink-cdc-cli/src/main/java/org/apache/flink/cdc/cli/parser/YamlPipelineDefinitionParser.java:65-99):
top-level keys `source, sink, route, transform, pipeline`, with
`pipeline.user-defined-function` and `pipeline.model` blocks.
"""

from __future__ import annotations

from typing import Optional

import yaml

from .definition import (
    ModelDef,
    PipelineConfig,
    PipelineDef,
    RouteDef,
    SinkDef,
    SourceDef,
    TransformDef,
    UdfDef,
)


# Strict key validation (YamlPipelineDefinitionParser.java:130-146,
# 281-347, 451-500): unknown keys fail loudly instead of being silently
# ignored; required keys are checked per block; list blocks must be
# arrays. Messages mirror the reference (rules corpus
# flink-cdc-pipeline-e2e-tests/src/test/resources/rules/*.yaml).
_TOP_LEVEL_NAME = "top-level"
_BLOCK_KEYS = {
    _TOP_LEVEL_NAME: (["source", "sink"], ["route", "transform", "pipeline"]),
    "route": (["source-table", "sink-table"], ["replace-symbol", "description"]),
    "transform": (
        ["source-table"],
        [
            "projection",
            "filter",
            "primary-keys",
            "partition-keys",
            "table-options",
            "table-options.delimiter",
            "description",
            "converter-after-transform",
        ],
    ),
    "UDF": (["name", "classpath"], ["options"]),
}


def _validate_keys(context: str, block: dict) -> None:
    required, optional = _BLOCK_KEYS[context]
    valid = required + optional
    for key in block:
        if key not in valid:
            if context == _TOP_LEVEL_NAME:
                raise ValueError(
                    f"Unexpected key `{key}` in YAML top-level block.\n"
                    f"Allowed keys in this context are: {valid}\n"
                    'Note: Flink configurations should be defined in '
                    '"Runtime Configurations" instead of YAML scripts.'
                )
            raise ValueError(
                f"Unexpected key `{key}` in YAML {context} block.\n"
                f"Allowed keys in this context are: {valid}\n"
                f"Note: option {key}: {block[key]!r} is unexpected. It was "
                "silently ignored in previous versions, and probably should "
                "be removed."
            )
    for key in required:
        if key not in block:
            raise ValueError(
                f'Missing required field "{key}" in {context} configuration'
            )


def _validate_array(context: str, node) -> list:
    if node is None:
        return []
    if not isinstance(node, list):
        raise ValueError(
            f"YAML {context} block is expecting an array children, but got "
            f"{type(node).__name__} ({node!r}). Perhaps you missed a dash "
            "prefix `-`?"
        )
    return node


def _split_keys(value) -> tuple:
    if value is None:
        return ()
    if isinstance(value, (list, tuple)):
        return tuple(str(v).strip() for v in value)
    return tuple(k.strip() for k in str(value).split(",") if k.strip())


def _parse_table_options(block: dict) -> tuple:
    raw = block.get("table-options")
    if not raw:
        return ()
    delimiter = block.get("table-options.delimiter", ",")
    out = []
    for pair in str(raw).split(delimiter):
        if "=" in pair:
            k, v = pair.split("=", 1)
            out.append((k.strip(), v.strip()))
    return tuple(out)


def parse_pipeline_yaml(text: str, global_config: dict | None = None) -> PipelineDef:
    """`global_config` is the CLI ``--global-config`` defaults mapping
    (CliFrontendOptions GLOBAL_CONFIG): pipeline-block keys the YAML does
    not set fall back to it, mirroring how the reference layers
    conf/flink-cdc.yaml under each pipeline definition."""
    doc = yaml.safe_load(text)
    if global_config:
        merged = dict(global_config)
        merged.update(doc.get("pipeline") or {})
        doc = dict(doc)
        doc["pipeline"] = merged
    if not isinstance(doc, dict):
        raise ValueError("Pipeline YAML must be a mapping")
    _validate_keys(_TOP_LEVEL_NAME, doc)

    src_block = dict(doc["source"])
    source = SourceDef(
        type=src_block.pop("type"),
        name=src_block.pop("name", None),
        config=src_block,
    )

    sink_block = dict(doc["sink"])
    include = _split_keys(sink_block.pop("include.schema.changes", None))
    exclude = _split_keys(sink_block.pop("exclude.schema.changes", None))
    sink = SinkDef(
        type=sink_block.pop("type"),
        name=sink_block.pop("name", None),
        config=sink_block,
        include_schema_evolution_types=include,
        exclude_schema_evolution_types=exclude,
    )

    routes = []
    for r in _validate_array("route", doc.get("route")):
        _validate_keys("route", r)
        routes.append(
            RouteDef(
                source_table=r["source-table"],
                sink_table=r["sink-table"],
                replace_symbol=r.get("replace-symbol"),
                description=r.get("description"),
            )
        )

    transforms = []
    for t in _validate_array("transform", doc.get("transform")):
        _validate_keys("transform", t)
        transforms.append(
            TransformDef(
                source_table=t["source-table"],
                projection=t.get("projection"),
                filter=t.get("filter"),
                primary_keys=_split_keys(t.get("primary-keys")),
                partition_keys=_split_keys(t.get("partition-keys")),
                table_options=_parse_table_options(t),
                converter_after_transform=t.get("converter-after-transform"),
                description=t.get("description"),
            )
        )

    pipeline_block = dict(doc.get("pipeline") or {})
    udfs = []
    for u in _validate_array(
        "UDF", pipeline_block.pop("user-defined-function", None)
    ):
        _validate_keys("UDF", u)
        udfs.append(
            UdfDef(
                name=u["name"],
                classpath=u["classpath"],
                options=dict(u.get("options") or {}),
            )
        )
    models = [
        ModelDef(
            model_name=m["model-name"],
            class_name=m["class-name"],
            options={k: v for k, v in m.items() if k not in ("model-name", "class-name")},
        )
        for m in _validate_array("model", pipeline_block.pop("model", None))
    ]

    config = PipelineConfig(
        name=pipeline_block.pop("name", PipelineConfig.name),
        parallelism=int(pipeline_block.pop("parallelism", 1)),
        runtime_mode=str(pipeline_block.pop("execution.runtime-mode", "STREAMING")).upper(),
        schema_change_behavior=str(
            pipeline_block.pop("schema.change.behavior", "LENIENT")
        ).upper(),
        route_mode=str(pipeline_block.pop("route-mode", "ALL_MATCH")).upper().replace("-", "_"),
        local_time_zone=pipeline_block.pop("local-time-zone", "UTC"),
        sink_partitioning_strategy=str(
            pipeline_block.pop("sink.partitioning.strategy", "PRIMARY_KEY")
        ).upper(),
        extra=pipeline_block,
    )

    return PipelineDef(
        source=source,
        sink=sink,
        routes=routes,
        transforms=transforms,
        udfs=udfs,
        models=models,
        config=config,
    )
