"""Pipeline definition dataclasses — the declarative IR.

Port of the reference's PipelineDef family
(flink-cdc-composer/src/main/java/org/apache/flink/cdc/composer/definition/:
PipelineDef, SourceDef, SinkDef, RouteDef, TransformDef, UdfDef, ModelDef)
and the config surface (common/pipeline/PipelineOptions.java:37-140).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class SourceDef:
    type: str  # connector identifier ("values", "parquet", "jdbc", "kafka-json", ...)
    name: Optional[str] = None
    config: dict = field(default_factory=dict)


@dataclass
class SinkDef:
    type: str  # "values" (materializing), "parquet", "kafka-json", "memory"
    name: Optional[str] = None
    config: dict = field(default_factory=dict)
    # schema-evolution event-type include/exclude (SinkDef.getIncludedSchemaEvolutionTypes)
    include_schema_evolution_types: tuple = ()
    exclude_schema_evolution_types: tuple = ()


@dataclass
class RouteDef:
    source_table: str
    sink_table: str
    replace_symbol: Optional[str] = None
    description: Optional[str] = None


@dataclass
class TransformDef:
    source_table: str
    projection: Optional[str] = None
    filter: Optional[str] = None
    primary_keys: tuple = ()
    partition_keys: tuple = ()
    table_options: tuple = ()
    converter_after_transform: Optional[str] = None
    description: Optional[str] = None


@dataclass
class UdfDef:
    name: str
    # Python callable path "pkg.module:func" (the Spark analog of classpath)
    classpath: str
    options: dict = field(default_factory=dict)


@dataclass
class ModelDef:
    model_name: str
    class_name: str
    options: dict = field(default_factory=dict)


@dataclass
class PipelineConfig:
    """pipeline: block (PipelineOptions.java:37-140)."""

    name: str = "Flink CDC on Spark Pipeline"
    parallelism: int = 1
    runtime_mode: str = "STREAMING"  # STREAMING | BATCH
    schema_change_behavior: str = "LENIENT"  # IGNORE|LENIENT|TRY_EVOLVE|EVOLVE|EXCEPTION
    route_mode: str = "ALL_MATCH"  # ALL_MATCH | FIRST_MATCH
    local_time_zone: str = "UTC"
    sink_partitioning_strategy: str = "PRIMARY_KEY"  # PRIMARY_KEY|TABLE_ID|SINK_DEFINED
    extra: dict = field(default_factory=dict)


@dataclass
class PipelineDef:
    source: SourceDef
    sink: SinkDef
    routes: list = field(default_factory=list)  # list[RouteDef]
    transforms: list = field(default_factory=list)  # list[TransformDef]
    udfs: list = field(default_factory=list)  # list[UdfDef]
    models: list = field(default_factory=list)  # list[ModelDef]
    config: PipelineConfig = field(default_factory=PipelineConfig)
