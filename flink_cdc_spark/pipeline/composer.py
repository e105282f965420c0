"""Batch pipeline composer: PipelineDef -> per-sink-table DataFrames.

The Spark analog of FlinkPipelineComposer.translate
(flink-cdc-composer/.../flink/FlinkPipelineComposer.java:120-261) in batch
mode (BatchSchemaOperator path): source -> transform (first matching rule,
transform.md:388-401) -> route (fan-out / N->1 merge) -> materializing sink.

Everything stays declarative DataFrame ops so Catalyst does column pruning,
predicate pushdown and join/shuffle planning; the composer's own logic is
driver-side metadata (which tables, which rules, which routes).

N->1 merged tables are aligned to the least-common schema
(core/schema_evolution.py merge_create_table_events) with missing columns
null-padded and types cast — the Spark rendition of
SchemaDerivator.coerceDataRecord (SchemaDerivator.java:299).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.router import RouteRule, TableIdRouter
from ..core.schema import Schema
from ..core.schema_evolution import merge_create_table_events
from ..core.table_id import TableId
from ..core import types as ct
from ..operators.transform import TransformProcessor, TransformRule
from ..sinks.materialize import materialize_changelog
from ..sources.envelope import ENVELOPE_META, ENVELOPE_OP, ENVELOPE_SEQ, ENVELOPE_TABLE_ID
from .definition import PipelineDef, TransformDef


@dataclass
class TableStream:
    """One source table's changelog + schema sidecar."""

    table_id: TableId
    df: DataFrame
    schema: Schema
    insert_only: bool = False


@dataclass
class PipelineResult:
    # sink table id -> materialized current-state DataFrame
    tables: dict = field(default_factory=dict)
    # sink table id -> changelog envelope feeding it (pre-materialization)
    changelogs: dict = field(default_factory=dict)
    # sink table id -> Schema sidecar
    schemas: dict = field(default_factory=dict)


def _transform_rule_of(t: TransformDef) -> TransformRule:
    return TransformRule(
        source_table=t.source_table,
        projection=t.projection,
        filter=t.filter,
        primary_keys=tuple(t.primary_keys),
        partition_keys=tuple(t.partition_keys),
        table_options=tuple(t.table_options),
        converter_after_transform=t.converter_after_transform,
        description=t.description,
    )


class BatchPipelineComposer:
    def __init__(self, spark: SparkSession, pipeline: PipelineDef, udf_names=frozenset()):
        self.spark = spark
        self.pipeline = pipeline
        self.udf_names = frozenset(udf_names)
        self.router = TableIdRouter(
            [
                RouteRule(r.source_table, r.sink_table, r.replace_symbol, r.description)
                for r in pipeline.routes
            ],
            route_mode=pipeline.config.route_mode,
        )
        self._transform_rules = [
            (_transform_rule_of(t), _transform_rule_of(t).selectors())
            for t in pipeline.transforms
        ]

    # -- per-table plan ---------------------------------------------------------
    def _first_matching_rule(self, table_id: TableId) -> Optional[TransformRule]:
        for rule, selectors in self._transform_rules:
            if selectors.is_match(table_id):
                return rule
        return None

    def compose(self, streams) -> PipelineResult:
        """streams: iterable[TableStream] — one per source table."""
        result = PipelineResult()
        # sink table id -> list[(envelope df, schema, insert_only)]
        per_sink: dict = {}

        for stream in streams:
            rule = self._first_matching_rule(stream.table_id)
            df, schema = stream.df, stream.schema
            if rule is not None:
                payload = None
                for f_ in df.schema.fields:
                    if f_.name == "after":
                        payload = f_.dataType
                proc = TransformProcessor(
                    rule,
                    payload,
                    local_time_zone=self.pipeline.config.local_time_zone,
                    udf_names=self.udf_names,
                )
                df = proc.apply(df)
                schema = proc.output_schema(schema)

            for target in self.router.route(stream.table_id):
                routed = df.withColumn(ENVELOPE_TABLE_ID, F.lit(str(target)))
                per_sink.setdefault(str(target), []).append(
                    (routed, schema, stream.insert_only)
                )

        for sink_table, parts in per_sink.items():
            if len(parts) == 1:
                env, schema, insert_only = parts[0]
            else:
                schema = merge_create_table_events(
                    TableId.parse(sink_table), [s for _, s, _ in parts]
                )
                env = self._align_and_union(parts, schema)
                insert_only = all(io for _, _, io in parts)
            result.changelogs[sink_table] = env
            result.schemas[sink_table] = schema
            result.tables[sink_table] = materialize_changelog(
                env, list(schema.primary_keys), insert_only=insert_only
            )
        return result

    # -- N->1 schema alignment -----------------------------------------------------
    def _align_and_union(self, parts, merged_schema: Schema) -> DataFrame:
        target_struct = merged_schema.to_spark_struct()
        target_cols = [f.name for f in target_struct.fields]
        aligned = []
        for env, schema, _ in parts:
            have = {c.name for c in schema.columns}

            def coerce_image(image: str):
                cols = []
                for f_ in target_struct.fields:
                    if f_.name in have:
                        cols.append(
                            F.col(f"{image}.{f_.name}").cast(f_.dataType).alias(f_.name)
                        )
                    else:
                        cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
                return F.when(F.col(image).isNotNull(), F.struct(*cols)).otherwise(F.lit(None))

            aligned.append(
                env.select(
                    F.col(ENVELOPE_TABLE_ID),
                    F.col(ENVELOPE_OP),
                    coerce_image("before").alias("before"),
                    coerce_image("after").alias("after"),
                    F.col(ENVELOPE_META),
                    F.col(ENVELOPE_SEQ),
                )
            )
        out = aligned[0]
        for other in aligned[1:]:
            out = out.unionByName(other)
        return out
