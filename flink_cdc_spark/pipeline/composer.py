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


def meta_keys_of(pipeline: PipelineDef) -> tuple:
    """Source-declared metadata keys (`metadata.list: op_ts`) exposed to
    transform expressions as bare identifiers bound to the envelope meta
    map (transform.md:74-96; MySqlDataSourceOptions METADATA_LIST)."""
    raw = str((pipeline.source.config or {}).get("metadata.list", "") or "")
    return tuple(k.strip() for k in raw.split(",") if k.strip())


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


def schema_change_passes_projection(event, rule) -> bool:
    """Whether a schema change survives the projection
    (PostTransformOperator.java:244-273: wildcard passes everything;
    an explicit projection only passes changes touching projected
    passthrough columns)."""
    if rule is None or not rule.projection:
        return True
    from ..expressions.projection import parse_projection

    items = parse_projection(rule.projection)
    if any(p.is_wildcard for p in items):
        return True
    projected = {p.output_name for p in items}
    t = event.TYPE
    if t == "ADD_COLUMN":
        return False  # new upstream columns aren't projected
    if t == "DROP_COLUMN":
        return any(c in projected for c in event.dropped_column_names)
    if t == "RENAME_COLUMN":
        return any(old in projected for old, _ in event.name_mapping)
    if t == "ALTER_COLUMN_TYPE":
        return any(c in projected for c, _ in event.type_mapping)
    return True


class EventPipelineComposer:
    """Replays a scripted event stream (data changes + DDL) through the full
    pipeline: per-epoch transform -> schema coordination -> coercion to the
    final evolved schema -> materialization. The batch analog of the
    reference's values-connector integration tests
    (FlinkPipelineComposerITCase / SchemaEvolveTest), and the core loop the
    streaming runner reuses per micro-batch."""

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
        from .schema_coordinator import SchemaCoordinator

        self.coordinator = SchemaCoordinator.from_sink_def(
            self.router,
            pipeline.config.schema_change_behavior,
            pipeline.sink.include_schema_evolution_types,
            pipeline.sink.exclude_schema_evolution_types,
        )
        self._transform_rules = [
            (_transform_rule_of(t), _transform_rule_of(t).selectors())
            for t in pipeline.transforms
        ]
        self.meta_keys = meta_keys_of(pipeline)

    def _first_matching_rule(self, table_id: TableId):
        for rule, selectors in self._transform_rules:
            if selectors.is_match(table_id):
                return rule
        return None

    def _passes_transform(self, event, rule) -> bool:
        return schema_change_passes_projection(event, rule)

    def run(self, events) -> PipelineResult:
        """events: ordered DataChangeEvent | SchemaChangeEvent stream."""
        from ..core.events import CreateTableEvent, SchemaChangeEvent
        from ..operators.coerce import coerce_envelope_payload
        from ..sources.values_source import Epoch, ValuesSource

        source = ValuesSource(self.spark, events)
        per_sink: dict = {}  # sink table str -> list[envelope df (pre-coercion)]
        epoch_idx = 0

        for item in source.epochs():
            if isinstance(item, SchemaChangeEvent):
                rule = self._first_matching_rule(item.table_id)
                if isinstance(item, CreateTableEvent):
                    # transform rewrites the created schema
                    if rule is not None:
                        payload = item.schema.to_spark_struct()
                        proc = TransformProcessor(
                            rule, payload, udf_names=self.udf_names,
                            meta_keys=self.meta_keys,
                            local_time_zone=self.pipeline.config.local_time_zone,
                            logical_schema=item.schema,
                        )
                        item = CreateTableEvent(item.table_id, proc.output_schema(item.schema))
                    self.coordinator.process_schema_change(item)
                elif self._passes_transform(item, rule):
                    applied = self.coordinator.process_schema_change(item)
                    # data-plane effects of table-level DDL: truncate/drop
                    # discard rows accumulated for the target so far
                    for target, ev in applied:
                        if ev.TYPE in ("TRUNCATE_TABLE", "DROP_TABLE"):
                            per_sink.pop(str(target), None)
                else:
                    # still track upstream schema versions
                    from ..core.schema_evolution import apply_schema_change_event

                    cur = self.coordinator.original_schema(item.table_id)
                    self.coordinator.original_schemas.setdefault(item.table_id, []).append(
                        apply_schema_change_event(cur, item)
                    )
                continue

            epoch: Epoch = item
            df = source.epoch_dataframe(epoch, seq_start=epoch_idx << 32)
            epoch_idx += 1
            rule = self._first_matching_rule(epoch.table_id)
            schema = epoch.schema
            if rule is not None:
                payload = None
                for f_ in df.schema.fields:
                    if f_.name == "after":
                        payload = f_.dataType
                proc = TransformProcessor(
                    rule, payload, udf_names=self.udf_names,
                    meta_keys=self.meta_keys,
                    local_time_zone=self.pipeline.config.local_time_zone,
                    logical_schema=schema,
                )
                df = proc.apply(df)
            for target in self.router.route(epoch.table_id):
                routed = df.withColumn(ENVELOPE_TABLE_ID, F.lit(str(target)))
                version = len(self.coordinator.evolved_schemas.get(target, []))
                per_sink.setdefault(str(target), []).append((routed, target, version))

        result = PipelineResult()
        from ..operators.coerce import coerce_envelope_payload
        from .schema_coordinator import rename_map_through

        for sink_table, frames in per_sink.items():
            final_schema = self.coordinator.evolved_schema(TableId.parse(sink_table))
            if final_schema is None:
                raise ValueError(f"No CreateTableEvent seen for sink table {sink_table}")
            target_struct = final_schema.to_spark_struct()
            coerced = []
            for frame, target, version in frames:
                # columns renamed after this frame's emission need source-name
                # redirection during coercion
                later_ddl = self.coordinator.ddl_log.get(target, [])[version:]
                fwd = rename_map_through(later_ddl)  # emission name -> final name
                source_names = {final: src for src, final in fwd.items()}
                coerced.append(coerce_envelope_payload(frame, target_struct, source_names))
            env = coerced[0]
            for other in coerced[1:]:
                env = env.unionByName(other)
            result.changelogs[sink_table] = env
            result.schemas[sink_table] = final_schema
            result.tables[sink_table] = materialize_changelog(
                env, list(final_schema.primary_keys)
            )
        return result


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
        self.meta_keys = meta_keys_of(pipeline)

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
                    meta_keys=self.meta_keys,
                    local_time_zone=self.pipeline.config.local_time_zone,
                    udf_names=self.udf_names,
                    logical_schema=schema,
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
