"""Structured Streaming pipeline runner.

The streaming shape of the engine (SURVEY.md §7 phase 4):

    readStream(wire JSON) -> foreachBatch(process_batch) -> state store

Each micro-batch is processed with the same core as the batch composer
(transform -> route -> schema coordination -> coercion -> MERGE), with the
reference's FlushEvent/coordinator dance collapsed into batch segmentation:
DDL records split the batch at their sequence positions; every data segment
is fully merged into the sink state *before* the DDL is applied, exactly
the "flush then apply DDL on a consistent boundary" contract of
runtime/operators/schema/regular/SchemaOperator.java:150-228.

Per-key ordering under shuffle: the MERGE orders by the wire sequence
number within the batch and existing state sorts below every new event, so
last-image-per-key is deterministic (SURVEY.md §7 hard-list #5).

The state store is a versioned parquet snapshot per sink table (a stand-in
for a Delta/Iceberg MERGE INTO target; the MetadataApplier analog is the
schema coercion applied when the snapshot is rewritten).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.router import RouteRule, TableIdRouter
from ..core.table_id import TableId
from ..operators.coerce import coerce_envelope_payload
from ..operators.transform import TransformProcessor
from ..pipeline.definition import PipelineDef
from ..pipeline.schema_coordinator import SchemaCoordinator
from ..sources.envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
)
from .wire import KIND_DATA, KIND_DDL, WIRE_SCHEMA, ddl_from_dict


class ParquetStateStore:
    """Versioned materialized table state: {root}/{table}/v{n} + _CURRENT.

    merge() = read current snapshot (sorting below the incoming batch),
    union, last-image-per-key, write next version, flip the pointer.
    Stand-in for `MERGE INTO` on a lake table; the full-rewrite cost is the
    price of parquet-without-a-table-format and is documented as such.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table.replace("/", "_"))

    def _current_version(self, table: str) -> int:
        ptr = os.path.join(self._dir(table), "_CURRENT")
        if not os.path.exists(ptr):
            return -1
        with open(ptr) as f:
            return int(f.read().strip())

    def read(self, table: str) -> Optional[DataFrame]:
        v = self._current_version(table)
        if v < 0:
            return None
        return self.spark.read.parquet(os.path.join(self._dir(table), f"v{v}"))

    def write(self, table: str, df: DataFrame) -> None:
        v = self._current_version(table) + 1
        d = self._dir(table)
        df.write.mode("overwrite").parquet(os.path.join(d, f"v{v}"))
        with open(os.path.join(d, "_CURRENT"), "w") as f:
            f.write(str(v))

    def drop(self, table: str) -> None:
        """DROP TABLE: remove the versioned snapshot dir entirely."""
        import shutil

        shutil.rmtree(self._dir(table), ignore_errors=True)

    def merge(self, table: str, env: DataFrame, target_struct, primary_keys,
              partition_keys=()) -> None:
        """Apply an envelope batch (already coerced to target_struct).
        partition_keys is accepted for sink-interface parity with the LSM
        store and ignored — the legacy full-rewrite backend has no
        partition layout to exploit (found by the wave-12 trailing-DDL
        pin: the runner has passed it since partition-key support landed,
        which made the parquet backend un-runnable)."""
        from pyspark.sql import Window

        current = self.read(table)
        if current is not None:
            # existing state sorts below all new events (seq = -1), and is
            # coerced in case this batch evolved the schema
            state_env = current.select(
                F.lit(table).alias(ENVELOPE_TABLE_ID),
                F.lit("INSERT").alias(ENVELOPE_OP),
                F.lit(None).cast(env.schema["before"].dataType).alias("before"),
                F.struct(*[F.col(c) for c in current.columns]).alias("after"),
                F.create_map().cast("map<string,string>").alias(ENVELOPE_META),
                F.lit(-1).alias(ENVELOPE_SEQ),
            )
            state_env = coerce_envelope_payload(state_env, target_struct)
            env = state_env.unionByName(env)
        if primary_keys:
            keys = [
                F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__k_{k}")
                for k in primary_keys
            ]
            keyed = env.select("*", *keys)
            w = Window.partitionBy(*[f"__k_{k}" for k in primary_keys]).orderBy(
                F.col(ENVELOPE_SEQ).desc()
            )
            latest = (
                keyed.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .where(F.col(ENVELOPE_OP) != OP_DELETE)
            )
            out = latest.select("after.*")
        else:
            out = env.where(F.col(ENVELOPE_OP) != OP_DELETE).select("after.*")
        self.write(table, out)


class StreamingPipelineRunner:
    """Drives a wire-format changelog stream through the pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        pipeline: PipelineDef,
        state_root: str,
        checkpoint_dir: str,
        udf_names=frozenset(),
        state_backend: str = "lsm",
        parallel_metadata: bool = False,
        primary_keys: Optional[dict] = None,
        shuffle_partitions: Optional[int] = None,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.pipeline = pipeline
        from ..pipeline.composer import meta_keys_of

        self.meta_keys = meta_keys_of(pipeline)
        # parallel-metadata source mode (DataSource.isParallelMetadataSource,
        # common/source/DataSource.java:51): partitions may carry divergent
        # payload schemas and no in-band DDL; each batch starts with a
        # distributed schema discovery + reduction
        # (runtime/operators/schema/distributed/SchemaCoordinator.java).
        self.parallel_metadata = parallel_metadata
        self.primary_keys = dict(primary_keys or {})
        if state_backend == "lsm":
            # Paimon-style merge-on-read: O(batch) appends, metadata-only
            # DDL, amortized compaction (sinks/lsm_store.py)
            from ..sinks.lsm_store import LsmStateStore

            self.state = LsmStateStore(
                spark, state_root, compact_every=compact_every
            )
        elif state_backend == "parquet":
            # legacy full-rewrite store (O(state) per batch; kept for
            # comparison and as the simplest possible sink)
            self.state = ParquetStateStore(spark, state_root)
        else:
            raise ValueError(f"unknown state backend {state_backend!r}")
        self.checkpoint_dir = checkpoint_dir
        self.udf_names = frozenset(udf_names)
        self.router = TableIdRouter(
            [
                RouteRule(r.source_table, r.sink_table, r.replace_symbol, r.description)
                for r in pipeline.routes
            ],
            route_mode=pipeline.config.route_mode,
        )
        self.coordinator = SchemaCoordinator.from_sink_def(
            self.router,
            pipeline.config.schema_change_behavior,
            pipeline.sink.include_schema_evolution_types,
            pipeline.sink.exclude_schema_evolution_types,
        )
        from ..pipeline.composer import _transform_rule_of

        self._transform_rules = [
            (_transform_rule_of(t), _transform_rule_of(t).selectors())
            for t in pipeline.transforms
        ]
        self.batches_seen = 0
        # bounded-replay callers (the file-replay bridges) pass a small
        # width: their micro-batches are tiny, and the LSM merge's state
        # shuffles at the session default (32) are pure fixed overhead.
        # None = leave the session width alone (the at-scale default).
        self.shuffle_partitions = shuffle_partitions

    # -- plumbing ----------------------------------------------------------

    def _rule_for(self, table_id: TableId):
        for rule, selectors in self._transform_rules:
            if selectors.is_match(table_id):
                return rule
        return None

    def start(self, source_dir: str, available_now: bool = True):
        """Start the stream over a directory of wire JSON files."""
        wire = self.spark.readStream.schema(WIRE_SCHEMA).json(source_dir)
        writer = (
            wire.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self, source_dir: str, timeout: int = 300) -> None:
        import contextlib

        from .windowed import scoped_shuffle_partitions, unload_state_store_providers

        scope = (
            scoped_shuffle_partitions(self.spark, self.shuffle_partitions)
            if self.shuffle_partitions
            else contextlib.nullcontext()
        )
        # the streaming query CLONES the session at start(), snapshotting
        # the scoped width — so the scope need only bracket start()
        with scope:
            q = self.start(source_dir, available_now=True)
            q.awaitTermination(timeout)
        if hasattr(self.state, "seal_all"):
            # checkpoint committed: clear the persisted in-flight markers
            self.state.seal_all()
        unload_state_store_providers(self.spark)

    # -- the core ----------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch body: segment at DDL positions, merge each data
        segment before applying the DDL that follows it."""
        self.batches_seen += 1
        if hasattr(self.state, "begin_epoch"):
            # the foreachBatch batch_id is Structured Streaming's replay
            # key: a crash-replayed batch re-delivers under the SAME id,
            # which lets the LSM manifest tell a replayed ADD from a
            # fresh re-ADD of a reused column name
            self.state.begin_epoch(batch_id)
        # The batch is consumed once per (segment, table) below plus the
        # DDL control pass — cache it so an N-table pipeline reads the wire
        # source once, not N+1 times (SchemaOperator keeps the control
        # plane driver-side, but the scans must all hit the cached batch).
        batch = batch.cache()
        try:
            data = batch.where(F.col("kind") == KIND_DATA)
            if self.parallel_metadata:
                self._reduce_batch_schemas(data)
            ddl_rows = (
                batch.where(F.col("kind") == KIND_DDL)
                .select("table_id", "seq", "ddl")
                .orderBy("seq")
                .collect()
            )
            # segment boundaries: (-inf, ddl1.seq), [ddl1.seq, ddl2.seq), ...
            bounds = [r.seq for r in ddl_rows]
            segments = []
            lo = None
            for i, hi in enumerate(bounds):
                segments.append((lo, hi, ddl_rows[i]))
                lo = hi
            segments.append((lo, None, None))

            # ONE metadata pass computes which tables appear in which
            # segment (instead of a distinct().collect() job per segment —
            # a multi-slice batch used to pay n_segments scans, including
            # scans of provably-empty segments). Control and data records
            # never share a seq (control sits below the per-slice data
            # band), so strict < comparisons assign segments exactly.
            seg_idx = None
            for i, b in enumerate(bounds):
                cond = F.col("seq") < F.lit(b)
                seg_idx = F.when(cond, i) if seg_idx is None else seg_idx.when(cond, i)
            seg_idx = (
                F.lit(0) if seg_idx is None else seg_idx.otherwise(len(bounds))
            )
            presence: dict = {}
            for r in (
                data.groupBy(seg_idx.alias("seg_no"), "table_id")
                .count().collect()
            ):
                presence.setdefault(r.seg_no, []).append(r.table_id)

            for i, (lo, hi, ddl_row) in enumerate(segments):
                tables = presence.get(i, [])
                if tables:
                    seg = data
                    if lo is not None:
                        seg = seg.where(F.col("seq") > lo)
                    if hi is not None:
                        seg = seg.where(F.col("seq") < hi)
                    self._merge_segment(seg, tables=tables)
                if ddl_row is not None:
                    self._apply_ddl(self._decode_ddl(ddl_row))
        finally:
            batch.unpersist()

    def _decode_ddl(self, ddl_row):
        """Wire DDL records carry either the engine's JSON event encoding
        or a raw SQL statement (a binlog/Kafka-DDL-topic shape) — the SQL
        path goes through sources/ddl_parser.py, the
        CustomMySqlAntlrDdlParser analog."""
        raw = ddl_row.ddl
        tid = TableId.parse(ddl_row.table_id)
        if raw.lstrip().startswith("{"):
            return ddl_from_dict(tid, json.loads(raw))
        import dataclasses

        from ..sources.ddl_parser import parse_ddl

        event = parse_ddl(raw)
        if str(event.table_id) != ddl_row.table_id:
            # the record's table_id is authoritative (SQL may use a short name)
            event = dataclasses.replace(event, table_id=tid)
        return event

    def _reduce_batch_schemas(self, data: DataFrame) -> None:
        """Distributed schema reduction, live: every partition of the batch
        infers its payload schema executor-side (metadata-only pass — the
        payloads never reach the driver), the driver folds them to the
        least-common schema, and the delta vs the known schema is applied
        through the coordinator as ordinary DDL. The Spark rendition of the
        distributed SchemaOperator/SchemaCoordinator RPC reduction.

        `data` is the already-filtered (kind == DATA) cached plane from
        process_batch."""
        from ..core.events import CreateTableEvent
        from ..core.schema import Schema
        from ..core.schema_evolution import (
            get_least_common_schema,
            get_schema_difference,
        )
        from ..pipeline.distributed import (
            discover_json_payload_schemas,
            merged_schema_for_table,
        )

        tables = [r.table_id for r in data.select("table_id").distinct().collect()]
        for table in sorted(tables):
            tid = TableId.parse(table)
            ddls = discover_json_payload_schemas(
                data.where(F.col("table_id") == table), "after"
            )
            if not ddls:
                continue
            merged = merged_schema_for_table(table, ddls)
            pks = tuple(self.primary_keys.get(table, ()))
            current = self.coordinator.original_schema(tid)
            if current is None:
                merged = Schema(
                    columns=merged.columns, primary_keys=pks
                ).ensure_pk_non_null()
                self._apply_ddl(CreateTableEvent(tid, merged))
                continue
            target = get_least_common_schema(current, merged)
            for ev in get_schema_difference(tid, current, target):
                self._apply_ddl(ev)

    def _apply_ddl(self, event) -> None:
        from ..core.events import CreateTableEvent
        from ..pipeline.composer import schema_change_passes_projection

        rule = self._rule_for(event.table_id)
        if isinstance(event, CreateTableEvent) and rule is not None:
            proc = TransformProcessor(
                rule,
                event.schema.to_spark_struct(),
                udf_names=self.udf_names,
                meta_keys=self.meta_keys,
                local_time_zone=self.pipeline.config.local_time_zone,
            )
            event = CreateTableEvent(event.table_id, proc.output_schema(event.schema))
        if isinstance(event, CreateTableEvent) or schema_change_passes_projection(
            event, rule
        ):
            applied = self.coordinator.process_schema_change(event)
            for target, evolved_event in applied:
                self._migrate_state(str(target), evolved_event)
        else:
            from ..core.schema_evolution import apply_schema_change_event

            cur = self.coordinator.original_schema(event.table_id)
            self.coordinator.original_schemas.setdefault(event.table_id, []).append(
                apply_schema_change_event(cur, event)
            )

    def _migrate_state(self, table: str, event) -> None:
        """Sink-side DDL execution — the MetadataApplier analog
        (common/sink/MetadataApplier.java:33-39; PaimonMetadataApplier
        applies DDL as catalog metadata operations). On the LSM backend
        every DDL is metadata-only; on the legacy parquet backend
        renames/truncates rewrite the snapshot. Adds/type-widenings are
        absorbed by the coercion in the next merge either way."""
        from ..core.events import (
            AddColumnEvent,
            AlterColumnTypeEvent,
            DropColumnEvent,
            DropTableEvent,
            RenameColumnEvent,
            TruncateTableEvent,
        )
        from ..core.types import to_spark_type
        from ..sinks.lsm_store import LsmStateStore

        if isinstance(event, DropTableEvent):
            # sink-side table removal (MetadataApplier drop semantics);
            # found by probing: a DROP through the runner used to leave
            # the state fully readable
            self.state.drop(table)
            return
        # NOTE: every edit below is EVENT-DRIVEN and monotone — derived
        # from the event against the sink's CURRENT state, never a
        # snapshot of the coordinator's evolved schema. A crash-replayed
        # batch re-applies its DDL against a sink that is already AHEAD
        # (the first attempt's edits landed); pushing the coordinator's
        # mid-replay view would move the schema BACKWARDS, and a
        # compaction run while regressed bakes NULLs into the base
        # (found by the wave-12 widening trials). CreateTableEvent
        # deliberately touches nothing: a recovery-prefix or N->1-merge
        # CREATE carries a historical schema.
        if isinstance(self.state, LsmStateStore):
            if isinstance(event, RenameColumnEvent):
                self.state.rename_columns(table, list(event.name_mapping))
            elif isinstance(event, TruncateTableEvent):
                self.state.truncate(table)
            elif isinstance(event, AddColumnEvent):
                # a trailing ADD with no subsequent data must still be
                # readable (wave-12 finding) — insert into the manifest,
                # honoring FIRST/BEFORE/AFTER anchors (SchemaUtils
                # applyAddColumnEvent ordering; ADVICE r13)
                self.state.add_columns(
                    table,
                    [
                        (
                            cwp.column.name,
                            to_spark_type(cwp.column.type),
                            cwp.position.value,
                            cwp.existed_column_name,
                        )
                        for cwp in event.added_columns
                    ],
                )
            elif isinstance(event, AlterColumnTypeEvent):
                self.state.alter_column_types(
                    table,
                    [
                        (name, to_spark_type(dt))
                        for name, dt in event.type_mapping
                    ],
                )
            elif isinstance(event, DropColumnEvent):
                self.state.drop_columns(
                    table, list(event.dropped_column_names)
                )
            return
        current = self.state.read(table)
        if current is None:
            return
        if isinstance(event, RenameColumnEvent):
            for old, new in event.name_mapping:
                if old in current.columns:
                    current = current.withColumnRenamed(old, new)
            self.state.write(table, current)
        elif isinstance(event, TruncateTableEvent):
            self.state.write(table, current.limit(0))
        elif isinstance(event, AddColumnEvent):
            # same trailing-DDL contract, legacy backend: null-pad the
            # snapshot with exactly the event's columns (monotone),
            # inserted at the event's FIRST/BEFORE/AFTER anchors
            missing = [
                cwp
                for cwp in event.added_columns
                if cwp.column.name not in current.columns
            ]
            if missing:
                order = list(current.columns)
                for cwp in missing:
                    current = current.withColumn(
                        cwp.column.name,
                        F.lit(None).cast(to_spark_type(cwp.column.type)),
                    )
                    pos = cwp.position.value
                    if pos == "FIRST":
                        order.insert(0, cwp.column.name)
                    elif (
                        pos in ("BEFORE", "AFTER")
                        and cwp.existed_column_name in order
                    ):
                        idx = order.index(cwp.existed_column_name)
                        order.insert(
                            idx if pos == "BEFORE" else idx + 1,
                            cwp.column.name,
                        )
                    else:
                        order.append(cwp.column.name)
                self.state.write(table, current.select(*order))
        elif isinstance(event, AlterColumnTypeEvent):
            changed = False
            for name, dt in event.type_mapping:
                if name in current.columns:
                    current = current.withColumn(
                        name, F.col(name).cast(to_spark_type(dt))
                    )
                    changed = True
            if changed:
                self.state.write(table, current)
        elif isinstance(event, DropColumnEvent):
            gone = [n for n in event.dropped_column_names if n in current.columns]
            if gone:
                self.state.write(table, current.drop(*gone))

    def _merge_segment(self, seg: DataFrame, tables=None) -> None:
        if tables is None:
            tables = [r.table_id for r in seg.select("table_id").distinct().collect()]
        for table in sorted(tables):
            tid = TableId.parse(table)
            schema = self.coordinator.original_schema(tid)
            if schema is None:
                raise ValueError(f"Data before CreateTableEvent for {table}")
            payload = schema.to_spark_struct()
            rows = seg.where(F.col("table_id") == table)
            env = rows.select(
                F.col("table_id").alias(ENVELOPE_TABLE_ID),
                F.col("op").alias(ENVELOPE_OP),
                F.from_json("before", payload).alias("before"),
                F.from_json("after", payload).alias("after"),
                F.col("meta").alias(ENVELOPE_META),
                F.col("seq").alias(ENVELOPE_SEQ),
            )
            rule = self._rule_for(tid)
            if rule is not None:
                proc = TransformProcessor(
                    rule,
                    payload,
                    udf_names=self.udf_names,
                    meta_keys=self.meta_keys,
                    local_time_zone=self.pipeline.config.local_time_zone,
                )
                env = proc.apply(env)
            for target in self.router.route(tid):
                final_schema = self.coordinator.evolved_schema(target)
                if final_schema is None:
                    raise ValueError(f"No sink schema for {target}")
                # data decodes with the *current* original schema, so no
                # rename redirection is needed here — state migrated at
                # DDL-apply time carries renamed history forward
                routed = env.withColumn(ENVELOPE_TABLE_ID, F.lit(str(target)))
                target_struct = final_schema.to_spark_struct()
                coerced = coerce_envelope_payload(routed, target_struct)
                self.state.merge(
                    str(target), coerced, target_struct,
                    list(final_schema.primary_keys),
                    partition_keys=list(
                        getattr(final_schema, "partition_keys", ()) or ()
                    ),
                )
