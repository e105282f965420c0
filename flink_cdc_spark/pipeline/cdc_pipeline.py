"""Continuous CDC pipeline: live JDBC database -> incremental LSM state.

The full reference loop (MySqlDataSource -> pipeline -> Paimon sink,
flink-cdc's reason to exist) on the engine's own connectors: bootstrap via
the chunked LW/HW hybrid snapshot, then poll the trigger-capture log
incrementally — every poll is a micro-batch merged into the LSM store as
one O(batch) delta commit. Source-side DDL (ALTER TABLE) is detected by
metadata diff at each poll, the capture channel is re-aligned
(refresh_capture), and the store's schema evolves metadata-only.

The consumed offset is persisted next to the state (checkpoint analog), so
a restarted pipeline resumes from where it stopped — the same contract as
the reference's offset state in checkpoints.

At scale: the driver does control-plane work only (offset bookkeeping,
metadata diffs); row data moves exclusively through executor-side
spark.read.jdbc partitions into executor-written parquet deltas.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import SparkSession

from ..core.schema_evolution import apply_schema_change_event
from ..sinks.lsm_store import LsmStateStore
from ..sources.jdbc_live import (
    JdbcLiveSource,
    JdbcLiveSourceConfig,
    refresh_capture,
)


class JdbcCdcPipeline:
    """One source table, continuously replicated into an LSM state table."""

    def __init__(
        self,
        spark: SparkSession,
        source_cfg: JdbcLiveSourceConfig,
        state_root: str,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.cfg = source_cfg
        self.source = JdbcLiveSource(spark, source_cfg)
        self.state = LsmStateStore(spark, state_root, compact_every=compact_every)
        self.table = self.source.table_id
        self.schema = None  # discovered at bootstrap
        self._offset_file = os.path.join(
            state_root, self.table.replace("/", "_") + ".offset"
        )

    # -- offset checkpointing ---------------------------------------------
    def _load_offset(self) -> Optional[int]:
        if os.path.exists(self._offset_file):
            with open(self._offset_file) as f:
                return int(f.read().strip())
        return None

    def _store_offset(self, offset: int) -> None:
        os.makedirs(os.path.dirname(self._offset_file), exist_ok=True)
        with open(self._offset_file, "w") as f:
            f.write(str(offset))

    # -- lifecycle ---------------------------------------------------------
    def bootstrap(self) -> None:
        """Initial load: hybrid snapshot+tail (or resume from a stored
        offset after a restart — the snapshot is then already in state)."""
        self.schema = self.source.ep.discover_schema(self.cfg.table)
        if self._load_offset() is not None:
            return  # restart: state + offset already persisted
        # record the consumed-through offset BEFORE the plan executes:
        # events landing between this read and plan execution are consumed
        # by the tail AND replayed by the next poll — safe, because the
        # keyed last-image merge is idempotent (at-least-once delivery,
        # exactly-once state), the same contract as the reference's
        # backfill replay.
        hw = self.source.current_offset()
        env = self.source.read()  # startup-mode driven (INITIAL by default)
        self._merge_env(env, self.schema.to_spark_struct(), list(self.schema.primary_keys))
        self.source.release_caches()  # merge materialized the snapshot
        self._store_offset(hw)

    def _merge_env(self, env, target_struct, pks) -> None:
        """Single merge point for bootstrap/poll/repair — the routed
        multi-table variant overrides this to transform + fan out."""
        self.state.merge(self.table, env, target_struct, pks)

    def _apply_sink_schema(self) -> None:
        """Push the evolved source schema to the sink table(s) at
        DDL-detect time so a TRAILING DDL (no subsequent data) is still
        visible in reads; the routed variant overrides this to apply
        the transform and fan out to the router targets (wave-13b-era
        finding: the base set_schema addressed the SOURCE table id,
        which a routed pipe's state never materializes — a trailing ADD
        on a routed live pipeline stayed invisible until the next
        merge)."""
        self.state.set_schema(self.table, self.schema.to_spark_struct())

    def _repair_marker(self) -> str:
        return self._offset_file + ".repair_pending"

    def poll_once(self) -> int:
        """One incremental micro-batch: detect DDL, re-align capture,
        merge the new log slice. Returns number of log events consumed.

        DDL handling: events logged between the source-side ALTER and this
        poll were captured by the *old* triggers, so their images lack any
        newly added column (a binlog would have carried it — trigger
        capture cannot retroactively). After merging the slice, the keys it
        touched are re-read from the live table through JDBC and upserted
        as a repair commit — O(stale window), not O(table), and only on
        the rare DDL poll.

        CRASH-REPLAY: the repair obligation is persisted (a marker file
        next to the offset) BEFORE any capture/schema mutation, because a
        restarted pipeline re-discovers the already-current live schema,
        detects NO events, and would otherwise re-merge the stale-trigger
        slice without ever repairing it — or refreshing the capture
        triggers (wave-13b finding: a crash between the DDL poll's merge
        and its repair silently pinned the new column NULL). The marker
        clears only AFTER the offset store, so every replay path repairs
        at least once; the repair itself is idempotent (it upserts the
        live table's own current rows)."""
        events, _ = self.source.detect_schema_changes(self.schema)
        marker = self._repair_marker()
        if events:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w") as f:
                f.write("pending")
            refresh_capture(self.source.ep, self.cfg.table)
            for ev in events:
                self.schema = apply_schema_change_event(self.schema, ev)
            self._apply_sink_schema()
        pending = os.path.exists(marker)
        if pending and not events:
            # replaying a crashed DDL poll: the crash may have landed
            # before the capture refresh / sink-schema push — re-assert
            # both (idempotent) so the stale window ends here
            refresh_capture(self.source.ep, self.cfg.table)
            self._apply_sink_schema()
        last = self._load_offset() or 0
        hw = self.source.current_offset()
        if hw <= last:
            if pending:
                # nothing was logged under the old triggers after the
                # consumed offset (or the crashed poll already stored its
                # offset, i.e. repair ran) — no stale images to repair
                os.remove(marker)
            return 0
        env = self.source.read_log_envelope(last).where(f"__seq <= {hw}")
        target = self.schema.to_spark_struct()
        self._merge_env(env, target, list(self.schema.primary_keys))
        if events or pending:
            self._repair_touched_keys(env, target)
        self._store_offset(hw)
        if pending or events:
            os.remove(marker)
        return hw - last

    # above this many touched keys the repair read switches from pushed
    # IN-predicates to a chunked re-scan + executor-side semi join
    repair_collect_cap = 10_000

    def _repair_touched_keys(self, env, target) -> None:
        from pyspark.sql import functions as F

        from ..sources.envelope import wrap_as_inserts
        from ..sources.jdbc_live import fresh_rows_for_keys

        pk = self.cfg.key_column
        keys_df = (
            env.select(
                F.coalesce(F.col(f"after.{pk}"), F.col(f"before.{pk}")).alias(pk)
            )
            .distinct()
        )
        fresh = fresh_rows_for_keys(
            self.source, keys_df, pk, collect_cap=self.repair_collect_cap
        )
        if fresh is None:
            return
        repair = wrap_as_inserts(fresh, self.table)
        # its own (later) commit: wins over the slice for keys still present;
        # deleted keys are absent here, so their tombstones stand
        self._merge_env(repair, target, list(self.schema.primary_keys))

    def run(self, polls: int, interval_s: float = 0.0) -> int:
        """Poll N times (the availableNow analog of a continuous loop)."""
        total = 0
        for _ in range(polls):
            total += self.poll_once()
            if interval_s:
                time.sleep(interval_s)
        return total

    def current_state(self):
        return self.state.read(self.table)


class PostgresCdcPipeline:
    """Continuous CDC from a live PostgreSQL server into LSM state: the
    logical replication slot IS the checkpoint — ``poll_once`` consumes it
    (``pg_logical_slot_get_changes``), so a restarted pipeline resumes
    exactly where the slot stands, with no side file. Source-side DDL is
    detected by metadata diff (logical decoding does not emit DDL — the
    same gap Debezium fills with its schema history topic; here the
    current metadata is authoritative and old rows null-pad)."""

    def __init__(self, spark, source, state_root: str, compact_every: int = 8):
        """source: a PostgresCdcSource (its cfg.slot must exist or be
        created via bootstrap)."""
        self.spark = spark
        self.source = source
        self.state = LsmStateStore(spark, state_root, compact_every=compact_every)
        self.table = source.table_id
        self.schema = None
        self._snap_root = os.path.join(state_root, "_pg_snapshots")

    def bootstrap(self) -> None:
        """Create the slot (its position = now), then snapshot. Changes
        committed between slot creation and the snapshot read replay from
        the slot over the snapshot — idempotent last-image merge, the same
        at-least-once contract as the JDBC loop."""
        self.schema = self.source.discover_schema()
        self.source.create_slot()
        if self.state.read(self.table) is not None:
            return  # restart: state exists, the slot holds the position
        import uuid

        snap = self.source.snapshot(
            os.path.join(self._snap_root, uuid.uuid4().hex[:8])
        )
        from ..sources.envelope import wrap_as_inserts

        env = wrap_as_inserts(snap, self.table)
        self.state.merge(
            self.table, env, self.schema.to_spark_struct(),
            list(self.schema.primary_keys),
        )

    def poll_once(self) -> int:
        """One micro-batch under the flush-then-confirm contract: capture a
        WAL cap, PEEK the slot up to it, merge, and only then advance the
        slot's confirmed position to the cap (Debezium flushes records
        before confirming the LSN). A crash between merge and advance
        replays the same window on restart — safe, because the keyed
        last-image merge is idempotent (at-least-once delivery,
        exactly-once state)."""
        events, new_schema = self._detect_ddl()
        if events:
            for ev in events:
                self.schema = apply_schema_change_event(self.schema, ev)
            self.state.set_schema(self.table, self.schema.to_spark_struct())
        cap = self.source.current_lsn()
        env = self.source.read_changes(peek=True, upto_lsn=cap)
        n = env.count()
        if n:
            self.state.merge(
                self.table, env, self.schema.to_spark_struct(),
                list(self.schema.primary_keys),
            )
        self.source.advance_slot(cap)  # confirm only after the merge landed
        return n

    def _detect_ddl(self):
        from ..core.schema_evolution import get_schema_difference
        from ..core.table_id import TableId

        current = self.source.discover_schema()
        if self.schema is None:
            return [], current
        return (
            get_schema_difference(TableId.parse(self.table), self.schema, current),
            current,
        )

    def run(self, polls: int, interval_s: float = 0.0) -> int:
        total = 0
        for _ in range(polls):
            total += self.poll_once()
            if interval_s:
                time.sleep(interval_s)
        return total

    def current_state(self):
        return self.state.read(self.table)


class MultiTableCdcPipeline:
    """Discovery-driven continuous replication of many tables through the
    full pipeline surface: selector-matched tables from live metadata, a
    per-table transform (first matching rule), routing (1->N fan-out /
    renames), LSM state per sink table. The live composition of what the
    YAML pipeline declares — `execution.runtime-mode: STREAMING` with a
    `jdbc` source runs exactly this loop (cli.py).

    Reference scope: a multi-table MySqlDataSource feeding the composed
    pipeline (FlinkPipelineComposer.translate) continuously.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        state_root: str,
        pipeline_def=None,
        tables_selector: str = r"app.\.*",
        chunk_size: int = 8096,
        udf_names=frozenset(),
        shuffle_partitions=None,
    ):
        from ..core.router import RouteRule, TableIdRouter
        from ..pipeline.composer import _transform_rule_of
        from ..sources.jdbc_live import JdbcEndpoint

        self.spark = spark
        self.url = url
        self.state_root = state_root
        # per-table state relations are table-sized, not corpus-sized: a
        # caller replicating small/medium tables scopes the merge shuffle
        # width down (None = session default — correct when one captured
        # table IS corpus-scale)
        self.shuffle_partitions = shuffle_partitions
        self.pipeline_def = pipeline_def
        self.udf_names = frozenset(udf_names)
        routes = pipeline_def.routes if pipeline_def else []
        self.router = TableIdRouter(
            [RouteRule(r.source_table, r.sink_table, r.replace_symbol, r.description) for r in routes]
        )
        self._transform_rules = [
            (_transform_rule_of(t), _transform_rule_of(t).selectors())
            for t in (pipeline_def.transforms if pipeline_def else [])
        ]
        self.tables_selector = tables_selector
        self.chunk_size = chunk_size
        ep = JdbcEndpoint(spark, url)
        self.pipes = {}
        self.sink_schemas = {}  # sink table str -> Schema (post-transform)
        for tid in ep.discover_tables(selectors=tables_selector):
            self._add_pipe(ep, tid)

    def _add_pipe(self, ep, tid) -> bool:
        schema = ep.discover_schema(tid.table_name)
        if not schema.primary_keys:
            return False
        cfg = JdbcLiveSourceConfig(
            url=self.url,
            table=tid.table_name,
            key_column=schema.primary_keys[0],
            table_id=str(tid),
            chunk_size=self.chunk_size,
        )
        self.pipes[str(tid)] = _RoutedTablePipe(self, cfg)
        return True

    def capture_newly_added(self) -> list:
        """`scan.newly-added-table.enabled` semantics
        (base/source/assigner/SnapshotSplitAssigner.java:235-287): rescan
        the live metadata for selector-matched tables not yet captured and
        start each one with its own snapshot phase — existing pipes keep
        streaming, exactly the reference's
        suspend-free newly-added-tables process (each table's snapshot /
        stream handoff is already per-pipe LW/HW-fenced, so a new table
        joining late never disturbs captured ones)."""
        from ..sources.jdbc_live import JdbcEndpoint

        ep = JdbcEndpoint(self.spark, self.url)
        added = []
        with self._scope():
            for tid in ep.discover_tables(selectors=self.tables_selector):
                if str(tid) in self.pipes:
                    continue
                if self._add_pipe(ep, tid):
                    self.pipes[str(tid)].bootstrap()
                    added.append(str(tid))
        return added

    def _rule_for(self, tid):
        for rule, selectors in self._transform_rules:
            if selectors.is_match(tid):
                return rule
        return None

    def _scope(self):
        import contextlib

        from ..streaming.windowed import scoped_shuffle_partitions

        if self.shuffle_partitions:
            return scoped_shuffle_partitions(self.spark, self.shuffle_partitions)
        return contextlib.nullcontext()

    def bootstrap(self) -> None:
        with self._scope():
            for pipe in self.pipes.values():
                pipe.bootstrap()

    def poll_once(self, rescan: bool = False) -> int:
        if rescan:
            self.capture_newly_added()
        with self._scope():
            return sum(pipe.poll_once() for pipe in self.pipes.values())

    def run(self, polls: int, interval_s: float = 0.0,
            rescan_new_tables: bool = False) -> int:
        total = 0
        for _ in range(polls):
            total += self.poll_once(rescan=rescan_new_tables)
            if interval_s:
                time.sleep(interval_s)
        return total

    def current_state(self, sink_table: str):
        # NOTE: returns a LAZY frame — the shuffle width in force at
        # ACTION time governs its exchanges, so callers wanting the scoped
        # width must evaluate inside their own scope
        from ..sinks.lsm_store import LsmStateStore

        return LsmStateStore(self.spark, self.state_root).read(sink_table)

    def sink_tables(self):
        out = set()
        for pipe in self.pipes.values():
            out.update(pipe.targets())
        return sorted(out)


class _RoutedTablePipe(JdbcCdcPipeline):
    """One source table inside a MultiTableCdcPipeline: same bootstrap/
    poll/repair lifecycle, but every envelope batch goes through the
    transform rule and the router before merging (possibly into several
    sink tables)."""

    def __init__(self, parent: MultiTableCdcPipeline, cfg: JdbcLiveSourceConfig):
        super().__init__(parent.spark, cfg, parent.state_root)
        self.parent = parent
        from ..core.table_id import TableId

        self._tid = TableId.parse(self.table)

    def targets(self):
        return [str(t) for t in self.parent.router.route(self._tid)]

    def _apply_sink_schema(self):
        from ..operators.transform import TransformProcessor

        rule = self.parent._rule_for(self._tid)
        schema = self.schema
        if rule is not None:
            proc = TransformProcessor(
                rule, schema.to_spark_struct(), udf_names=self.parent.udf_names
            )
            schema = proc.output_schema(schema)
        struct = schema.to_spark_struct()
        for target in self.parent.router.route(self._tid):
            self.state.set_schema(str(target), struct)

    # the single-table lifecycle funnels every merge through _merge_env;
    # route and transform by overriding that one hook
    def _merge_env(self, env, target_struct, pks):
        from ..operators.transform import TransformProcessor

        rule = self.parent._rule_for(self._tid)
        out_struct, out_pks = target_struct, pks
        if rule is not None:
            proc = TransformProcessor(
                rule, target_struct, udf_names=self.parent.udf_names
            )
            env = proc.apply(env)
            out_struct = env.schema["after"].dataType
            out_pks = list(rule.primary_keys) or pks
        for target in self.parent.router.route(self._tid):
            self.state.merge(str(target), env, out_struct, out_pks)
