"""Live database -> Structured Streaming bridge: the continuous CDC
topology as a real checkpointed Spark streaming job.

The reference runs CDC as one continuous dataflow: source reader ->
SchemaOperator -> transform/route -> sink writer, wired by
FlinkPipelineComposer (flink-cdc-composer/.../FlinkPipelineComposer.java:
120-261), with offsets and schema state carried in checkpoints. The Spark
rendition splits that topology at its natural seam:

  * a **control-plane exporter** (this module) that spools live-capture
    increments into the wire-format stream directory. Row data moves
    executor-side end to end: ``spark.read.jdbc`` partitions -> wire-JSON
    encode (``to_json``) -> ``df.write.json`` part files. The driver only
    brackets offsets and writes tiny DDL control records — exactly the
    work the reference's enumerator/coordinator does on the JobManager.
  * the existing ``StreamingPipelineRunner`` — ``readStream`` over the
    wire directory -> checkpointed ``foreachBatch`` (transform -> route ->
    schema coordination -> LSM merge). Restart-resume is Spark's file
    source checkpoint: processed files are never re-merged.

Restart-resume of *schema* state: every exported slice is prefixed with a
``CreateTableEvent`` carrying the schema current at export time. The
coordinator treats a replayed CREATE as widen-or-no-op
(SchemaCoordinator.process_schema_change: merge == current -> skip), so a
fresh runner instance recovers table schemas from the stream itself — the
same role Debezium's schema-history topic plays.

Sequencing: each slice owns a band ``slice_no << 41``; control records sit
at the band start, data at band + 1024 + source offset. Bands keep
ordering correct even when several slices coalesce into one micro-batch
(the runner segments batches at DDL records and merges last-image by seq).

Post-DDL repair: events logged between a source-side ALTER and the export
were captured by the old triggers (images lack the new column), so after a
DDL slice the exporter emits a repair slice re-reading the touched keys
(fresh_rows_for_keys: pushed IN-predicates, or chunked scan + semi join
above the cap) — its higher band wins the keyed merge for keys still
present while slice tombstones stand.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..core.events import CreateTableEvent
from ..core.schema_evolution import apply_schema_change_event
from ..core.table_id import TableId
from ..pipeline.yaml_parser import parse_pipeline_yaml
from ..sources.envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    wrap_as_inserts,
)
from ..sources.jdbc_live import (
    JdbcLiveSource,
    JdbcLiveSourceConfig,
    fresh_rows_for_keys,
    refresh_capture,
)
from .runner import StreamingPipelineRunner
from .wire import KIND_DATA, ddl_to_dict, schema_from_dict, schema_to_dict

_BAND_SHIFT = 41  # slice band width; inner seq stays far below 2**41
_CTL_RESERVE = 1024  # control records per slice sit below data sequences

_DEFAULT_PIPELINE_YAML = """
source: {type: wire}
sink: {type: lake}
pipeline: {schema.change.behavior: EVOLVE}
"""


def envelope_to_wire(env: DataFrame, band) -> DataFrame:
    """Changelog envelope -> wire records, banded. Pure column transforms
    (to_json on the image structs), so the encode runs wherever the
    envelope's partitions live — never on the driver. ``band`` is an int
    (one band for the whole frame) or a Column (per-row band — lets a
    multi-slice export write in ONE pass)."""
    band_col = band if isinstance(band, Column) else F.lit(band)
    return env.select(
        F.lit(KIND_DATA).alias("kind"),
        F.col(ENVELOPE_TABLE_ID).alias("table_id"),
        F.col(ENVELOPE_OP).alias("op"),
        F.to_json("before").alias("before"),
        F.to_json("after").alias("after"),
        F.col(ENVELOPE_META).alias("meta"),
        (band_col + F.lit(_CTL_RESERVE) + F.col(ENVELOPE_SEQ)).alias("seq"),
        F.lit(None).cast("string").alias("ddl"),
    )


class JdbcLiveStreamBridge:
    """One live JDBC table continuously replicated through a checkpointed
    Structured Streaming pipeline (the FlinkPipelineComposer topology)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: JdbcLiveSourceConfig,
        work_root: str,
        pipeline_yaml: Optional[str] = None,
        repair_collect_cap: int = 10_000,
        runner_shuffle_partitions: Optional[int] = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.source = JdbcLiveSource(spark, cfg)
        self.table = self.source.table_id
        self.tid = TableId.parse(self.table)
        self.work = work_root
        self.src_dir = os.path.join(work_root, "wire")
        self.ckpt_dir = os.path.join(work_root, "ckpt")
        self.state_root = os.path.join(work_root, "state")
        self._meta_file = os.path.join(work_root, "export.json")
        os.makedirs(self.src_dir, exist_ok=True)
        self.pipeline = parse_pipeline_yaml(pipeline_yaml or _DEFAULT_PIPELINE_YAML)
        self.repair_collect_cap = repair_collect_cap
        # per-epoch state relations are table-snapshot-sized, not
        # corpus-sized; a caller replicating a small/medium table scopes
        # the runner's shuffle width down (None = session default, the
        # right choice when one table IS corpus-scale)
        self.runner_shuffle_partitions = runner_shuffle_partitions
        self.schema = None  # discovered lazily

    # -- export bookkeeping (control plane) --------------------------------
    def _load_meta(self) -> Optional[dict]:
        if os.path.exists(self._meta_file):
            with open(self._meta_file) as f:
                return json.load(f)
        return None

    def _store_meta(self, offset: int, slice_no: int) -> None:
        # the known schema persists WITH the offset (the reference keeps
        # schema state in checkpoints): a restarted exporter must detect
        # DDL that landed while it was down, which requires remembering
        # what the schema was at the last export, not re-discovering the
        # already-altered current one
        with open(self._meta_file, "w") as f:
            json.dump(
                {
                    "offset": offset,
                    "slice": slice_no,
                    "schema": schema_to_dict(self.schema),
                },
                f,
            )

    def _write_control(self, slice_no: int, events) -> None:
        """Tiny driver-written DDL control records (JobManager-scope
        metadata, never row data)."""
        band = slice_no << _BAND_SHIFT
        path = os.path.join(self.src_dir, f"ctl-{slice_no:08d}.json")
        with open(path, "w", encoding="utf-8") as f:
            for i, ev in enumerate(events):
                f.write(
                    json.dumps(
                        {
                            "kind": "DDL",
                            "table_id": str(ev.table_id),
                            "seq": band + i,
                            "ddl": json.dumps(ddl_to_dict(ev)),
                        }
                    )
                    + "\n"
                )

    def _export_env(self, env: DataFrame, slice_no: int) -> None:
        envelope_to_wire(env, slice_no << _BAND_SHIFT).write.mode("append").json(
            self.src_dir
        )

    def _create_event(self) -> CreateTableEvent:
        return CreateTableEvent(self.tid, self.schema)

    # -- lifecycle ---------------------------------------------------------
    def bootstrap(self) -> int:
        """Export slice 0: hybrid LW/HW snapshot + filtered tail, prefixed
        with the CREATE. Restart (meta exists) is a no-op — state, stream
        checkpoint and export offset all persist on disk."""
        meta = self._load_meta()
        if meta is not None:
            self.schema = schema_from_dict(meta["schema"])
            return 0
        self.schema = self.source.ep.discover_schema(self.cfg.table)
        hw = self.source.current_offset()
        env = self.source.read()  # startup-mode driven; INITIAL by default
        self._write_control(0, [self._create_event()])
        self._export_env(env, 0)  # the write fully materializes the read
        self.source.release_caches()
        self._store_meta(hw, 1)
        return 1

    def export_once(self) -> int:
        """One control-plane export tick: DDL diff (metadata poll), new
        log slice, post-DDL repair slice. Returns log events exported."""
        meta = self._load_meta()
        if meta is None:
            raise RuntimeError("bootstrap() first")
        offset, slice_no = int(meta["offset"]), int(meta["slice"])
        if self.schema is None:
            self.schema = schema_from_dict(meta["schema"])
        events, _ = self.source.detect_schema_changes(self.schema)
        # slice prefix: CREATE with the schema as of the previous slice —
        # widen-or-no-op for a live coordinator, schema recovery for a
        # restarted one
        ctl = [self._create_event()]
        if events:
            refresh_capture(self.source.ep, self.cfg.table)
            for ev in events:
                self.schema = apply_schema_change_event(self.schema, ev)
            ctl.extend(events)
        hw = self.source.current_offset()
        n = hw - offset
        if n <= 0 and not events:
            return 0
        self._write_control(slice_no, ctl)
        env = self.source.read_log_envelope(offset).where(
            F.col(ENVELOPE_SEQ) <= hw
        )
        self._export_env(env, slice_no)
        slice_no += 1
        if events:
            pk = self.cfg.key_column
            keys_df = env.select(
                F.coalesce(F.col(f"after.{pk}"), F.col(f"before.{pk}")).alias(pk)
            ).distinct()
            fresh = fresh_rows_for_keys(
                self.source, keys_df, pk, collect_cap=self.repair_collect_cap
            )
            if fresh is not None:
                self._write_control(slice_no, [self._create_event()])
                self._export_env(wrap_as_inserts(fresh, self.table), slice_no)
                slice_no += 1
        self._store_meta(hw, slice_no)
        return max(n, 0)

    # -- the streaming side ------------------------------------------------
    def runner(self) -> StreamingPipelineRunner:
        return StreamingPipelineRunner(
            self.spark,
            self.pipeline,
            state_root=self.state_root,
            checkpoint_dir=self.ckpt_dir,
            shuffle_partitions=self.runner_shuffle_partitions,
        )

    def process_available(self, timeout: int = 300) -> None:
        """Run the checkpointed streaming query over everything exported so
        far (availableNow) — the micro-batch analog of the continuous job;
        a long-running deployment would `.start()` the same query once."""
        self.runner().run_available(self.src_dir, timeout)

    def run_once(self, timeout: int = 300) -> int:
        """Export tick + stream drain (one poll of the continuous loop)."""
        n = self.export_once()
        self.process_available(timeout)
        return n

    def current_state(self) -> Optional[DataFrame]:
        from ..sinks.lsm_store import LsmStateStore

        return LsmStateStore(self.spark, self.state_root).read(self.table)
