"""MySQL binlog segments -> checkpointed Structured Streaming pipeline.

The streaming counterpart of the batch binlog replay: each binlog
SEGMENT file becomes one wire band, its in-stream DDL (QUERY events,
parsed by the shared DDL parser) becomes the band's control records, and
row events decode with the schema CURRENT within that band — so a
mid-stream ALTER TABLE flows through the runner exactly like the live
JDBC bridge's metadata-diff DDL does. Segment = micro-batch unit is also
how MySQL itself shards the log (rotation at max_binlog_size).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import SparkSession, Window, functions as F

from ..core.schema_evolution import apply_schema_change_event
from ..pipeline.yaml_parser import parse_pipeline_yaml
from ..sources.envelope import ENVELOPE_SEQ
from ..sources.mysql_source import MySqlBinaryBinlogDecoder
from ..streaming.wire import ddl_to_dict
from .live_bridge import _BAND_SHIFT, _DEFAULT_PIPELINE_YAML, envelope_to_wire
from .runner import StreamingPipelineRunner

_SEG_BAND = 30  # scan_control globalizes positions as (segment << 30) + pos


class BinlogStreamBridge:
    """Binlog segment files replayed as a schema-evolving checkpointed
    streaming pipeline (all tables the stream's DDL declares)."""

    def __init__(
        self,
        spark: SparkSession,
        binlog_glob: str,
        work_root: str,
        pipeline_yaml: Optional[str] = None,
    ):
        self.spark = spark
        self.glob = binlog_glob
        self.src_dir = os.path.join(work_root, "wire")
        self.ckpt_dir = os.path.join(work_root, "ckpt")
        self.state_root = os.path.join(work_root, "state")
        os.makedirs(self.src_dir, exist_ok=True)
        self.pipeline = parse_pipeline_yaml(pipeline_yaml or _DEFAULT_PIPELINE_YAML)
        self.decoder = MySqlBinaryBinlogDecoder(spark)

    def export_all(self) -> dict:
        """Band DDL control records per segment + row envelopes decoded
        ONCE over the whole chain (final schema — wider-than-current
        images are harmless: the runner's from_json sees only the
        band-current columns) and split into segment bands by their
        globalized positions. Returns the final schemas by table id."""
        files = self.decoder._segment_files(self.glob)
        _, ddl_events, final_schemas = self.decoder.scan_control(self.glob)
        current: dict = {}
        for k, _path in enumerate(files):
            band = (k + 1) << _BAND_SHIFT
            lo, hi = k << _SEG_BAND, (k + 1) << _SEG_BAND
            evs = [e for pos, e in ddl_events if lo <= pos < hi]
            if not evs:
                continue
            ctl = os.path.join(self.src_dir, f"ctl-{k:08d}.json")
            with open(ctl, "w", encoding="utf-8") as fh:
                for i, ev in enumerate(evs):
                    fh.write(
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
            for ev in evs:
                key = str(ev.table_id)
                current[key] = apply_schema_change_event(current.get(key), ev)
        # one decode per table over the full chain; __seq = (globalpos<<20)+i
        # and globalpos carries the segment ordinal in its top bits
        seg_of = F.expr(
            f"CAST(shiftright({ENVELOPE_SEQ}, {20 + _SEG_BAND}) AS long)"
        )
        for tid_str, schema in current.items():
            env = self.decoder.read_envelope(
                self.glob, tid_str, schema.to_spark_struct()
            ).withColumn("__seg", seg_of)
            w = Window.partitionBy("__seg").orderBy(ENVELOPE_SEQ)
            rebased = env.withColumn(
                ENVELOPE_SEQ,
                (
                    (F.col("__seg") + 1) * F.lit(1 << _BAND_SHIFT)
                    + F.row_number().over(w)
                ).cast("long"),
            ).drop("__seg")
            envelope_to_wire(rebased, 0).write.mode("append").json(self.src_dir)
        return current

    def run(self, timeout: int = 300) -> None:
        StreamingPipelineRunner(
            self.spark,
            self.pipeline,
            state_root=self.state_root,
            checkpoint_dir=self.ckpt_dir,
        ).run_available(self.src_dir, timeout)

    def current_state(self, table_id: str):
        from ..sinks.lsm_store import LsmStateStore

        return LsmStateStore(self.spark, self.state_root).read(table_id)
