"""In-memory test source — the analog of the reference's values connector
(pipeline-connector-values/.../ValuesDataSourceHelper.java:80-305).

Holds a scripted sequence of events (CreateTableEvent, DataChangeEvents,
schema changes) per table and exposes:
  * the control-plane event list (for the pipeline's schema logic), and
  * the data plane as an envelope DataFrame per schema epoch.

An epoch = a run of data events under one schema version; a schema change
event closes the epoch (Spark DataFrames have fixed schemas, so each epoch
gets its own frame — SURVEY.md §1.1 "Spark mapping").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.events import (
    CreateTableEvent,
    DataChangeEvent,
    OperationType,
    SchemaChangeEvent,
)
from ..core.schema import Schema
from ..core.schema_evolution import apply_schema_change_event
from ..core.table_id import TableId
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    envelope_schema,
)


@dataclass
class Epoch:
    table_id: TableId
    schema: Schema
    data_events: list = field(default_factory=list)  # list[DataChangeEvent]


class ValuesSource:
    def __init__(self, spark: SparkSession, events):
        """events: iterable of DataChangeEvent | SchemaChangeEvent (in order)."""
        self.spark = spark
        self.events = list(events)

    def epochs(self) -> list:
        """Split the scripted event stream into per-table schema epochs."""
        schemas: dict = {}
        epochs: list = []
        open_epochs: dict = {}
        for ev in self.events:
            if isinstance(ev, SchemaChangeEvent):
                # close the open epoch for that table
                if ev.table_id in open_epochs:
                    epochs.append(open_epochs.pop(ev.table_id))
                schemas[ev.table_id] = apply_schema_change_event(
                    schemas.get(ev.table_id), ev
                )
                epochs.append(ev)  # control event stays in the stream order
            elif isinstance(ev, DataChangeEvent):
                if ev.table_id not in schemas:
                    raise ValueError(f"Data event before CreateTableEvent for {ev.table_id}")
                ep = open_epochs.get(ev.table_id)
                if ep is None:
                    ep = Epoch(ev.table_id, schemas[ev.table_id])
                    open_epochs[ev.table_id] = ep
                ep.data_events.append(ev)
            else:
                raise TypeError(f"Unsupported event {ev!r}")
        epochs.extend(open_epochs.values())
        return epochs

    def epoch_dataframe(self, epoch: Epoch, seq_start: int = 0) -> DataFrame:
        """Materialize one epoch as an envelope DataFrame."""
        payload_t = epoch.schema.to_spark_struct()
        # envelope rows: (table_id, op, before, after, meta, seq)
        rows = []
        for i, ev in enumerate(epoch.data_events):
            rows.append(
                (
                    str(ev.table_id),
                    ev.op.value,
                    ev.before,
                    ev.after,
                    dict(ev.meta) if ev.meta else {},
                    seq_start + i,
                )
            )
        # nullable payload structs inside the envelope
        nullable_payload = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in payload_t.fields]
        )
        return self.spark.createDataFrame(rows, envelope_schema(nullable_payload))
