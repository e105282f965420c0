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


# ---------------------------------------------------------------------------
# Canned event suites — parity with the reference's test-source helper
# (values/source/ValuesDataSourceHelper.java:80-305). Each returns an
# ordered event list for pipeline tests/demos.
# ---------------------------------------------------------------------------


def _suite_schema():
    from .envelope import ENVELOPE_TABLE_ID  # noqa: F401  (module coupling hint)
    from ..core.schema import new_schema

    return (
        new_schema()
        .physical_column("col1", "STRING NOT NULL")
        .physical_column("col2", "STRING")
        .primary_key("col1")
        .build()
    )


def single_split_single_table(table_id="default.default.table1"):
    """create + 3 inserts + update + delete on one table."""
    tid = TableId.parse(table_id)
    s = _suite_schema()
    return [
        CreateTableEvent(tid, s),
        DataChangeEvent.insert(tid, ("1", "1")),
        DataChangeEvent.insert(tid, ("2", "2")),
        DataChangeEvent.insert(tid, ("3", "3")),
        DataChangeEvent.update(tid, ("2", "2"), ("2", "x")),
        DataChangeEvent.delete(tid, ("3", "3")),
    ]


def single_split_multi_tables(
    table_ids=("default.default.table1", "default.default.table2")
):
    """interleaved events across N tables (one source split)."""
    out = []
    for t in table_ids:
        tid = TableId.parse(t)
        out.append(CreateTableEvent(tid, _suite_schema()))
    for i in range(1, 4):
        for t in table_ids:
            tid = TableId.parse(t)
            out.append(DataChangeEvent.insert(tid, (str(i), t.rsplit(".", 1)[-1])))
    return out


def multi_splits_single_table(table_id="default.default.table1", splits=3):
    """same table fed from several 'splits' — rows interleave arbitrarily;
    per-key ordering still holds because keys are disjoint per split."""
    tid = TableId.parse(table_id)
    out = [CreateTableEvent(tid, _suite_schema())]
    for split in range(splits):
        for i in range(2):
            key = f"{split}-{i}"
            out.append(DataChangeEvent.insert(tid, (key, key)))
    return out


def suite_with_schema_evolution(table_id="default.default.table1"):
    """the canonical evolve sequence: inserts, ADD COLUMN, RENAME, more
    inserts under the new shape."""
    from ..core.events import AddColumnEvent, RenameColumnEvent
    from ..core.schema import Column
    from ..core import types as ct

    tid = TableId.parse(table_id)
    return [
        CreateTableEvent(tid, _suite_schema()),
        DataChangeEvent.insert(tid, ("1", "1")),
        AddColumnEvent.last(tid, Column("col3", ct.string())),
        DataChangeEvent.insert(tid, ("2", "2", "c3")),
        RenameColumnEvent(tid, (("col2", "newCol2"),)),
        DataChangeEvent.insert(tid, ("3", "3", "c3b")),
    ]
