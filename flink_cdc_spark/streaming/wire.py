"""JSON wire format for changelog streams.

Mid-stream schema evolution is incompatible with a fixed-schema Spark
stream, so the data plane travels with JSON-encoded payload images and is
decoded per micro-batch with the schema current at that point (SURVEY.md
§1.1 "Spark mapping", option b). DDL travels in-band as control records —
the Spark analog of SchemaChangeEvents flowing in the reference's
DataStream<Event> — and the foreachBatch runner splits batches at DDL
positions (the FlushEvent barrier collapsed into micro-batch segments).

Wire record (one JSON object per line):
  {"kind":"DATA","table_id":"db.t","op":"INSERT","before":null,
   "after":"{\"k\":1}","meta":{},"seq":12}
  {"kind":"DDL","table_id":"db.t","ddl":"{\"type\":\"ADD_COLUMN\",...}","seq":13}
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
from typing import Optional

from pyspark.sql import types as T

from ..core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    AlterTableCommentEvent,
    ColumnPosition,
    ColumnWithPosition,
    CreateTableEvent,
    DataChangeEvent,
    DropColumnEvent,
    DropTableEvent,
    OperationType,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from ..core.schema import Column, MetadataColumn, Schema
from ..core.table_id import TableId
from ..core.types import parse_type

KIND_DATA = "DATA"
KIND_DDL = "DDL"

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("table_id", T.StringType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("ddl", T.StringType(), True),
    ]
)


# --------------------------------------------------------------------------
# value encoding (python -> JSON scalars that Spark's from_json re-parses)
# --------------------------------------------------------------------------


def _encode_value(v):
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return v


def _payload_json(values, schema: Schema) -> Optional[str]:
    if values is None:
        return None
    names = schema.column_names
    obj = {name: _encode_value(v) for name, v in zip(names, values)}
    return json.dumps(obj)


# --------------------------------------------------------------------------
# schema / ddl serde
# --------------------------------------------------------------------------


def schema_to_dict(schema: Schema) -> dict:
    return {
        "columns": [
            {
                "name": c.name,
                "type": str(c.type),
                "kind": "metadata" if isinstance(c, MetadataColumn) else "physical",
                "comment": c.comment,
            }
            for c in schema.columns
        ],
        "primary_keys": list(schema.primary_keys),
        "partition_keys": list(schema.partition_keys),
        "options": dict(schema.options) if schema.options else {},
        "comment": schema.comment,
    }


def schema_from_dict(d: dict) -> Schema:
    cols = []
    for c in d["columns"]:
        cls = MetadataColumn if c.get("kind") == "metadata" else Column
        cols.append(cls(c["name"], parse_type(c["type"]), c.get("comment")))
    return Schema(
        columns=tuple(cols),
        primary_keys=tuple(d.get("primary_keys", ())),
        partition_keys=tuple(d.get("partition_keys", ())),
        options=tuple((d.get("options") or {}).items()),
        comment=d.get("comment"),
    )


def ddl_to_dict(event: SchemaChangeEvent) -> dict:
    t = event.TYPE
    d: dict = {"type": t}
    if isinstance(event, CreateTableEvent):
        d["schema"] = schema_to_dict(event.schema)
    elif isinstance(event, AddColumnEvent):
        d["columns"] = [
            {
                "name": cp.column.name,
                "type": str(cp.column.type),
                "position": cp.position.value,
                "anchor": cp.existed_column_name,
            }
            for cp in event.added_columns
        ]
    elif isinstance(event, DropColumnEvent):
        d["names"] = list(event.dropped_column_names)
    elif isinstance(event, RenameColumnEvent):
        d["mapping"] = [[o, n] for o, n in event.name_mapping]
    elif isinstance(event, AlterColumnTypeEvent):
        d["types"] = [[name, str(tp)] for name, tp in event.type_mapping]
    elif isinstance(event, AlterTableCommentEvent):
        d["comment"] = event.comment
    elif isinstance(event, (TruncateTableEvent, DropTableEvent)):
        pass
    else:
        raise TypeError(f"Unsupported schema change {event!r}")
    return d


def ddl_from_dict(table_id: TableId, d: dict) -> SchemaChangeEvent:
    t = d["type"]
    if t == "CREATE_TABLE":
        return CreateTableEvent(table_id, schema_from_dict(d["schema"]))
    if t == "ADD_COLUMN":
        return AddColumnEvent(
            table_id,
            tuple(
                ColumnWithPosition(
                    Column(c["name"], parse_type(c["type"])),
                    ColumnPosition(c.get("position", "LAST")),
                    c.get("anchor"),
                )
                for c in d["columns"]
            ),
        )
    if t == "DROP_COLUMN":
        return DropColumnEvent(table_id, tuple(d["names"]))
    if t == "RENAME_COLUMN":
        return RenameColumnEvent(table_id, tuple((o, n) for o, n in d["mapping"]))
    if t == "ALTER_COLUMN_TYPE":
        return AlterColumnTypeEvent(
            table_id, tuple((name, parse_type(tp)) for name, tp in d["types"])
        )
    if t == "ALTER_TABLE_COMMENT":
        return AlterTableCommentEvent(table_id, d.get("comment", ""))
    if t == "TRUNCATE_TABLE":
        return TruncateTableEvent(table_id)
    if t == "DROP_TABLE":
        return DropTableEvent(table_id)
    raise ValueError(f"Unknown DDL type {t}")


# --------------------------------------------------------------------------
# event stream -> wire lines (test/source-side helper)
# --------------------------------------------------------------------------


def events_to_wire_lines(events, seq_start: int = 0) -> list:
    """Serialize an ordered event stream to wire JSON lines. Tracks schema
    versions so data payloads are encoded with their epoch's column list.
    seq_start keeps sequences monotone across files — files may coalesce
    into one micro-batch, and ordering is by seq."""
    schemas: dict = {}
    lines = []
    from ..core.schema_evolution import apply_schema_change_event

    for seq, ev in enumerate(events, start=seq_start):
        if isinstance(ev, SchemaChangeEvent):
            schemas[ev.table_id] = apply_schema_change_event(schemas.get(ev.table_id), ev)
            lines.append(
                json.dumps(
                    {
                        "kind": KIND_DDL,
                        "table_id": str(ev.table_id),
                        "seq": seq,
                        "ddl": json.dumps(ddl_to_dict(ev)),
                    }
                )
            )
        elif isinstance(ev, DataChangeEvent):
            schema = schemas.get(ev.table_id)
            if schema is None:
                raise ValueError(f"Data before CreateTableEvent for {ev.table_id}")
            lines.append(
                json.dumps(
                    {
                        "kind": KIND_DATA,
                        "table_id": str(ev.table_id),
                        "op": ev.op.value,
                        "before": _payload_json(ev.before, schema),
                        "after": _payload_json(ev.after, schema),
                        "meta": dict(ev.meta) if ev.meta else {},
                        "seq": seq,
                    }
                )
            )
        else:
            raise TypeError(f"Unsupported event {ev!r}")
    return lines


def write_wire_file(path: str, events, seq_start: int = 0) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for line in events_to_wire_lines(events, seq_start):
            f.write(line + "\n")
