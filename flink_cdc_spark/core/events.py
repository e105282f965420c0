"""Event model: data changes, schema changes, flush barriers.

Logical port of the reference event family
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/):
DataChangeEvent.java:34-63 (op + before/after images + meta),
SchemaChangeEvent.java and its 8 subtypes, FlushEvent.java:27-41.

In the Spark engine, high-volume DataChangeEvents live as DataFrame rows in
the changelog envelope (see sources/envelope.py); these Python classes are
used for the control plane (schema changes), for test fixtures (values
source), and for driver-side inspection. FlushEvent needs no Spark analog:
micro-batch boundaries in foreachBatch are the flush barrier.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

from .schema import Column, Schema
from .table_id import TableId
from .types import DataType


class OperationType(enum.Enum):
    INSERT = "INSERT"
    UPDATE = "UPDATE"
    REPLACE = "REPLACE"
    DELETE = "DELETE"


# Changelog notation (DataChangeEvent.java:82-93 opTypeString)
OP_NOTATION = {
    OperationType.INSERT: "+I",
    OperationType.UPDATE: "+U",  # the after image; before renders as -U
    OperationType.REPLACE: "+R",
    OperationType.DELETE: "-D",
}


@dataclass(frozen=True)
class DataChangeEvent:
    table_id: TableId
    op: OperationType
    before: Optional[tuple] = None  # positional row values
    after: Optional[tuple] = None
    meta: tuple = ()  # ordered (key, value) pairs

    @staticmethod
    def insert(table_id: TableId, after, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(table_id, OperationType.INSERT, None, tuple(after), tuple(meta))

    @staticmethod
    def update(table_id: TableId, before, after, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(
            table_id, OperationType.UPDATE, tuple(before), tuple(after), tuple(meta)
        )

    @staticmethod
    def delete(table_id: TableId, before, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(table_id, OperationType.DELETE, tuple(before), None, tuple(meta))

    @staticmethod
    def replace(table_id: TableId, after, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(table_id, OperationType.REPLACE, None, tuple(after), tuple(meta))

    def route(self, new_table_id: TableId) -> "DataChangeEvent":
        """Rewrite the destination table id (DataChangeEvent.java:201-208)."""
        return DataChangeEvent(new_table_id, self.op, self.before, self.after, self.meta)


# ---------------------------------------------------------------------------
# Schema change events (8 subtypes; SchemaChangeEventType.java:88)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchemaChangeEvent:
    table_id: TableId

    TYPE = "BASE"


@dataclass(frozen=True)
class CreateTableEvent(SchemaChangeEvent):
    schema: Schema = None

    TYPE = "CREATE_TABLE"


class ColumnPosition(enum.Enum):
    FIRST = "FIRST"
    LAST = "LAST"
    BEFORE = "BEFORE"
    AFTER = "AFTER"


@dataclass(frozen=True)
class ColumnWithPosition:
    column: Column
    position: ColumnPosition = ColumnPosition.LAST
    existed_column_name: Optional[str] = None  # anchor for BEFORE/AFTER


@dataclass(frozen=True)
class AddColumnEvent(SchemaChangeEvent):
    added_columns: tuple = ()  # tuple[ColumnWithPosition, ...]

    TYPE = "ADD_COLUMN"

    @staticmethod
    def last(table_id: TableId, *columns: Column) -> "AddColumnEvent":
        return AddColumnEvent(table_id, tuple(ColumnWithPosition(c) for c in columns))


@dataclass(frozen=True)
class DropColumnEvent(SchemaChangeEvent):
    dropped_column_names: tuple = ()

    TYPE = "DROP_COLUMN"


@dataclass(frozen=True)
class RenameColumnEvent(SchemaChangeEvent):
    name_mapping: tuple = ()  # tuple[(old, new), ...]

    TYPE = "RENAME_COLUMN"


@dataclass(frozen=True)
class AlterColumnTypeEvent(SchemaChangeEvent):
    type_mapping: tuple = ()  # tuple[(name, DataType), ...]

    TYPE = "ALTER_COLUMN_TYPE"


@dataclass(frozen=True)
class AlterTableCommentEvent(SchemaChangeEvent):
    comment: str = ""

    TYPE = "ALTER_TABLE_COMMENT"


@dataclass(frozen=True)
class TruncateTableEvent(SchemaChangeEvent):
    TYPE = "TRUNCATE_TABLE"


@dataclass(frozen=True)
class DropTableEvent(SchemaChangeEvent):
    TYPE = "DROP_TABLE"


# Event-type families for include/exclude filtering
# (SchemaChangeEventTypeFamily.java:91)
SCHEMA_CHANGE_FAMILIES = {
    "column": {"ADD_COLUMN", "DROP_COLUMN", "RENAME_COLUMN", "ALTER_COLUMN_TYPE"},
    "table": {"CREATE_TABLE", "DROP_TABLE", "TRUNCATE_TABLE", "ALTER_TABLE_COMMENT"},
    "all": {
        "ADD_COLUMN",
        "DROP_COLUMN",
        "RENAME_COLUMN",
        "ALTER_COLUMN_TYPE",
        "CREATE_TABLE",
        "DROP_TABLE",
        "TRUNCATE_TABLE",
        "ALTER_TABLE_COMMENT",
    },
}


def expand_schema_change_types(specs) -> set:
    """Expand a list of type names / family names (e.g. ['column', 'table'] or
    ['add.column']) to a set of concrete TYPE strings."""
    out: set = set()
    for s in specs:
        norm = s.strip().lower().replace(".", "_")
        if norm in SCHEMA_CHANGE_FAMILIES:
            out |= SCHEMA_CHANGE_FAMILIES[norm]
        else:
            out.add(norm.upper())
    return out


@dataclass(frozen=True)
class FlushEvent:
    """Control barrier (FlushEvent.java:27-41). Only used by the in-memory
    values pipeline harness; in Spark the micro-batch boundary is the barrier."""

    source_sub_task_id: int = 0
    table_ids: tuple = ()
    schema_change_event_type: Optional[str] = None
