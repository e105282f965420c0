from .table_id import TableId
from .schema import Column, MetadataColumn, PhysicalColumn, Schema
from .events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnWithPosition,
    CreateTableEvent,
    DataChangeEvent,
    DropColumnEvent,
    DropTableEvent,
    FlushEvent,
    OperationType,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from .selectors import Selectors
from .router import RouteRule, TableIdRouter

__all__ = [
    "TableId",
    "Schema",
    "Column",
    "PhysicalColumn",
    "MetadataColumn",
    "OperationType",
    "DataChangeEvent",
    "SchemaChangeEvent",
    "CreateTableEvent",
    "AddColumnEvent",
    "DropColumnEvent",
    "RenameColumnEvent",
    "AlterColumnTypeEvent",
    "TruncateTableEvent",
    "DropTableEvent",
    "ColumnWithPosition",
    "FlushEvent",
    "Selectors",
    "RouteRule",
    "TableIdRouter",
]
