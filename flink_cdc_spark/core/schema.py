"""Schema/Column kernel.

Logical port of the reference's Schema/Column
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/schema/Schema.java:47-100,
Column.java, PhysicalColumn.java, MetadataColumn.java): a Schema is an ordered
list of Columns plus primary keys, partition keys, free-form options and a
comment. The physical representation on Spark is a StructType; this class is
the sidecar carrying what StructType can't (PKs, partition keys, options,
default-value expressions, metadata columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import types as T

from . import types as ct
from .types import DataType


@dataclass(frozen=True)
class Column:
    name: str
    type: DataType
    comment: Optional[str] = None
    default_value_expression: Optional[str] = None

    @property
    def is_physical(self) -> bool:
        return True

    def with_type(self, new_type: DataType) -> "Column":
        return replace(self, type=new_type)

    def with_name(self, new_name: str) -> "Column":
        return replace(self, name=new_name)


class PhysicalColumn(Column):
    pass


@dataclass(frozen=True)
class MetadataColumn(Column):
    """A column computed from event metadata (reference MetadataColumn.java:80),
    e.g. ``op_ts`` exposed by the MySQL source."""

    metadata_key: Optional[str] = None

    @property
    def is_physical(self) -> bool:
        return False


@dataclass(frozen=True)
class Schema:
    columns: tuple = ()  # tuple[Column, ...]
    primary_keys: tuple = ()  # tuple[str, ...]
    partition_keys: tuple = ()  # tuple[str, ...]
    options: tuple = ()  # tuple[(str, str), ...] (ordered, hashable)
    comment: Optional[str] = None

    # -- access -------------------------------------------------------------
    @property
    def column_names(self) -> list:
        return [c.name for c in self.columns]

    def get_column(self, name: str) -> Optional[Column]:
        for c in self.columns:
            if c.name == name:
                return c
        return None

    def index_of(self, name: str) -> int:
        for i, c in enumerate(self.columns):
            if c.name == name:
                return i
        raise KeyError(name)

    def options_dict(self) -> dict:
        return dict(self.options)

    # -- transformation -----------------------------------------------------
    def with_columns(self, columns) -> "Schema":
        return replace(self, columns=tuple(columns))

    def ensure_pk_non_null(self) -> "Schema":
        """Primary-key columns are forced NOT NULL after transform
        (reference PostTransformOperator.java:254)."""
        pk = set(self.primary_keys)
        return self.with_columns(
            c.with_type(c.type.not_null()) if c.name in pk else c for c in self.columns
        )

    # -- Spark bridge ---------------------------------------------------------
    def to_spark_struct(self) -> T.StructType:
        fields = []
        for c in self.columns:
            md = {}
            if c.comment:
                md["comment"] = c.comment
            if c.default_value_expression is not None:
                md["default"] = c.default_value_expression
            fields.append(
                T.StructField(c.name, ct.to_spark_type(c.type), c.type.nullable, metadata=md or None)
            )
        return T.StructType(fields)

    @staticmethod
    def from_spark_struct(
        struct: T.StructType,
        primary_keys=(),
        partition_keys=(),
        options=(),
        comment: Optional[str] = None,
    ) -> "Schema":
        cols = []
        for f in struct.fields:
            md = f.metadata or {}
            cols.append(
                Column(
                    name=f.name,
                    type=ct.from_spark_type(f.dataType, f.nullable),
                    comment=md.get("comment"),
                    default_value_expression=md.get("default"),
                )
            )
        return Schema(
            columns=tuple(cols),
            primary_keys=tuple(primary_keys),
            partition_keys=tuple(partition_keys),
            options=tuple(options if not isinstance(options, dict) else options.items()),
            comment=comment,
        )


class SchemaBuilder:
    """Schema.newBuilder() analog."""

    def __init__(self):
        self._columns: list = []
        self._primary_keys: tuple = ()
        self._partition_keys: tuple = ()
        self._options: list = []
        self._comment: Optional[str] = None

    def physical_column(self, name: str, type_, comment=None, default=None) -> "SchemaBuilder":
        if isinstance(type_, str):
            type_ = ct.parse_type(type_)
        self._columns.append(Column(name, type_, comment, default))
        return self

    def metadata_column(self, name: str, type_, metadata_key=None) -> "SchemaBuilder":
        if isinstance(type_, str):
            type_ = ct.parse_type(type_)
        self._columns.append(MetadataColumn(name, type_, metadata_key=metadata_key or name))
        return self

    def primary_key(self, *names: str) -> "SchemaBuilder":
        self._primary_keys = tuple(names)
        return self

    def partition_key(self, *names: str) -> "SchemaBuilder":
        self._partition_keys = tuple(names)
        return self

    def option(self, key: str, value: str) -> "SchemaBuilder":
        self._options.append((key, value))
        return self

    def comment(self, comment: str) -> "SchemaBuilder":
        self._comment = comment
        return self

    def build(self) -> Schema:
        return Schema(
            columns=tuple(self._columns),
            primary_keys=self._primary_keys,
            partition_keys=self._partition_keys,
            options=tuple(self._options),
            comment=self._comment,
        )


def new_schema() -> SchemaBuilder:
    return SchemaBuilder()
