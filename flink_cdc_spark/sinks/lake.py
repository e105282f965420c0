"""Lake-table sink: CDC MERGE statement + DDL generation.

The Spark mapping of the reference's lake sinks
(pipeline-connector-paimon/.../PaimonMetadataApplier.java, iceberg/hudi
modules): data events become one `MERGE INTO` per micro-batch keyed on the
primary key, schema events become `ALTER TABLE` DDL executed by a
MetadataApplier analog with accepted-type filtering
(common/sink/MetadataApplier.java:33-39).

This module generates the exact SQL; executing it requires a table format
with row-level-operation support (Delta/Iceberg/Paimon) in the session
catalog, which this runtime does not ship — `ParquetStateStore`
(streaming/runner.py) implements the same semantics for plain parquet and
is what tests/benchmarks execute. The generated statements are unit-tested
as strings; semantics are pinned by `materialize_changelog`'s oracle-gated
behavior (the MERGE below is its SQL transcription).

Batch pre-step: the source frame MUST be reduced to one row per key
(last image by __seq) before MERGE — `dedupe_last_image` does this —
because SQL MERGE forbids multiple source matches per target row.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    AlterTableCommentEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
    expand_schema_change_types,
)
from ..core.types import to_spark_type
from ..sources.envelope import ENVELOPE_OP, ENVELOPE_SEQ, OP_DELETE


def dedupe_last_image(env: DataFrame, primary_keys: Sequence[str]) -> DataFrame:
    """One row per key: the last change by __seq (MERGE precondition)."""
    keys = [
        F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__k_{k}")
        for k in primary_keys
    ]
    keyed = env.select("*", *keys)
    w = Window.partitionBy(*[f"__k_{k}" for k in primary_keys]).orderBy(
        F.col(ENVELOPE_SEQ).desc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_into_sql(
    target: str,
    source_view: str,
    primary_keys: Sequence[str],
    columns: Sequence[str],
) -> str:
    """CDC apply as one MERGE: DELETE on -D, UPDATE on match, INSERT else.

    Mirrors ValuesDatabase.applyDataChangeEvent semantics
    (pipeline-connector-values/.../ValuesDatabase.java:352-390)."""
    on = " AND ".join(f"t.{k} <=> s.__k_{k}" for k in primary_keys)
    sets = ", ".join(f"t.{c} = s.after.{c}" for c in columns)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(f"s.after.{c}" for c in columns)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        f"WHEN MATCHED AND s.{ENVELOPE_OP} = '{OP_DELETE}' THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED AND s.{ENVELOPE_OP} <> '{OP_DELETE}' "
        f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def _sql_type(dt) -> str:
    return to_spark_type(dt).simpleString().upper()


def schema_change_to_ddl(table: str, event: SchemaChangeEvent) -> List[str]:
    """SchemaChangeEvent -> ALTER TABLE statements (Delta/Iceberg dialect)."""
    if isinstance(event, CreateTableEvent):
        cols = ", ".join(
            f"{c.name} {_sql_type(c.type)}" for c in event.schema.columns
        )
        return [f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING delta"]
    if isinstance(event, AddColumnEvent):
        out = []
        for cp in event.added_columns:
            pos = ""
            if cp.position == ColumnPosition.FIRST:
                pos = " FIRST"
            elif cp.position == ColumnPosition.AFTER and cp.existed_column_name:
                pos = f" AFTER {cp.existed_column_name}"
            elif cp.position == ColumnPosition.BEFORE:
                # SQL has no BEFORE; emit AFTER of the previous column is
                # sink-specific — fall back to unpositioned add
                pos = ""
            out.append(
                f"ALTER TABLE {table} ADD COLUMN {cp.column.name} "
                f"{_sql_type(cp.column.type)}{pos}"
            )
        return out
    if isinstance(event, DropColumnEvent):
        return [
            f"ALTER TABLE {table} DROP COLUMN {name}"
            for name in event.dropped_column_names
        ]
    if isinstance(event, RenameColumnEvent):
        return [
            f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}"
            for old, new in event.name_mapping
        ]
    if isinstance(event, AlterColumnTypeEvent):
        return [
            f"ALTER TABLE {table} ALTER COLUMN {name} TYPE {_sql_type(dt)}"
            for name, dt in event.type_mapping
        ]
    if isinstance(event, AlterTableCommentEvent):
        comment = (event.comment or "").replace("'", "''")
        return [f"COMMENT ON TABLE {table} IS '{comment}'"]
    if isinstance(event, TruncateTableEvent):
        return [f"TRUNCATE TABLE {table}"]
    if isinstance(event, DropTableEvent):
        return [f"DROP TABLE IF EXISTS {table}"]
    raise TypeError(f"Unsupported schema change {event!r}")


class LakeMetadataApplier:
    """MetadataApplier analog (common/sink/MetadataApplier.java:33-39):
    executes schema-change DDL on the sink catalog, honoring the
    accepted-evolution-type set."""

    def __init__(self, spark, accepted_types: Optional[Iterable[str]] = None, execute=None):
        self.spark = spark
        self.accepted = (
            expand_schema_change_types(accepted_types) if accepted_types else None
        )
        # injectable executor for testing; default runs spark.sql
        self._execute = execute or (lambda sql: self.spark.sql(sql))
        self.applied_sql: List[str] = []

    def accepts(self, event: SchemaChangeEvent) -> bool:
        if event.TYPE == "CREATE_TABLE":
            return True
        return self.accepted is None or event.TYPE in self.accepted

    def apply_schema_change(self, table: str, event: SchemaChangeEvent) -> List[str]:
        if not self.accepts(event):
            return []
        stmts = schema_change_to_ddl(table, event)
        for s in stmts:
            self._execute(s)
        self.applied_sql.extend(stmts)
        return stmts
