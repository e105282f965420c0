"""TableId — up to three dotted parts: namespace.schemaName.tableName.

Semantics follow the reference's TableId
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/TableId.java):
1 part = table only, 2 parts = schema.table, 3 parts = namespace.schema.table.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True, order=True)
class TableId:
    namespace: str | None
    schema_name: str | None
    table_name: str

    def __post_init__(self):
        # TableIds are dict keys on every selector/router hot path; the
        # dataclass-generated hash re-tuples three strings per call, so
        # precompute it once (frozen => immutable => safe).
        object.__setattr__(
            self, "_hash", hash((self.namespace, self.schema_name, self.table_name))
        )

    def __hash__(self) -> int:
        return self._hash

    @staticmethod
    def table_id(namespace: str | None, schema_name: str | None, table_name: str) -> "TableId":
        return TableId(namespace, schema_name, table_name)

    @staticmethod
    def parse(identifier: str) -> "TableId":
        parts = identifier.split(".")
        if len(parts) == 1:
            return TableId(None, None, parts[0])
        if len(parts) == 2:
            return TableId(None, parts[0], parts[1])
        if len(parts) == 3:
            return TableId(parts[0], parts[1], parts[2])
        raise ValueError(f"Invalid TableId (expected 1-3 dot-separated parts): {identifier!r}")

    def identifier(self) -> str:
        parts = [p for p in (self.namespace, self.schema_name) if p] + [self.table_name]
        return ".".join(parts)

    def __str__(self) -> str:  # matches reference toString()
        return self.identifier()
