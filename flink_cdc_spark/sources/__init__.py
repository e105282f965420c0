from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    OP_REPLACE,
    OP_UPDATE,
    envelope_schema,
    is_envelope,
)
from .parquet_source import ParquetTableSource, read_table_as_changelog
from .values_source import ValuesSource

__all__ = [
    "envelope_schema",
    "is_envelope",
    "ENVELOPE_TABLE_ID",
    "ENVELOPE_OP",
    "ENVELOPE_SEQ",
    "ENVELOPE_META",
    "OP_INSERT",
    "OP_UPDATE",
    "OP_DELETE",
    "OP_REPLACE",
    "ParquetTableSource",
    "read_table_as_changelog",
    "ValuesSource",
]
