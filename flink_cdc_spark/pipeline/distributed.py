"""Distributed-topology schema reduction.

The reference's distributed SchemaOperator/SchemaCoordinator pair
(runtime/operators/schema/distributed/) exists because a parallel-metadata
source (DataSource.isParallelMetadataSource, common/source/DataSource.java:51)
may emit different schemas for the same table from different subtasks; the
coordinator reduces them to one least-common schema before the sink sees
data. On Spark the driver already sees every partition's discovered schema,
so the whole RPC dance reduces to a fold over `get_least_common_schema` —
plus a helper that discovers per-partition payload schemas from raw JSON
payloads (one tiny `schema_of_json`-style pass, metadata-only)."""

from __future__ import annotations

from typing import Iterable, List, Optional

from pyspark.sql import DataFrame, functions as F

from ..core.schema import Schema
from ..core.schema_evolution import get_least_common_schema, merge_create_table_events
from ..core.table_id import TableId


def reduce_partition_schemas(schemas: Iterable[Schema]) -> Schema:
    """Least-common schema across subtask-discovered schemas
    (distributed SchemaCoordinator reduction)."""
    merged: Optional[Schema] = None
    for s in schemas:
        merged = get_least_common_schema(merged, s)
    if merged is None:
        raise ValueError("No schemas to reduce")
    return merged


def discover_json_payload_schemas(
    wire: DataFrame, payload_col: str = "after"
) -> List[str]:
    """Per-partition JSON payload schema discovery: each partition reports
    the Spark DDL of its inferred payload schema (the subtask-side half of
    the distributed protocol). Runs one metadata-only aggregation — the
    payload strings never leave the executors."""
    import json

    def infer(part_rows):
        keys = {}
        for r in part_rows:
            v = r[0]
            if v is None:
                continue
            try:
                obj = json.loads(v)
            except Exception:
                continue
            for k, val in obj.items():
                t = keys.get(k)
                new = (
                    "BIGINT"
                    if isinstance(val, bool) is False and isinstance(val, int)
                    else "DOUBLE"
                    if isinstance(val, float)
                    else "BOOLEAN"
                    if isinstance(val, bool)
                    else "STRING"
                )
                if t is None or (t == "BIGINT" and new == "DOUBLE"):
                    keys[k] = new
                elif t != new and {t, new} == {"BIGINT", "DOUBLE"}:
                    keys[k] = "DOUBLE"
                elif t != new:
                    keys[k] = "STRING"
        if not keys:
            return iter(())
        ddl = ", ".join(f"{k} {t}" for k, t in sorted(keys.items()))
        return iter([ddl])

    rows = (
        wire.select(payload_col)
        .rdd.mapPartitions(infer)
        .collect()
    )
    return rows


def merged_schema_for_table(table_id: str, ddl_schemas: Iterable[str]) -> Schema:
    """Fold per-partition DDL strings into one Schema (driver side)."""
    from pyspark.sql.types import StructType

    schemas = [
        Schema.from_spark_struct(StructType.fromDDL(ddl)) for ddl in ddl_schemas
    ]
    return merge_create_table_events(TableId.parse(table_id), schemas)
