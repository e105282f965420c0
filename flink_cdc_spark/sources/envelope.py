"""The changelog envelope — the DataFrame transport schema for change events.

This is the Spark representation of the reference's DataChangeEvent
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/DataChangeEvent.java:34-63):

    __table_id  STRING              namespace.schema.table
    __op        STRING              INSERT | UPDATE | DELETE | REPLACE
    before      STRUCT<payload>     null for INSERT/REPLACE
    after       STRUCT<payload>     null for DELETE
    __meta      MAP<STRING,STRING>  source metadata (op_ts, binlog pos, ...)
    __seq       BIGINT              monotone source offset for per-key ordering

Design rule (SURVEY.md §7.6): an UPDATE carries BOTH images in one row, so
before/after pairing survives any shuffle by construction; events are only
split (to -U/+U style rows) transiently inside operators that need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

ENVELOPE_TABLE_ID = "__table_id"
ENVELOPE_OP = "__op"
ENVELOPE_META = "__meta"
ENVELOPE_SEQ = "__seq"

OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OP_REPLACE = "REPLACE"

ENVELOPE_SYSTEM_COLUMNS = [ENVELOPE_TABLE_ID, ENVELOPE_OP, "before", "after", ENVELOPE_META, ENVELOPE_SEQ]


def envelope_schema(payload: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(ENVELOPE_TABLE_ID, T.StringType(), False),
            T.StructField(ENVELOPE_OP, T.StringType(), False),
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField(ENVELOPE_META, T.MapType(T.StringType(), T.StringType()), True),
            T.StructField(ENVELOPE_SEQ, T.LongType(), False),
        ]
    )


def is_envelope(df: DataFrame) -> bool:
    names = set(df.columns)
    return {ENVELOPE_TABLE_ID, ENVELOPE_OP, "before", "after", ENVELOPE_SEQ} <= names


def payload_struct(df: DataFrame) -> T.StructType:
    """The payload StructType of an envelope DataFrame."""
    for f in df.schema.fields:
        if f.name == "after":
            return f.dataType
    raise ValueError("Not an envelope DataFrame (no 'after' column)")


def wrap_as_inserts(df: DataFrame, table_id: str, seq_offset: int = 0) -> DataFrame:
    """Wrap a plain table DataFrame as an insert-only changelog envelope.

    The sequence number is derived from a monotonically increasing id —
    stable within a batch read, no shuffle introduced.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    return df.select(
        F.lit(table_id).alias(ENVELOPE_TABLE_ID),
        F.lit(OP_INSERT).alias(ENVELOPE_OP),
        F.lit(None).cast(T.StructType(df.schema.fields)).alias("before"),
        payload.alias("after"),
        F.create_map().cast("map<string,string>").alias(ENVELOPE_META),
        (F.monotonically_increasing_id() + F.lit(seq_offset)).alias(ENVELOPE_SEQ),
    )


def wrap_as_upsert_deletes(
    df: DataFrame, table_id: str, delete_col: str, seq_offset: int = 0
) -> DataFrame:
    """Wrap a plain DataFrame as a changelog envelope whose per-row op is
    DELETE where the boolean column ``delete_col`` is true and INSERT
    otherwise — the upsert/tombstone delta shape the LSM state store
    consumes (`sinks/lsm_store.py` reads the before image for deletes,
    the after image otherwise; both carry the same payload here, since a
    tombstone only needs its primary-key columns populated).

    Input contract: at most ONE row per primary key (ADVICE r15). The
    ``__seq`` assigned here is ``monotonically_increasing_id()`` — stable
    within a read but reflecting no event order across partitions — so
    if a caller passed multiple rows per key without ``batch_unique=True``
    downstream, the store's within-batch seq-dedup would pick an
    arbitrary winner. Every current caller passes pk-unique frames
    (aggregation / last-image outputs); a future multi-event-per-key
    caller must thread a real ordering column instead."""
    payload_cols = [c for c in df.columns if c != delete_col]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    return df.select(
        F.lit(table_id).alias(ENVELOPE_TABLE_ID),
        F.when(F.col(delete_col), F.lit(OP_DELETE))
        .otherwise(F.lit(OP_INSERT))
        .alias(ENVELOPE_OP),
        payload.alias("before"),
        payload.alias("after"),
        F.create_map().cast("map<string,string>").alias(ENVELOPE_META),
        (F.monotonically_increasing_id() + F.lit(seq_offset)).alias(ENVELOPE_SEQ),
    )
