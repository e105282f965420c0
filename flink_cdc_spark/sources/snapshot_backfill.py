"""Exactly-once snapshot <-> stream consistency: the LW/HW backfill
protocol.

Port of the reference's per-chunk protocol
(flink-cdc-base/.../reader/external/AbstractScanFetchTask.java:55-116):

  1. record LOW watermark (log offset) -> scan the chunk -> record HIGH
     watermark;
  2. replay the log between LW..HW restricted to the chunk's key range and
     upsert it over the scanned rows ("backfill") — the chunk output then
     reflects exactly the state at HW (normalization
     IncrementalSourceScanFetcher.java:147-193);
  3. the streaming tail drops every event at offset <= the HW of the chunk
     that covers its key (IncrementalSourceStreamFetcher), so nothing is
     applied twice and nothing is lost.

On Spark: (1) is the chunked `spark.read.jdbc` partition, (2) is one
last-image-per-key reduction over chunk ∪ backfill (`normalize_chunk`),
(3) is a broadcast range-join filter (`filter_stream_below_watermarks`).
All pieces are pure DataFrame transforms; at 1000 executors each chunk
normalizes independently (shuffle keyed by PK within chunk output only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..sinks.materialize import materialize_changelog
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    wrap_as_inserts,
)


@dataclass(frozen=True)
class ChunkWatermarks:
    """Key range (lo, hi] with the log offsets bracketing its scan."""

    lo: Optional[int]
    hi: Optional[int]
    low_watermark: int
    high_watermark: int


def _in_range(key_col, lo, hi):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (key_col > F.lit(lo))
    if hi is not None:
        cond = cond & (key_col <= F.lit(hi))
    return cond


def normalize_chunk(
    snapshot_rows: DataFrame,
    log_events: DataFrame,
    key_column: str,
    wm: ChunkWatermarks,
    table_id: str,
) -> DataFrame:
    """Exactly-once chunk output: snapshot image upserted with the LW..HW
    log slice for this key range, reduced to the state at HW, re-emitted
    as an insert-only envelope stamped at the high watermark.

    snapshot_rows: plain rows scanned from the chunk (state at ~LW..HW,
    torn arbitrarily). log_events: envelope of changes with __seq = log
    offset (any range; filtered here)."""
    snap_env = wrap_as_inserts(snapshot_rows, table_id)
    # snapshot rows sort below every backfill event: scale offsets so the
    # backfill band (LW, HW] is strictly above any snapshot sequence
    snap_env = snap_env.withColumn(ENVELOPE_SEQ, F.lit(-1) - F.col(ENVELOPE_SEQ))
    key_of = F.coalesce(
        F.col(f"after.{key_column}"), F.col(f"before.{key_column}")
    )
    backfill = log_events.where(
        (F.col(ENVELOPE_SEQ) > wm.low_watermark)
        & (F.col(ENVELOPE_SEQ) <= wm.high_watermark)
        & _in_range(key_of, wm.lo, wm.hi)
    )
    state = materialize_changelog(snap_env.unionByName(backfill), [key_column])
    out = wrap_as_inserts(state, table_id)
    return out.withColumn(ENVELOPE_SEQ, F.lit(wm.high_watermark))


def filter_stream_below_watermarks(
    stream: DataFrame,
    key_column: str,
    watermarks: Sequence[ChunkWatermarks],
    spark=None,
) -> DataFrame:
    """Drop stream events already reflected in some chunk's output: an
    event is kept iff its offset is above the HW of the chunk covering its
    key (events outside every chunk range are kept).

    The watermark table is tiny (one row per chunk) — broadcast range
    join, no shuffle of the stream."""
    spark = spark or stream.sparkSession
    wdf = spark.createDataFrame(
        [
            (w.lo, w.hi, w.high_watermark)
            for w in watermarks
        ],
        "lo BIGINT, hi BIGINT, hw BIGINT",
    )
    key_of = F.coalesce(
        F.col(f"after.{key_column}"), F.col(f"before.{key_column}")
    )
    stream_k = stream.withColumn("__bk", key_of)
    cond = (
        (F.col("lo").isNull() | (F.col("__bk") > F.col("lo")))
        & (F.col("hi").isNull() | (F.col("__bk") <= F.col("hi")))
    )
    joined = stream_k.join(F.broadcast(wdf), cond, "left")
    return (
        joined.where(F.col("hw").isNull() | (F.col(ENVELOPE_SEQ) > F.col("hw")))
        .drop("lo", "hi", "hw", "__bk")
    )


def snapshot_with_tail(
    chunks: Sequence[DataFrame],
    chunk_watermarks: Sequence[ChunkWatermarks],
    log_events: DataFrame,
    key_column: str,
    table_id: str,
    stream_from: int,
) -> DataFrame:
    """Full hybrid read: per-chunk normalized snapshots plus the filtered
    streaming tail from `stream_from` — the batch rendition of the
    hybrid-split assigner (HybridSplitAssigner.java:53)."""
    parts: List[DataFrame] = []
    for rows, wm in zip(chunks, chunk_watermarks):
        parts.append(normalize_chunk(rows, log_events, key_column, wm, table_id))
    tail = filter_stream_below_watermarks(
        log_events.where(F.col(ENVELOPE_SEQ) > stream_from),
        key_column,
        chunk_watermarks,
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(tail)
