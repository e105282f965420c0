"""Chunked-parallel JDBC snapshot source.

Port of the reference's incremental-snapshot chunk splitting
(flink-cdc-base/.../assigner/splitter/JdbcSourceChunkSplitter.java:241-438):

  * evenly-sized path: when the key space is dense enough — distribution
    factor = (max - min + 1) / row_count within [lower, upper] bounds —
    chunks are arithmetic ranges of dynamic size chunk_size * factor
    (`:241-250, 422-438`);
  * unevenly-sized path: iterative `queryNextChunkMax` probing
    (`:386`), expressed here as a caller-supplied callback so the math is
    testable without a database;
  * chunk ranges are half-open (lo, hi]: first chunk (-inf, x], last
    (y, +inf) — exactly SnapshotSplit boundaries.

On Spark the chunks become `spark.read.jdbc(predicates=[...])` — one
partition per chunk, scheduled across executors by Spark itself (the
SnapshotSplitAssigner's job). The LW/HW backfill protocol
(AbstractScanFetchTask.java:55-116) applies per chunk when a streaming
tail is attached: record the log offset before/after the chunk read and
merge the replayed range over the chunk output (last-image-per-key), which
is `materialize_changelog` over chunk ∪ backfill.

Defaults mirror the reference (MySqlSourceOptions.java:104-127):
chunk_size=8096, distribution bounds [0.05, 1000].
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

DEFAULT_CHUNK_SIZE = 8096
DEFAULT_DISTRIBUTION_LOWER = 0.05
DEFAULT_DISTRIBUTION_UPPER = 1000.0


class StartupMode(enum.Enum):
    """Source startup options (flink-connector-mysql-cdc/.../table/StartupMode.java)."""

    INITIAL = "initial"                  # snapshot then stream
    EARLIEST_OFFSET = "earliest-offset"  # stream from earliest
    LATEST_OFFSET = "latest-offset"      # stream from latest
    SPECIFIC_OFFSETS = "specific-offsets"
    TIMESTAMP = "timestamp"
    SNAPSHOT = "snapshot"                # snapshot only, then stop


@dataclass(frozen=True)
class ChunkRange:
    """Half-open key range (lo, hi]; None = unbounded on that side."""

    lo: Optional[int]
    hi: Optional[int]

    def predicate(self, column: str) -> str:
        if self.lo is None and self.hi is None:
            return "1=1"
        if self.lo is None:
            return f"{column} <= {self.hi}"
        if self.hi is None:
            return f"{column} > {self.lo}"
        return f"{column} > {self.lo} AND {column} <= {self.hi}"


def distribution_factor(min_key: int, max_key: int, row_count: int) -> float:
    """(max - min + 1) / rowCount (JdbcSourceChunkSplitter.java:422-430)."""
    if row_count == 0:
        return float("inf")
    return (max_key - min_key + 1) / row_count


def split_evenly(
    min_key: int,
    max_key: int,
    row_count: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> List[ChunkRange]:
    """Arithmetic ranges with dynamic chunk size = chunk_size * factor
    (`:241-250`): each chunk covers ~chunk_size ROWS even when the key
    space is sparse."""
    if row_count <= chunk_size or min_key == max_key:
        return [ChunkRange(None, None)]
    factor = distribution_factor(min_key, max_key, row_count)
    step = max(int(chunk_size * factor), 1)
    chunks: List[ChunkRange] = []
    lo = None
    hi = min_key + step
    while hi < max_key:
        chunks.append(ChunkRange(lo, hi))
        lo, hi = hi, hi + step
    chunks.append(ChunkRange(lo, None))
    return chunks


def split_unevenly(
    min_key: int,
    max_key: int,
    query_next_chunk_max: Callable[[int, int], int],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    max_chunks: int = 1_000_000,
) -> List[ChunkRange]:
    """Iterative probing for skewed key spaces (`:386` queryNextChunkMax):
    query_next_chunk_max(inclusive_low, chunk_size) must return the
    chunk_size-th key >= inclusive_low (capped at max_key)."""
    chunks: List[ChunkRange] = []
    lo = None
    cur = min_key
    for _ in range(max_chunks):
        nxt = query_next_chunk_max(cur, chunk_size)
        if nxt >= max_key:
            break
        chunks.append(ChunkRange(lo, nxt))
        lo = nxt
        cur = nxt + 1
    chunks.append(ChunkRange(lo, None))
    return chunks


def plan_chunks(
    min_key: int,
    max_key: int,
    row_count: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    distribution_lower: float = DEFAULT_DISTRIBUTION_LOWER,
    distribution_upper: float = DEFAULT_DISTRIBUTION_UPPER,
    query_next_chunk_max: Optional[Callable[[int, int], int]] = None,
) -> List[ChunkRange]:
    """Even path when the distribution factor is within bounds, uneven
    probing otherwise (JdbcSourceChunkSplitter.java:241-268)."""
    factor = distribution_factor(min_key, max_key, row_count)
    even = distribution_lower <= factor <= distribution_upper
    if even or query_next_chunk_max is None:
        return split_evenly(min_key, max_key, row_count, chunk_size)
    return split_unevenly(min_key, max_key, query_next_chunk_max, chunk_size)


def chunk_predicates(chunks: Sequence[ChunkRange], column: str) -> List[str]:
    return [c.predicate(column) for c in chunks]


class JdbcSnapshotSource:
    """Parallel snapshot reader over JDBC using planned chunk predicates.

    Usage:
        src = JdbcSnapshotSource(spark, url, table, "id",
                                 properties={"user": ..., "password": ...})
        df = src.read(min_key, max_key, row_count)

    min/max/row_count come from a probe query (SELECT MIN(id), MAX(id),
    COUNT(*)) issued by the caller — kept outside this class so the chunk
    planning stays pure and testable without a database.
    """

    def __init__(self, spark, url: str, table: str, key_column: str, properties=None):
        self.spark = spark
        self.url = url
        self.table = table
        self.key_column = key_column
        self.properties = dict(properties or {})

    def read(
        self,
        min_key: int,
        max_key: int,
        row_count: int,
        chunk_size: int = DEFAULT_CHUNK_SIZE,
    ):
        chunks = plan_chunks(min_key, max_key, row_count, chunk_size)
        preds = chunk_predicates(chunks, self.key_column)
        return self.spark.read.jdbc(
            self.url, self.table, predicates=preds, properties=self.properties
        )
