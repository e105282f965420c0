"""LW/HW backfill protocol: exactly-once chunk normalization regardless of
where the scan tore, and stream-side watermark dedup (SURVEY.md §2.3)."""

import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_spark.sources.envelope import envelope_schema
from flink_cdc_spark.sources.snapshot_backfill import (
    ChunkWatermarks,
    filter_stream_below_watermarks,
    normalize_chunk,
    snapshot_with_tail,
)

PAYLOAD = T.StructType(
    [T.StructField("k", T.LongType(), True), T.StructField("v", T.LongType(), True)]
)

N_KEYS = 40

# scripted log: offset -> (op, key, value). Touches every chunk range.
LOG = []
_off = 0
for k in range(0, N_KEYS, 3):
    _off += 1
    LOG.append((_off, "UPDATE", k, k * 100))       # update every 3rd key
for k in range(1, N_KEYS, 7):
    _off += 1
    LOG.append((_off, "DELETE", k, None))          # delete every 7th
for k in range(N_KEYS, N_KEYS + 5):
    _off += 1
    LOG.append((_off, "INSERT", k, k))             # append new keys
MAX_OFF = _off


def state_at(offset):
    """Reference implementation: dict state after applying LOG[:offset]."""
    st = {k: k for k in range(N_KEYS)}
    for off, op, k, v in LOG:
        if off > offset:
            break
        if op == "DELETE":
            st.pop(k, None)
        else:
            st[k] = v
    return st


@pytest.fixture(scope="module")
def log_env(spark):
    rows = []
    for off, op, k, v in LOG:
        if op == "INSERT":
            rows.append(("db.t", "INSERT", None, (k, v), {}, off))
        elif op == "UPDATE":
            rows.append(("db.t", "UPDATE", (k, None), (k, v), {}, off))
        else:
            rows.append(("db.t", "DELETE", (k, None), None, {}, off))
    return spark.createDataFrame(rows, envelope_schema(PAYLOAD)).cache()


def snapshot_df(spark, lo, hi, at_offset):
    """Chunk scan torn at `at_offset`: rows of state_at(at_offset) within
    (lo, hi]."""
    st = state_at(at_offset)
    rows = [
        (k, v)
        for k, v in st.items()
        if (lo is None or k > lo) and (hi is None or k <= hi)
    ]
    return spark.createDataFrame(rows, PAYLOAD)


@pytest.mark.parametrize("scan_at_fraction", [0.0, 0.5, 1.0])
def test_chunk_normalization_is_scan_point_invariant(spark, log_env, scan_at_fraction):
    """Chunk output must equal the state at HW no matter where the scan
    tore between LW and HW (AbstractScanFetchTask.java:55-116)."""
    wm = ChunkWatermarks(lo=9, hi=29, low_watermark=2, high_watermark=MAX_OFF - 3)
    scan_at = int(wm.low_watermark + scan_at_fraction * (wm.high_watermark - wm.low_watermark))
    snap = snapshot_df(spark, wm.lo, wm.hi, scan_at)
    out = normalize_chunk(snap, log_env, "k", wm, "db.t")
    got = {r.k: r.v for r in out.select("after.*").collect()}
    expect = {
        k: v for k, v in state_at(wm.high_watermark).items() if 9 < k <= 29
    }
    assert got == expect


def test_stream_filter_drops_below_chunk_hw(spark, log_env):
    wms = [
        ChunkWatermarks(None, 19, 0, 5),
        ChunkWatermarks(19, None, 0, 9),
    ]
    kept = filter_stream_below_watermarks(log_env, "k", wms)
    rows = kept.collect()
    for r in rows:
        key = (r["after"] or r["before"])["k"]
        hw = 5 if key <= 19 else 9
        assert r["__seq"] > hw
    # and nothing above the watermark was lost
    expected = sum(
        1 for off, op, k, v in LOG if off > (5 if k <= 19 else 9)
    )
    assert len(rows) == expected


def test_hybrid_snapshot_plus_tail_equals_final_state(spark, log_env):
    """End-to-end: chunked scans torn at different offsets + filtered tail
    materialize to exactly the sequential final state."""
    from flink_cdc_spark.sinks.materialize import materialize_changelog

    ranges = [(None, 9), (9, 19), (19, 29), (29, None)]
    wms, chunks = [], []
    for i, (lo, hi) in enumerate(ranges):
        lw = i  # chunks start at different log positions
        hw = min(MAX_OFF, 4 + 3 * i)
        scan_at = (lw + hw) // 2  # torn mid-way
        wms.append(ChunkWatermarks(lo, hi, lw, hw))
        chunks.append(snapshot_df(spark, lo, hi, scan_at))
    combined = snapshot_with_tail(chunks, wms, log_env, "k", "db.t", stream_from=0)
    final = materialize_changelog(combined, ["k"])
    got = {r.k: r.v for r in final.collect()}
    assert got == state_at(MAX_OFF)
