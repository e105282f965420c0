"""Randomized differential for the event-time temporal table join
(operators/temporal_join.py): random timestamped I/U/D dimension
changelogs (repeat updates, deletes, re-inserts — so intervals close
and reopen) and random probe streams (including probes before the
first version, at exact boundary instants, after deletes, and on
unknown/NULL keys), the engine's merge-formulation join compared
against a PER-EVENT LINEAR SCAN model: for each probe, scan every
interval of its key and take the one with valid_from <= t < valid_to.
The contract row `events_temporal_join_scd2` proves oracle parity on
the deterministic 3-epoch shape; this probes the interval-sequence
space around it."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from flink_cdc_spark.operators.scd2 import scd2_history
from flink_cdc_spark.operators.temporal_join import temporal_join
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

SEED = 0x7E4B0
BASE = datetime(2024, 3, 1)


def _random_dim_changelog(rng, n_keys, n_mutations):
    """Timestamped op list; change timestamps are strictly increasing
    (CDC commit order), at whole-minute granularity so probe-at-boundary
    collisions actually happen."""
    groups = ["gold", "silver", "bronze"]
    ops, state, dead = [], {}, []
    seq, minute = 0, 0

    def payload(k):
        return (k, rng.choice(groups), rng.randrange(100))

    for k in range(n_keys):
        p = payload(k)
        ops.append((OP_INSERT, None, p, seq, BASE + timedelta(minutes=minute)))
        seq += 1
        minute += rng.randrange(1, 4)
        state[k] = p
    for _ in range(n_mutations):
        r = rng.random()
        ts = BASE + timedelta(minutes=minute)
        minute += rng.randrange(1, 4)
        if dead and r < 0.15:
            k = rng.choice(sorted(dead)); dead.remove(k)
            p = payload(k)
            ops.append((OP_INSERT, None, p, seq, ts)); seq += 1
            state[k] = p
        elif state and r < 0.7:
            k = rng.choice(sorted(state))
            p = payload(k)
            ops.append((OP_UPDATE, state[k], p, seq, ts)); seq += 1
            state[k] = p
        elif state:
            k = rng.choice(sorted(state))
            ops.append((OP_DELETE, state[k], None, seq, ts)); seq += 1
            del state[k]; dead.append(k)
    return ops


def _env_df(spark, ops):
    def img(t):
        return None if t is None else Row(k=t[0], grp=t[1], score=t[2])

    rows = [
        Row(__table_id="t.dim", __op=op, before=img(b), after=img(a),
            __meta={"op_ts": ts.strftime("%Y-%m-%d %H:%M:%S")}, __seq=seq)
        for (op, b, a, seq, ts) in ops
    ]
    payload = "k LONG, grp STRING, score LONG"
    return spark.createDataFrame(
        rows,
        f"__table_id STRING, __op STRING, before STRUCT<{payload}>, "
        f"after STRUCT<{payload}>, __meta MAP<STRING,STRING>, __seq LONG",
    )


def _model_intervals(ops):
    """{k: [(from_ts, to_ts_or_None, grp, score, ver)]} built one op at
    a time: every event closes its key's open interval; INSERT/UPDATE
    open a new one; versions are per-key ordinals over ALL events."""
    intervals, ordinal = {}, {}
    for (op, _b, a, _seq, ts) in ops:
        k = a[0] if a is not None else _b[0]
        ordinal[k] = ordinal.get(k, 0) + 1
        ivs = intervals.setdefault(k, [])
        if ivs and ivs[-1][1] is None:
            ivs[-1] = ivs[-1][:1] + (ts,) + ivs[-1][2:]
        if op != OP_DELETE:
            ivs.append((ts, None, a[1], a[2], ordinal[k]))
    return intervals


def _model_lookup(intervals, k, ts):
    """Linear scan of the key's intervals — the naive per-event model."""
    if k is None or ts is None:
        return (None, None, None)
    for (frm, to, grp, score, ver) in intervals.get(k, []):
        if frm <= ts and (to is None or ts < to):
            return (grp, score, ver)
    return (None, None, None)


def _random_probes(rng, n_keys, ops, n_probes):
    """Probe times biased toward boundary instants: half the probes land
    EXACTLY on some change timestamp (same or another key)."""
    change_ts = [ts for (_o, _b, _a, _s, ts) in ops]
    lo, hi = min(change_ts), max(change_ts)
    span = int((hi - lo).total_seconds() // 60) + 10
    probes = []
    for i in range(n_probes):
        if rng.random() < 0.05:
            k = None
        elif rng.random() < 0.1:
            k = n_keys + rng.randrange(5)  # unknown key
        else:
            k = rng.randrange(n_keys)
        if rng.random() < 0.5:
            ts = rng.choice(change_ts)
        else:
            ts = lo + timedelta(minutes=rng.randrange(-5, span))
        probes.append((i, k, ts))
    return probes


@pytest.mark.parametrize("trial", range(4))
def test_temporal_join_matches_linear_scan_model(spark, trial):
    rng = random.Random(SEED + trial)
    n_keys = rng.randrange(6, 14)
    ops = _random_dim_changelog(rng, n_keys, rng.randrange(30, 80))
    probes = _random_probes(rng, n_keys, ops, rng.randrange(60, 150))

    history = scd2_history(
        _env_df(spark, ops), "k",
        payload_cols=["grp", "score"],
        ts_expr="CAST(__meta['op_ts'] AS TIMESTAMP)",
    )
    probe_df = spark.createDataFrame(
        [Row(pid=i, k=k, ts=ts) for (i, k, ts) in probes],
        "pid LONG, k LONG, ts TIMESTAMP",
    )
    got = {
        r.pid: (r.grp, r.score, r.valid_from_ver)
        for r in temporal_join(
            probe_df, history,
            probe_key="k", probe_ts="ts", dim_key="k",
            payload_cols=["grp", "score"],
        ).collect()
    }

    intervals = _model_intervals(ops)
    want = {i: _model_lookup(intervals, k, ts) for (i, k, ts) in probes}
    assert len(got) == len(probes)
    mismatches = {
        i: (got[i], want[i]) for i in want if got[i] != want[i]
    }
    assert not mismatches, f"trial {trial}: {len(mismatches)} diverge: " \
        f"{dict(list(mismatches.items())[:5])}"
