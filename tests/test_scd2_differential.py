"""Randomized differential for SCD2 history materialization
(operators/scd2.py): random I/U/D changelogs — multiple updates per
key, deletes, and RE-INSERTS of previously deleted keys — compared
against a sequential dict model that builds the per-key version
history one op at a time. The contract row proves oracle parity on
the deterministic MutationSpec shape (at most one update + one delete
per key); this probes the op-sequence space around it, where version
ordinals climb past 2 and intervals close and reopen."""

import random

import pytest
from pyspark.sql import Row

from flink_cdc_spark.operators.scd2 import scd2_history
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

SEED = 0x5CD2


def _random_history_changelog(rng, n_keys, n_mutations):
    """Op list where keys can be updated repeatedly, deleted, and
    re-inserted. Returns (ops, histories): histories[k] = sequential
    list of (alive, payload-or-None) in event order."""
    groups = ["A", "B", "C"]
    ops, state, hist = [], {}, {}
    seq = 0

    def payload(k):
        return (k, rng.choice(groups), float(rng.choice([10, 25, 99, 250])))

    dead = []
    for k in range(n_keys):
        p = payload(k)
        ops.append((OP_INSERT, None, p, seq)); seq += 1
        state[k] = p
        hist.setdefault(k, []).append((True, p))
    for _ in range(n_mutations):
        r = rng.random()
        if dead and r < 0.15:  # re-insert a deleted key
            k = rng.choice(sorted(dead)); dead.remove(k)
            p = payload(k)
            ops.append((OP_INSERT, None, p, seq)); seq += 1
            state[k] = p
            hist[k].append((True, p))
        elif state and r < 0.75:
            k = rng.choice(sorted(state))
            p = payload(k)
            ops.append((OP_UPDATE, state[k], p, seq)); seq += 1
            state[k] = p
            hist[k].append((True, p))
        elif state:
            k = rng.choice(sorted(state))
            ops.append((OP_DELETE, state[k], None, seq)); seq += 1
            del state[k]; dead.append(k)
            hist[k].append((False, None))
    return ops, hist


def _env_df(spark, ops, table_id="t.x", cols=("k", "g", "val")):
    def img(t):
        return None if t is None else Row(**dict(zip(cols, t)))

    rows = [
        Row(__table_id=table_id, __op=op, before=img(b), after=img(a),
            __meta={}, __seq=seq)
        for (op, b, a, seq) in ops
    ]
    payload = "k LONG, g STRING, val DOUBLE"
    return spark.createDataFrame(
        rows,
        f"__table_id STRING, __op STRING, before STRUCT<{payload}>, "
        f"after STRUCT<{payload}>, __meta MAP<STRING,STRING>, __seq LONG",
    )


def _model_intervals(hist):
    """{(k, valid_from_ver): (g, val, valid_to_ver, is_current)} from
    the sequential per-key event histories."""
    out = {}
    for k, events in hist.items():
        n = len(events)
        for i, (alive, p) in enumerate(events):
            if not alive:
                continue
            frm = i + 1
            to = i + 2 if i + 1 < n else None
            out[(k, frm)] = (p[1], p[2], to, to is None)
    return out


@pytest.mark.parametrize("trial", [0, 1, 2, 3])
def test_scd2_history_vs_sequential_model(spark, trial):
    rng = random.Random(SEED + trial)
    ops, hist = _random_history_changelog(rng, n_keys=30, n_mutations=80)
    env = _env_df(spark, ops)
    got = {
        (r.k, r.valid_from_ver): (r.g, r.val, r.valid_to_ver, r.is_current)
        for r in scd2_history(env, "k", payload_cols=["g", "val"]).collect()
    }
    assert got == _model_intervals(hist)


def test_scd2_deleted_key_has_no_current_row(spark):
    ops = [
        (OP_INSERT, None, (1, "A", 10.0), 0),
        (OP_UPDATE, (1, "A", 10.0), (1, "B", 20.0), 1),
        (OP_DELETE, (1, "B", 20.0), None, 2),
    ]
    rows = scd2_history(_env_df(spark, ops), "k",
                        payload_cols=["g", "val"]).collect()
    assert {(r.valid_from_ver, r.valid_to_ver, r.is_current) for r in rows} == {
        (1, 2, False),
        (2, 3, False),  # closed by the DELETE, which emits no row itself
    }
