"""Mixed-epoch randomized differential for the LSM-backed retract
machines (r15): the standard staging splits a changelog into pure
insert / update / delete epochs, so no epoch ever carries several ops
for one key. Here random changelogs are cut into contiguous RANDOM
epoch boundaries instead — one epoch can insert, update, and delete
the same key (the per-key last-image dedup decides the commit row),
reinsert a deleted key, or tombstone a key that never reached state.
Final state must equal a from-scratch recompute of the surviving rows.
"""

import random

import pytest
from pyspark.sql import Row

from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE
from flink_cdc_spark.streaming.retract_agg import (
    RetractAggregateStream,
    stage_replay_batches,
)
from flink_cdc_spark.streaming.retract_topn import RetractTopNStream

SEED = 0x51DE

_PAYLOAD = "k LONG, g STRING, val DOUBLE"


def _env_with_b(spark, ops, n_epochs, rng):
    """Assign contiguous random epoch boundaries over the seq-ordered
    ops (epochs must respect per-key seq order, so the cut points are
    positions, not random labels)."""
    cuts = sorted(rng.sample(range(1, len(ops)), n_epochs - 1))
    rows = []
    for i, (op, b, a, seq) in enumerate(ops):
        epoch = sum(1 for c in cuts if i >= c)
        img = lambda t: None if t is None else Row(k=t[0], g=t[1], val=t[2])
        rows.append(Row(__table_id="t.x", __op=op, before=img(b),
                        after=img(a), __meta={}, __seq=seq, __b=epoch))
    return spark.createDataFrame(
        rows,
        f"__table_id STRING, __op STRING, before STRUCT<{_PAYLOAD}>, "
        f"after STRUCT<{_PAYLOAD}>, __meta MAP<STRING,STRING>, "
        f"__seq LONG, __b INT",
    )


def _random_changelog(rng, n_keys=7, n_mut=30):
    """Random I/U/D history incl. delete-then-reinsert and
    insert+delete inside what may become one epoch."""
    groups = ["A", "B", "C"]
    ops, state, seq = [], {}, 0

    def payload(k):
        return (k, rng.choice(groups),
                rng.randrange(1, 400) + 0.25 * rng.randrange(4))

    for k in range(n_keys):
        p = payload(k)
        ops.append((OP_INSERT, None, p, seq)); seq += 1
        state[k] = p
    for _ in range(n_mut):
        r = rng.random()
        dead = [k for k in range(n_keys) if k not in state]
        if r < 0.2 and dead:  # reinsert a deleted key
            k = rng.choice(dead)
            p = payload(k)
            ops.append((OP_INSERT, None, p, seq)); seq += 1
            state[k] = p
        elif r < 0.7 and state:
            k = rng.choice(sorted(state))
            p = payload(k)
            ops.append((OP_UPDATE, state[k], p, seq)); seq += 1
            state[k] = p
        elif state:
            k = rng.choice(sorted(state))
            ops.append((OP_DELETE, state[k], None, seq)); seq += 1
            del state[k]
    return ops, state


def _cents(v):
    import math
    return int(math.floor(v * 100 + 0.5))


@pytest.mark.parametrize("trial", range(3))
def test_retract_agg_mixed_epochs(spark, tmp_path, trial):
    rng = random.Random(SEED + trial)
    ops, final = _random_changelog(rng)
    n_epochs = rng.randrange(2, 6)
    env = _env_with_b(spark, ops, n_epochs, rng)

    ra = RetractAggregateStream(spark, str(tmp_path / "w"), "g", "val",
                                compact_every=1 if trial % 2 else 8)
    stage_replay_batches(env, ra.active, n_batches=n_epochs)
    ra.run()

    want = {}
    for k, (kk, g, v) in final.items():
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + _cents(v))
    got = {r.grp: (r.n_rows, r.sum_cents)
           for r in ra.current_state().collect()}
    assert got == want, f"trial {trial} ({n_epochs} epochs) diverged"


@pytest.mark.parametrize("trial", range(3))
def test_retract_topn_mixed_epochs(spark, tmp_path, trial):
    rng = random.Random(SEED + 50 + trial)
    ops, final = _random_changelog(rng)
    n_epochs = rng.randrange(2, 6)
    env = _env_with_b(spark, ops, n_epochs, rng)

    tn = RetractTopNStream(spark, str(tmp_path / "w"), key="k", group="g",
                           value="val", n=2,
                           compact_every=1 if trial % 2 else 8)
    stage_replay_batches(env, tn.active, n_batches=n_epochs)
    tn.run()

    want = []
    by_g = {}
    for k, (kk, g, v) in final.items():
        by_g.setdefault(g, []).append((kk, _cents(v)))
    for g, rows in by_g.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rnk, (kk, c) in enumerate(rows[:2], start=1):
            want.append((g, rnk, kk, c))
    got = sorted((r.g, r.rnk, r.k, r.value_cents)
                 for r in tn.current_topn().collect())
    assert got == sorted(want), f"trial {trial} ({n_epochs} epochs) diverged"
