"""Property differential for the generation-aware rename translation
(sinks/lsm_store.py r14): random DDL sequences — renames with retired-
name REUSE and single-event swaps, adds under fresh and reused names,
drops — applied through the REAL manifest methods (no Spark needed:
the DDL path is pure file+JSON), while a truth model tracks columns by
synthetic IDENTITY (ids never rename). For every historical generation
whose columns are all still live, a writer addressing the store with
that generation's full name list must translate each name to the
current name of the SAME column id.

Name reuse can make two generations share a name set — then the writer
is indistinguishable by names alone, and the contract resolves to the
NEWEST matching generation (the right bias: streaming replay only
re-delivers the most recent batch). The truth model applies the same
resolution rule, so what this pins is that the implementation's
history matching and event-ordered translation agree with an
independent identity-tracking derivation on every unambiguous case and
on the documented bias for ambiguous ones.
"""

import json
import random

from pyspark.sql import types as T

from flink_cdc_spark.sinks.lsm_store import LsmStateStore

SEED = 0x7147
N_TRIALS = 60


def _fresh_store(tmp_path, i):
    return LsmStateStore(None, str(tmp_path / f"s{i}"))


def _seed_manifest(store, table, names):
    struct = T.StructType([T.StructField(n, T.LongType(), True) for n in names])
    m = {
        "schema": struct.json(),
        "base": None,
        "deltas": [],
        "next": 0,
        "pks": [names[0]],
        "partition_keys": [],
        "rename_log": [],
        "history": [],
    }
    store._record_history(m)
    store._store(table, m)


def test_translate_set_matches_identity_model(tmp_path):
    rng = random.Random(SEED)
    for trial in range(N_TRIALS):
        store = _fresh_store(tmp_path, trial)
        table = "db.t"
        # identity model: column id -> current name; name pool recycles
        next_id = [0]
        next_name = [0]
        retired = set()

        def fresh_name():
            if retired and rng.random() < 0.4:
                return retired.pop()
            n = f"c{next_name[0]}"
            next_name[0] += 1
            return n

        live = {}  # id -> name
        for _ in range(rng.randrange(2, 5)):
            live[next_id[0]] = fresh_name()
            next_id[0] += 1
        _seed_manifest(store, table, [live[i] for i in sorted(live)])
        # generations[g] = {id: name} snapshot
        generations = [dict(live)]

        for _ in range(rng.randrange(1, 10)):
            op = rng.random()
            if op < 0.5 and live:
                # rename event: 1..2 simultaneous pairs (2 = maybe a swap)
                ids = rng.sample(sorted(live), min(len(live),
                                                   rng.choice([1, 1, 2])))
                if len(ids) == 2 and rng.random() < 0.3:
                    mapping = [
                        (live[ids[0]], live[ids[1]]),
                        (live[ids[1]], live[ids[0]]),
                    ]
                    live[ids[0]], live[ids[1]] = live[ids[1]], live[ids[0]]
                else:
                    mapping = []
                    for i in ids:
                        old = live[i]
                        used = set(live.values())
                        new = fresh_name()
                        while new in used:
                            new = fresh_name()
                        mapping.append((old, new))
                        retired.add(old)
                        live[i] = new
                store.rename_columns(table, mapping)
            elif op < 0.8:
                store.begin_epoch(len(generations))  # each op = new epoch
                name = fresh_name()
                while name in live.values():
                    name = fresh_name()
                store.add_columns(table, [(name, T.LongType())])
                live[next_id[0]] = name
                next_id[0] += 1
            elif len(live) > 2:
                i = rng.choice(sorted(live))
                store.drop_columns(table, [live[i]])
                retired.add(live.pop(i))
            generations.append(dict(live))

        m = store._load(table)
        cur_names = {f["name"] for f in json.loads(m["schema"])["fields"]}
        assert cur_names == set(live.values()), (
            f"trial {trial}: manifest schema diverged from the model"
        )

        def expected(names):
            """The contract: a writer's name set resolves to the NEWEST
            generation containing it (name reuse makes older matches
            indistinguishable by name alone — newest-first is the
            documented bias); each name then maps to the CURRENT name of
            the column id that held it in that generation. None = a
            resolved column was since dropped (out of scope here)."""
            for gen in reversed(generations):
                by_name = {v: i for i, v in gen.items()}
                if set(names) <= set(by_name):
                    if any(by_name[n] not in live for n in names):
                        return None
                    return {n: live[by_name[n]] for n in names}
            return None

        for g, gen in enumerate(generations):
            if not gen:
                continue
            names = [gen[i] for i in sorted(gen)]
            want = expected(names)
            if want is None:
                continue
            got = store._translate_set(m, names)
            assert got == want, (
                f"trial {trial} gen {g}: writer names {names} -> {got}, "
                f"model says {want} (log={m['rename_log']})"
            )
