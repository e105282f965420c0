"""Differential property test: the Db2 ASN and SQL Server CT capture-table
decoders, fed randomized valid changelogs, must materialize to exactly the
state a naive per-key dict replay produces."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.db2_source import decode_cd_table
from flink_cdc_spark.sources.sqlserver_source import decode_cdc_table

# compact action alphabet: (key 0-4, op 0=insert/1=update/2=delete, value)
actions_strategy = st.lists(
    st.tuples(
        st.integers(0, 4), st.integers(0, 2), st.integers(0, 999)
    ),
    min_size=1,
    max_size=25,
)


def _legalize(actions):
    """Filter to a VALID history (insert only when absent, update/delete
    only when present) and compute the expected final state."""
    state, ops = {}, []
    for key, op, val in actions:
        if op == 0 and key not in state:
            state[key] = val
            ops.append(("I", key, val, None))
        elif op == 1 and key in state:
            old = state[key]
            state[key] = val
            ops.append(("U", key, val, old))
        elif op == 2 and key in state:
            ops.append(("D", key, state.pop(key), None))
    return ops, state


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(actions_strategy)
def test_db2_decode_matches_replay(spark, actions):
    ops, expect = _legalize(actions)
    if not ops:
        return
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        commit = f"{n:08d}"
        if op == "I":
            rows.append((commit, "01", "I", key, val))
        elif op == "D":
            rows.append((commit, "01", "D", key, val))
        else:  # Db2 stores an update as D(old) then I(new) in one commit
            rows.append((commit, "01", "D", key, old))
            rows.append((commit, "02", "I", key, val))
    df = spark.createDataFrame(
        rows,
        "IBMSNAP_COMMITSEQ string, IBMSNAP_INTENTSEQ string, "
        "IBMSNAP_OPERATION string, id long, val long",
    )
    env = decode_cd_table(df, "DB2INST1.T")
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect


@SETTINGS
@given(actions_strategy)
def test_sqlserver_decode_matches_replay(spark, actions):
    ops, expect = _legalize(actions)
    if not ops:
        return
    rows = []
    for n, (op, key, val, old) in enumerate(ops):
        lsn = f"{n:08d}"
        if op == "I":
            rows.append((lsn, "01", 2, key, val))
        elif op == "D":
            rows.append((lsn, "01", 1, key, val))
        else:  # CT updates: 3 = before, 4 = after, same (lsn, seqval)
            rows.append((lsn, "01", 3, key, old))
            rows.append((lsn, "01", 4, key, val))
    df = spark.createDataFrame(
        rows,
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, val long",
    )
    env = decode_cdc_table(df, "dbo.t")
    got = {r["id"]: r["val"] for r in materialize_changelog(env, ["id"]).collect()}
    assert got == expect
