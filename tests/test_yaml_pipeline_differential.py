"""Randomized differential for the END-TO-END YAML pipeline path:
random pipeline definitions — projection / filter / route drawn from
the spec-corpus vocabulary, over multi-table I/U/D changelogs — are
rendered to YAML text, parsed by the strict parser, composed by
BatchPipelineComposer, and the materialized sink tables are compared
against a sequential Python model that applies the same ops with dict
logic and evaluates the projections/filters with paired Python
lambdas.

The spec-corpus tests pin the parser and each operator in isolation;
the scripted contract rows each prove one deterministic YAML shape.
This probes the composed space around them: transform-per-table
changelogs where updates cross the filter boundary in both directions,
deletes of already-filtered rows, and N->1 route merges downstream of
identical transforms."""

import random

import pytest
from pyspark.sql import Row

from flink_cdc_spark.core.schema import Schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.pipeline import BatchPipelineComposer, parse_pipeline_yaml
from flink_cdc_spark.pipeline.composer import TableStream
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

SEED = 0xA71E

# (select-list item, python evaluator over the state tuple (k, s, v, n))
# — generated as a PAIR so both interpreters see the same expression;
# the pair table is the only shared artifact and is small enough to
# review by eye.
PROJ_ITEMS = [
    ("s AS s", lambda k, s, v, n: ("s", s)),
    ("UPPER(s) AS us", lambda k, s, v, n: ("us", s.upper())),
    ("v AS v", lambda k, s, v, n: ("v", v)),
    ("v * 2 AS dv", lambda k, s, v, n: ("dv", v * 2)),
    ("n AS n", lambda k, s, v, n: ("n", n)),
    ("n + 7 AS n7", lambda k, s, v, n: ("n7", n + 7)),
]

FILTERS = [
    ("v > 50", lambda k, s, v, n: v > 50),
    ("n % 2 = 0", lambda k, s, v, n: n % 2 == 0),
    ("s <> 'red'", lambda k, s, v, n: s != "red"),
    ("v <= 120 OR s = 'blue'", lambda k, s, v, n: v <= 120 or s == "blue"),
]

STRINGS = ["red", "green", "blue", "teal"]
VALUES = [10.0, 25.0, 60.0, 99.0, 130.0, 250.0]


def _random_changelog(rng, n_keys, n_mut, key0):
    ops, state, seq = [], {}, 0

    def payload(k):
        return (k, rng.choice(STRINGS), rng.choice(VALUES), rng.randrange(100))

    for k in range(key0, key0 + n_keys):
        p = payload(k)
        ops.append((OP_INSERT, None, p, seq)); seq += 1
        state[k] = p
    for _ in range(n_mut):
        if not state:
            break
        k = rng.choice(sorted(state))
        if rng.random() < 0.7:
            p = payload(k)
            ops.append((OP_UPDATE, state[k], p, seq)); seq += 1
            state[k] = p
        else:
            ops.append((OP_DELETE, state[k], None, seq)); seq += 1
            del state[k]
    return ops, state


def _env_df(spark, ops, table_id):
    cols = ("k", "s", "v", "n")

    def img(t):
        return None if t is None else Row(**dict(zip(cols, t)))

    rows = [
        Row(__table_id=table_id, __op=op, before=img(b), after=img(a),
            __meta={}, __seq=seq)
        for (op, b, a, seq) in ops
    ]
    payload = "k LONG, s STRING, v DOUBLE, n LONG"
    return spark.createDataFrame(
        rows,
        f"__table_id STRING, __op STRING, before STRUCT<{payload}>, "
        f"after STRUCT<{payload}>, __meta MAP<STRING,STRING>, __seq LONG",
    )


def _gen_pipeline(rng, table_ids):
    """Returns (yaml_text, proj_fns_or_None, filter_fn_or_None,
    sink_tables): one shared transform shape (so route merges stay
    schema-aligned), a coin-flipped filter, and a coin-flipped N->1
    route."""
    proj = None
    if rng.random() < 0.75:
        picked = rng.sample(PROJ_ITEMS, rng.randrange(1, len(PROJ_ITEMS) + 1))
        proj = picked
    filt = rng.choice(FILTERS) if rng.random() < 0.6 else None
    merge = rng.random() < 0.5

    lines = ["source: {type: parquet}", "sink: {type: values}"]
    if proj or filt:
        lines.append("transform:")
        for tid in table_ids:
            lines.append(f"  - source-table: {tid}")
            if proj:
                sel = ", ".join(["k"] + [sql for sql, _ in proj])
                lines.append(f"    projection: {sel}")
            if filt:
                lines.append(f"    filter: {filt[0]}")
    if merge:
        lines.append("route:")
        lines.append(r"  - source-table: db.\.*")
        lines.append("    sink-table: out.merged")
    lines.append("pipeline: {execution.runtime-mode: BATCH}")
    sinks = ["out.merged"] if merge else list(table_ids)
    return "\n".join(lines), proj, filt, sinks


def _model_rows(finals, proj, filt):
    """Apply the paired Python projection/filter to each table's final
    state; returns {table_id: set of row tuples (sorted col names)}."""
    out = {}
    for tid, state in finals.items():
        rows = set()
        for k, p in state.items():
            if filt and not filt[1](*p):
                continue
            if proj:
                cols = dict([("k", k)] + [fn(*p) for _, fn in proj])
            else:
                cols = {"k": k, "s": p[1], "v": p[2], "n": p[3]}
            rows.add(tuple(cols[c] for c in sorted(cols)))
        out[tid] = rows
    return out


@pytest.mark.parametrize("trial", [0, 1, 2, 3, 4])
def test_yaml_pipeline_vs_sequential_model(spark, trial):
    rng = random.Random(SEED + trial)
    table_ids = [f"db.t{i}" for i in range(rng.choice([2, 3]))]
    yaml_text, proj, filt, sinks = _gen_pipeline(rng, table_ids)

    streams, finals = [], {}
    for i, tid in enumerate(table_ids):
        ops, final = _random_changelog(
            rng, n_keys=rng.choice([15, 25]), n_mut=40, key0=1000 * i
        )
        env = _env_df(spark, ops, tid)
        schema = Schema.from_spark_struct(
            spark.createDataFrame(
                [], "k LONG, s STRING, v DOUBLE, n LONG"
            ).schema,
            primary_keys=("k",),
        )
        streams.append(TableStream(TableId.parse(tid), env, schema,
                                   insert_only=False))
        finals[tid] = final

    pipeline = parse_pipeline_yaml(yaml_text)
    result = BatchPipelineComposer(spark, pipeline).compose(streams)

    model = _model_rows(finals, proj, filt)
    if sinks == ["out.merged"]:
        model = {"out.merged": set().union(*model.values())}

    for sink in sinks:
        df = result.tables[sink]
        got = {
            tuple(row[c] for c in sorted(df.columns)) for row in df.collect()
        }
        assert got == model[sink], (
            f"trial {trial} sink {sink}\nyaml:\n{yaml_text}"
        )
