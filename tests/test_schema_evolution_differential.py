"""Randomized differential for END-TO-END streaming schema evolution:
random interleavings of DML (I/U/D) and DDL (add-at-position / rename /
widen / drop / truncate) are wire-serialized, replayed through the
StreamingPipelineRunner (micro-batch segmentation at DDL positions,
coordinator, coercion, LSM merge), and the final materialized table is
compared against a sequential Python model that applies the same ops
one at a time with dict logic.

The scripted contract rows (streaming_pipeline_evolution,
schema_evolution_*) each prove one deterministic DDL shape; this probes
the interleaving space around them — DDL between updates to the same
key, renames of columns that still receive updates, truncate mid-stream,
adds anchored FIRST/BEFORE/AFTER — under both EVOLVE (state migrates)
and LENIENT (state keeps old columns, SchemaDerivator lenientization,
runtime/operators/schema/regular/SchemaOperator.java:150-228 +
SchemaDerivator.java:207-298). The model never touches Spark, the wire
codec, or the evolution calculus, so a shared mistake is implausible.
"""

import random

import pytest

from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    ColumnWithPosition,
    CreateTableEvent,
    DataChangeEvent,
    DropColumnEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from flink_cdc_spark.core.schema import Column, new_schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.pipeline import parse_pipeline_yaml

SEED = 0x5EED
TID = TableId.parse("db.t")


# -- random scenario ---------------------------------------------------------
#
# The generator emits abstract ops; the engine stream and the model are
# built from the SAME op list by two independent interpreters.

STRINGS = ["red", "green", "blue", "x", ""]
INTS = [0, 7, 42, 123456, -5]


def _gen_ops(rng, *, n_keys, n_mutations, n_ddl, allow, lenient):
    """Ops: ("ins",k) ("upd",k) ("del",k) ("add",name,typ,pos,anchor)
    ("ren",old,new) ("widen",name) ("drop",name) ("trunc",)."""
    ops = []
    live = set()
    next_key = [0]
    # source-side schema the generator tracks only to pick legal DDL
    cols = [("a", "STRING"), ("b", "INT")]
    names_ever = {"k", "a", "b"}
    fresh = [0]

    def fresh_name(prefix):
        fresh[0] += 1
        while f"{prefix}{fresh[0]}" in names_ever:
            fresh[0] += 1
        names_ever.add(f"{prefix}{fresh[0]}")
        return f"{prefix}{fresh[0]}"

    def data_op():
        if live and rng.random() < 0.45:
            k = rng.choice(sorted(live))
            if rng.random() < 0.6:
                ops.append(("upd", k))
            else:
                ops.append(("del", k))
                live.discard(k)
        else:
            k = next_key[0]
            next_key[0] += 1
            ops.append(("ins", k))
            live.add(k)

    def ddl_op():
        kind = rng.choice(allow)
        if kind == "add":
            name = fresh_name("c")
            typ = rng.choice(["STRING", "INT"])
            pos = rng.choice(list(ColumnPosition))
            anchor = rng.choice([n for n, _ in cols] + ["k"])
            if pos in (ColumnPosition.BEFORE, ColumnPosition.AFTER):
                ops.append(("add", name, typ, pos, anchor))
            else:
                ops.append(("add", name, typ, pos, None))
            idx = {
                ColumnPosition.FIRST: 0,
                ColumnPosition.LAST: len(cols),
            }.get(pos)
            if idx is None:
                # positions are relative to the FULL schema incl. pk "k";
                # the generator's cols list excludes k (always first)
                ci = [n for n, _ in cols]
                if anchor == "k":
                    idx = 0 if pos == ColumnPosition.AFTER else 0
                else:
                    idx = ci.index(anchor) + (1 if pos == ColumnPosition.AFTER else 0)
            cols.insert(idx, (name, typ))
        elif kind == "ren" and cols:
            i = rng.randrange(len(cols))
            old, typ = cols[i]
            new = fresh_name("r")
            ops.append(("ren", old, new))
            cols[i] = (new, typ)
        elif kind == "widen":
            ints = [i for i, (_, t) in enumerate(cols) if t == "INT"]
            if ints:
                i = rng.choice(ints)
                ops.append(("widen", cols[i][0]))
                cols[i] = (cols[i][0], "BIGINT")
        elif kind == "drop" and len(cols) > 1:
            i = rng.randrange(len(cols))
            ops.append(("drop", cols[i][0]))
            cols.pop(i)
        elif kind == "trunc":
            ops.append(("trunc",))

    for _ in range(n_keys):
        data_op()
    slots = sorted(rng.sample(range(n_mutations), min(n_ddl, n_mutations)))
    for i in range(n_mutations):
        if slots and i == slots[0]:
            slots.pop(0)
            ddl_op()
        data_op()
    return ops


def _value(rng, typ):
    if typ == "STRING":
        return rng.choice(STRINGS)
    return rng.choice(INTS)


# -- interpreter 1: engine events -------------------------------------------


def _to_events(ops, rng):
    """Build the engine event stream; payload tuples follow the evolving
    source schema tracked HERE (positional, pk first is NOT assumed)."""
    typ_of = {"STRING": ct.string(), "INT": ct.int_(), "BIGINT": ct.bigint()}
    schema = (
        new_schema()
        .physical_column("k", "BIGINT NOT NULL")
        .physical_column("a", "STRING")
        .physical_column("b", "INT")
        .primary_key("k")
        .build()
    )
    events = [CreateTableEvent(TID, schema)]
    cols = [("k", "BIGINT"), ("a", "STRING"), ("b", "INT")]
    stored = {}  # pk -> {source_col_name: value} (for before images)

    def image(k):
        row = stored.get(k, {})
        return tuple(k if n == "k" else row.get(n) for n, _ in cols)

    def fresh_image(k):
        vals = {n: _value(rng, t) for n, t in cols if n != "k"}
        return vals, tuple(k if n == "k" else vals[n] for n, _ in cols)

    for op in ops:
        tag = op[0]
        if tag == "ins":
            k = op[1]
            vals, after = fresh_image(k)
            events.append(DataChangeEvent.insert(TID, after))
            stored[k] = vals
        elif tag == "upd":
            k = op[1]
            before = image(k)
            vals, after = fresh_image(k)
            events.append(DataChangeEvent.update(TID, before, after))
            stored[k] = vals
        elif tag == "del":
            k = op[1]
            events.append(DataChangeEvent.delete(TID, image(k)))
            stored.pop(k, None)
        elif tag == "add":
            _, name, typ, pos, anchor = op
            events.append(
                AddColumnEvent(
                    TID,
                    (ColumnWithPosition(Column(name, typ_of[typ]), pos, anchor),),
                )
            )
            if pos == ColumnPosition.FIRST:
                cols.insert(0, (name, typ))
            elif pos == ColumnPosition.LAST:
                cols.append((name, typ))
            else:
                ci = [n for n, _ in cols]
                idx = ci.index(anchor) + (1 if pos == ColumnPosition.AFTER else 0)
                cols.insert(idx, (name, typ))
        elif tag == "ren":
            _, old, new = op
            events.append(RenameColumnEvent(TID, ((old, new),)))
            cols = [(new if n == old else n, t) for n, t in cols]
            for row in stored.values():
                if old in row:
                    row[new] = row.pop(old)
        elif tag == "widen":
            events.append(AlterColumnTypeEvent(TID, ((op[1], ct.bigint()),)))
            cols = [(n, "BIGINT" if n == op[1] else t) for n, t in cols]
        elif tag == "drop":
            events.append(DropColumnEvent(TID, (op[1],)))
            cols = [(n, t) for n, t in cols if n != op[1]]
            for row in stored.values():
                row.pop(op[1], None)
        elif tag == "trunc":
            events.append(TruncateTableEvent(TID))
            stored.clear()
    return events


# -- interpreter 2: sequential model ----------------------------------------


def _model(ops, rng, lenient):
    """Dict replay. Draws values with a SECOND rng seeded identically, so
    payload values match _to_events without sharing any code path."""
    cols = [("k", "BIGINT"), ("a", "STRING"), ("b", "INT")]  # source schema
    sink_cols = ["k", "a", "b"]  # sink schema (== source unless lenient)
    rows = {}  # pk -> {source_name_at_write_time: value}

    def fresh_vals(k):
        return {n: (k if n == "k" else _value(rng, t)) for n, t in cols}

    for op in ops:
        tag = op[0]
        if tag == "ins" or tag == "upd":
            k = op[1]
            if tag == "upd":
                pass  # before image consumed a draw? no — images reuse stored
            rows[k] = fresh_vals(k)
        elif tag == "del":
            rows.pop(op[1], None)
        elif tag == "add":
            _, name, typ, pos, anchor = op
            if pos == ColumnPosition.FIRST:
                cols.insert(0, (name, typ))
            elif pos == ColumnPosition.LAST:
                cols.append((name, typ))
            else:
                ci = [n for n, _ in cols]
                idx = ci.index(anchor) + (1 if pos == ColumnPosition.AFTER else 0)
                cols.insert(idx, (name, typ))
            if lenient:
                if pos == ColumnPosition.FIRST:
                    sink_cols.insert(0, name)
                elif pos == ColumnPosition.LAST:
                    sink_cols.append(name)
                else:
                    idx = sink_cols.index(anchor) + (
                        1 if pos == ColumnPosition.AFTER else 0
                    )
                    sink_cols.insert(idx, name)
            else:
                sink_cols = [n for n, _ in cols]
        elif tag == "ren":
            _, old, new = op
            cols = [(new if n == old else n, t) for n, t in cols]
            if lenient:
                # lenientize: ADD the new column (LAST), keep the old;
                # state rows are NOT migrated
                if new not in sink_cols:
                    sink_cols.append(new)
            else:
                sink_cols = [new if n == old else n for n in sink_cols]
                for row in rows.values():
                    if old in row:
                        row[new] = row.pop(old)
        elif tag == "widen":
            cols = [(n, "BIGINT" if n == op[1] else t) for n, t in cols]
        elif tag == "drop":
            cols = [(n, t) for n, t in cols if n != op[1]]
            if lenient:
                pass  # column survives in the sink, future rows null it
            else:
                sink_cols = [n for n in sink_cols if n != op[1]]
                for row in rows.values():
                    row.pop(op[1], None)
        elif tag == "trunc":
            rows.clear()

    out = set()
    for row in rows.values():
        out.add(tuple(row.get(c) for c in sink_cols))
    return sink_cols, out


# -- harness -----------------------------------------------------------------


def _run_engine(spark, tmp_path, events, behavior, tag):
    from flink_cdc_spark.streaming import StreamingPipelineRunner
    from flink_cdc_spark.streaming.wire import events_to_wire_lines

    lines = events_to_wire_lines(events)
    src = tmp_path / f"src_{tag}"
    src.mkdir()
    # two files at an arbitrary boundary: they may coalesce into one
    # micro-batch (ordering is by seq) or split (schema state must
    # persist across batches) — both paths are legal and exercised
    cut = max(1, len(lines) // 2)
    (src / "b0.json").write_text("\n".join(lines[:cut]) + "\n")
    (src / "b1.json").write_text("\n".join(lines[cut:]) + "\n")
    runner = StreamingPipelineRunner(
        spark,
        parse_pipeline_yaml(
            f"""
source: {{type: wire}}
sink: {{type: state}}
pipeline: {{schema.change.behavior: {behavior}}}
"""
        ),
        state_root=str(tmp_path / f"state_{tag}"),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        shuffle_partitions=4,
    )
    runner.run_available(str(src))
    return runner.state.read("db.t")


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_evolve_stream_vs_sequential_model(spark, tmp_path, trial):
    rng = random.Random(SEED + trial)
    ops = _gen_ops(
        rng, n_keys=20, n_mutations=45, n_ddl=6,
        allow=["add", "ren", "widen", "drop"] + (["trunc"] if trial == 2 else []),
        lenient=False,
    )
    events = _to_events(ops, random.Random(0xABC + trial))
    df = _run_engine(spark, tmp_path, events, "EVOLVE", trial)
    model_cols, model_rows = _model(ops, random.Random(0xABC + trial), lenient=False)
    assert df.columns == model_cols
    got = {tuple(r) for r in df.collect()}
    assert got == model_rows


@pytest.mark.parametrize("trial", [0, 1])
def test_lenient_stream_vs_sequential_model(spark, tmp_path, trial):
    rng = random.Random(SEED ^ (0xF00 + trial))
    ops = _gen_ops(
        rng, n_keys=18, n_mutations=40, n_ddl=6,
        allow=["add", "ren", "drop"], lenient=True,
    )
    events = _to_events(ops, random.Random(0xDEF + trial))
    df = _run_engine(spark, tmp_path, events, "LENIENT", trial)
    model_cols, model_rows = _model(ops, random.Random(0xDEF + trial), lenient=True)
    assert sorted(df.columns) == sorted(model_cols)
    order = [df.columns.index(c) for c in model_cols]
    got = {tuple(r[i] for i in order) for r in df.collect()}
    assert got == model_rows
