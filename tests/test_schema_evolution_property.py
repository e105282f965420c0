"""Differential property suite for the schema-evolution calculus.

Randomized DDL chains (Add at random positions / Drop / Rename /
AlterType / Truncate) replay through ``apply_schema_change_event`` and
through an independent naive ordered-dict model transcribed directly
from the reference semantics (SchemaUtils.java:111-205 — the
SchemaUtilsTest / SchemaMergingUtilsTest coverage model). Merge/diff/
lenientize get algebraic properties checked against the
SchemaMergingUtils contracts (:130-500):

  * diff -> apply roundtrip: applying getSchemaDifference(before, after)
    to `before` reproduces `after` exactly whenever `after` widens
    `before` (the SchemaOperator's actual usage);
  * least-common-type is commutative and idempotent; merging never
    narrows (re-merging the same upcoming schema is a fixpoint);
  * lenientized chains are non-destructive: no column name ever
    disappears and a column's type only moves UP the widening tree.
"""

from __future__ import annotations

from hypothesis import assume, given, settings, strategies as st

from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    ColumnWithPosition,
    CreateTableEvent,
    DropColumnEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from flink_cdc_spark.core.schema import Column, Schema
from flink_cdc_spark.core.schema_evolution import (
    apply_schema_change_event,
    get_least_common_schema,
    get_least_common_type,
    get_schema_difference,
    lenientize_schema_change_event,
    merge_create_table_events,
)
from flink_cdc_spark.core.table_id import TableId

TID = TableId.parse("db.t")

SETTINGS = settings(max_examples=200, deadline=None)

# -- strategies -------------------------------------------------------------

_SIMPLE_TYPES = [
    ct.boolean(), ct.tinyint(), ct.smallint(), ct.int_(), ct.bigint(),
    ct.float_(), ct.double(), ct.string(), ct.varchar(32), ct.char(4),
    ct.date(), ct.time(0), ct.bytes_(), ct.binary(8),
]


@st.composite
def data_types(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(st.sampled_from(_SIMPLE_TYPES))
    if kind == 1:
        p = draw(st.integers(1, 38))
        s = draw(st.integers(0, p))
        return ct.decimal(p, s)
    if kind == 2:
        ctor = draw(st.sampled_from([ct.timestamp, ct.timestamp_ltz, ct.timestamp_tz]))
        return ctor(draw(st.integers(0, 9)))
    dt = draw(st.sampled_from(_SIMPLE_TYPES))
    return dt.null() if draw(st.booleans()) else dt.not_null()


_NAMES = st.sampled_from([f"c{i}" for i in range(12)])


@st.composite
def schemas(draw):
    names = draw(st.lists(_NAMES, min_size=1, max_size=6, unique=True))
    return Schema(
        columns=tuple(Column(n, draw(data_types())) for n in names),
    )


@st.composite
def ddl_chains(draw, base):
    """A list of events valid against the evolving schema, plus the naive
    model's expected final [(name, type)] list — maintained independently
    as a plain ordered list, transcribing SchemaUtils.java rule by rule."""
    model = [(c.name, c.type) for c in base.columns]
    events = []
    n_ops = draw(st.integers(1, 8))
    for _ in range(n_ops):
        op = draw(st.integers(0, 4))
        names = [n for n, _ in model]
        if op == 0:  # ADD at a random position
            new = draw(_NAMES.filter(lambda n: n not in names))
            dt = draw(data_types())
            pos = draw(st.sampled_from(list(ColumnPosition)))
            anchor = None
            if pos in (ColumnPosition.BEFORE, ColumnPosition.AFTER):
                anchor = draw(st.sampled_from(names))
            events.append(
                AddColumnEvent(TID, (ColumnWithPosition(Column(new, dt), pos, anchor),))
            )
            if pos == ColumnPosition.FIRST:
                model.insert(0, (new, dt))
            elif pos == ColumnPosition.LAST:
                model.append((new, dt))
            else:
                i = names.index(anchor)
                model.insert(i if pos == ColumnPosition.BEFORE else i + 1, (new, dt))
        elif op == 1 and len(model) > 1:  # DROP
            victim = draw(st.sampled_from(names))
            events.append(DropColumnEvent(TID, (victim,)))
            model = [(n, t) for n, t in model if n != victim]
        elif op == 2:  # RENAME
            old = draw(st.sampled_from(names))
            new = draw(_NAMES.filter(lambda n: n not in names))
            events.append(RenameColumnEvent(TID, ((old, new),)))
            model = [(new if n == old else n, t) for n, t in model]
        elif op == 3:  # ALTER TYPE
            victim = draw(st.sampled_from(names))
            dt = draw(data_types())
            events.append(AlterColumnTypeEvent(TID, ((victim, dt),)))
            model = [(n, dt if n == victim else t) for n, t in model]
        else:  # TRUNCATE: no schema effect
            events.append(TruncateTableEvent(TID))
    return events, model


# -- 1. randomized DDL chains vs the naive model ----------------------------


@given(st.data())
@SETTINGS
def test_random_ddl_chain_matches_naive_model(data):
    base = data.draw(schemas())
    events, model = data.draw(ddl_chains(base))
    schema = base
    for ev in events:
        schema = apply_schema_change_event(schema, ev)
    assert [(c.name, c.type) for c in schema.columns] == model


@given(schemas(), data_types())
@SETTINGS
def test_add_existing_column_rejected(schema, dt):
    ev = AddColumnEvent.last(TID, Column(schema.columns[0].name, dt))
    try:
        apply_schema_change_event(schema, ev)
        assert False, "expected ValueError for re-adding an existing column"
    except ValueError as e:
        assert "already exists" in str(e)


@given(schemas(), data_types())
@SETTINGS
def test_add_with_missing_anchor_rejected(schema, dt):
    names = set(schema.column_names)
    new = next(f"c{i}" for i in range(20) if f"c{i}" not in names)
    ev = AddColumnEvent(
        TID, (ColumnWithPosition(Column(new, dt), ColumnPosition.AFTER, "nope_col"),)
    )
    try:
        apply_schema_change_event(schema, ev)
        assert False, "expected ValueError for a missing anchor column"
    except ValueError as e:
        assert "does not exist" in str(e)


# -- 2. least-common-type algebra -------------------------------------------


@given(data_types(), data_types())
@SETTINGS
def test_lct_commutative(a, b):
    assert get_least_common_type(a, b) == get_least_common_type(b, a)


@given(data_types())
@SETTINGS
def test_lct_idempotent(a):
    assert get_least_common_type(a, a) == a


@given(data_types(), data_types())
@SETTINGS
def test_lct_absorbs_both_sides(a, b):
    """Merging either input INTO the merged type is a no-op — the merged
    type really is an upper bound (SchemaMergingUtilsTest's fixpoint)."""
    m = get_least_common_type(a, b)
    assert get_least_common_type(m, a) == m
    assert get_least_common_type(m, b) == m


# -- 3. schema merge / diff roundtrip ---------------------------------------


@given(schemas(), schemas())
@SETTINGS
def test_merge_then_diff_then_apply_roundtrip(current, upcoming):
    merged = get_least_common_schema(current, upcoming)
    events = get_schema_difference(TID, current, merged)
    replayed = current
    for ev in events:
        replayed = apply_schema_change_event(replayed, ev)
    assert [(c.name, c.type) for c in replayed.columns] == [
        (c.name, c.type) for c in merged.columns
    ]


@given(schemas(), schemas())
@SETTINGS
def test_merge_is_a_fixpoint(current, upcoming):
    merged = get_least_common_schema(current, upcoming)
    assert get_least_common_schema(merged, upcoming) == merged
    assert get_least_common_schema(merged, current) == merged


@given(st.lists(schemas(), min_size=1, max_size=4))
@SETTINGS
def test_route_merge_contains_every_source_column(sources):
    merged = merge_create_table_events(TID, sources)
    merged_names = set(merged.column_names)
    for s in sources:
        assert set(s.column_names) <= merged_names


# -- 4. lenientized chains are non-destructive ------------------------------


@given(st.data())
@SETTINGS
def test_lenient_chain_never_destroys_columns(data):
    base = data.draw(schemas())
    events, _ = data.draw(ddl_chains(base))
    upstream = base
    lenient = base
    for ev in events:
        upstream = apply_schema_change_event(upstream, ev)
        for lev in lenientize_schema_change_event(ev, lenient):
            lenient = apply_schema_change_event(lenient, lev)
    # every base column survives lenient-ization with its name intact
    lenient_names = set(lenient.column_names)
    for c in base.columns:
        assert c.name in lenient_names, f"lenient evolution lost {c.name}"
    # every upstream-visible column exists downstream too
    for c in upstream.columns:
        assert c.name in lenient_names


@given(st.data())
@SETTINGS
def test_lenient_types_only_widen(data):
    base = data.draw(schemas())
    events, _ = data.draw(ddl_chains(base))
    lenient = base
    for ev in events:
        nxt = lenient
        for lev in lenientize_schema_change_event(ev, lenient):
            nxt = apply_schema_change_event(nxt, lev)
        for c in lenient.columns:
            after = nxt.get_column(c.name)
            assert after is not None
            # widening only: merging the old type into the new is a no-op
            assert get_least_common_type(after.type, c.type) == after.type, (
                f"{c.name}: {c.type} -> {after.type} is not a widening"
            )
        lenient = nxt


# -- 5. CreateTable replaces wholesale --------------------------------------


@given(schemas(), schemas())
@SETTINGS
def test_create_table_replaces_schema(a, b):
    assert apply_schema_change_event(a, CreateTableEvent(TID, b)) == b


# -- 6. redundancy check: apply -> re-deliver is a skip ---------------------


@given(st.data())
@SETTINGS
def test_applied_events_are_redundant_on_redelivery(data):
    """After applying any event, re-checking it against the new schema
    reports redundant (SchemaUtils.isSchemaChangeEventRedundant:323-410)
    — the exactly-once contract for restart re-delivery."""
    from flink_cdc_spark.core.schema_evolution import (
        is_schema_change_event_redundant,
    )

    base = data.draw(schemas())
    events, _ = data.draw(ddl_chains(base))
    schema = base
    for ev in events:
        before = schema
        schema = apply_schema_change_event(schema, ev)
        if isinstance(ev, TruncateTableEvent):
            continue  # truncate is never provably applied
        assert is_schema_change_event_redundant(schema, ev), (
            f"{ev} not redundant after applying to {before}"
        )
        # and a redundant event must not have been skippable BEFORE apply
        # unless it was a genuine no-op (schema unchanged)
        if is_schema_change_event_redundant(before, ev):
            assert schema == before


@given(schemas())
@SETTINGS
def test_duplicate_create_table_is_skipped_by_coordinator(schema):
    """Duplicate CreateTableEvents (parallel snapshot waves) must not
    double-append schema versions (SchemaCoordinator.java:372-380)."""
    from flink_cdc_spark.core.router import TableIdRouter
    from flink_cdc_spark.pipeline.schema_coordinator import SchemaCoordinator

    coord = SchemaCoordinator(router=TableIdRouter([]))
    ev = CreateTableEvent(TID, schema)
    first = coord.process_schema_change(ev)
    assert len(first) == 1
    again = coord.process_schema_change(ev)
    assert again == []
    assert len(coord.original_schemas[TID]) == 1
