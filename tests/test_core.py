"""Phase-0 core tests: TableId, Selectors, TableIdRouter, schema evolution.

Mirrors the reference's pure-function unit tests (SelectorsTest,
TableIdRouterTest/TableIdRouterMatchModeTest, SchemaUtilsTest,
SchemaMergingUtilsTest — SURVEY.md §5.1.3).
"""

import pytest

from flink_cdc_spark.core import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    CreateTableEvent,
    DropColumnEvent,
    RenameColumnEvent,
    RouteRule,
    Selectors,
    TableId,
    TableIdRouter,
)
from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.events import ColumnPosition, ColumnWithPosition
from flink_cdc_spark.core.schema import Column, new_schema
from flink_cdc_spark.core.schema_evolution import (
    apply_schema_change_event,
    get_least_common_schema,
    get_least_common_type,
    get_schema_difference,
    lenientize_schema_change_event,
    merge_create_table_events,
)


# -- TableId ----------------------------------------------------------------


def test_table_id_parse_roundtrip():
    assert TableId.parse("db.tbl") == TableId(None, "db", "tbl")
    assert TableId.parse("ns.db.tbl") == TableId("ns", "db", "tbl")
    assert TableId.parse("tbl") == TableId(None, None, "tbl")
    assert str(TableId.parse("ns.db.tbl")) == "ns.db.tbl"
    with pytest.raises(ValueError):
        TableId.parse("a.b.c.d")


# -- Selectors ----------------------------------------------------------------


def test_selectors_basic():
    s = Selectors("db.tbl1, db.tbl2")
    assert s.is_match(TableId.parse("db.tbl1"))
    assert s.is_match(TableId.parse("db.tbl2"))
    assert not s.is_match(TableId.parse("db.tbl3"))


def test_selectors_regex_and_dot_separator():
    # unescaped dot = separator; \.* = regex ".*"
    s = Selectors(r"mydb.\.*")
    assert s.is_match(TableId.parse("mydb.orders"))
    assert s.is_match(TableId.parse("mydb.anything"))
    assert not s.is_match(TableId.parse("otherdb.orders"))


def test_selectors_case_insensitive_full_match():
    s = Selectors("MyDb.Orders")
    assert s.is_match(TableId.parse("mydb.orders"))
    # full-match, not substring
    assert not s.is_match(TableId.parse("mydb.orders2"))


def test_selectors_three_part():
    s = Selectors(r"ns.sch.\.*")
    assert s.is_match(TableId.parse("ns.sch.t1"))
    assert not s.is_match(TableId.parse("ns.other.t1"))


# -- TableIdRouter ------------------------------------------------------------


def test_router_simple_rename():
    r = TableIdRouter([RouteRule("db.tbl", "sink_db.sink_tbl")])
    assert r.route(TableId.parse("db.tbl")) == [TableId.parse("sink_db.sink_tbl")]


def test_router_no_match_passthrough():
    r = TableIdRouter([RouteRule("db.tbl", "sink.t")])
    assert r.route(TableId.parse("other.t")) == [TableId.parse("other.t")]


def test_router_merge_n_to_1():
    r = TableIdRouter([RouteRule(r"db.shard_\.*", "sink.merged")])
    assert r.route(TableId.parse("db.shard_1")) == [TableId.parse("sink.merged")]
    assert r.route(TableId.parse("db.shard_2")) == [TableId.parse("sink.merged")]


def test_router_fanout_all_match():
    rules = [RouteRule("db.tbl", "sink.a"), RouteRule(r"db.\.*", "sink.b")]
    r = TableIdRouter(rules, TableIdRouter.ALL_MATCH)
    assert r.route(TableId.parse("db.tbl")) == [
        TableId.parse("sink.a"),
        TableId.parse("sink.b"),
    ]


def test_router_first_match():
    rules = [RouteRule("db.tbl", "sink.a"), RouteRule(r"db.\.*", "sink.b")]
    r = TableIdRouter(rules, TableIdRouter.FIRST_MATCH)
    assert r.route(TableId.parse("db.tbl")) == [TableId.parse("sink.a")]
    assert r.route(TableId.parse("db.other")) == [TableId.parse("sink.b")]


def test_router_replace_symbol():
    r = TableIdRouter([RouteRule(r"db.\.*", "sink.<>", replace_symbol="<>")])
    assert r.route(TableId.parse("db.orders")) == [TableId.parse("sink.orders")]


def test_router_invalid_regex_fails_at_parse():
    with pytest.raises(ValueError):
        TableIdRouter([RouteRule(r"db.\.*(", "sink.t")])


def test_router_group_by_rule():
    rules = [RouteRule(r"db.a_\.*", "sink.a"), RouteRule(r"db.b_\.*", "sink.b")]
    r = TableIdRouter(rules)
    tables = {TableId.parse("db.a_1"), TableId.parse("db.a_2"), TableId.parse("db.b_1")}
    groups = r.group_source_tables_by_rule(tables)
    assert groups[0] == {TableId.parse("db.a_1"), TableId.parse("db.a_2")}
    assert groups[1] == {TableId.parse("db.b_1")}


# -- schema evolution ---------------------------------------------------------

TID = TableId.parse("db.t")


def _base_schema():
    return (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("name", "STRING")
        .physical_column("score", "INT")
        .primary_key("id")
        .build()
    )


def test_apply_add_column_positions():
    s = _base_schema()
    c = Column("extra", ct.string())
    s2 = apply_schema_change_event(
        s, AddColumnEvent(TID, (ColumnWithPosition(c, ColumnPosition.AFTER, "id"),))
    )
    assert s2.column_names == ["id", "extra", "name", "score"]
    s3 = apply_schema_change_event(
        s, AddColumnEvent(TID, (ColumnWithPosition(c, ColumnPosition.FIRST),))
    )
    assert s3.column_names == ["extra", "id", "name", "score"]
    with pytest.raises(ValueError):
        apply_schema_change_event(
            s, AddColumnEvent(TID, (ColumnWithPosition(c, ColumnPosition.BEFORE, "nope"),))
        )


def test_apply_drop_rename_alter():
    s = _base_schema()
    s2 = apply_schema_change_event(s, DropColumnEvent(TID, ("score",)))
    assert s2.column_names == ["id", "name"]
    s3 = apply_schema_change_event(s, RenameColumnEvent(TID, (("name", "full_name"),)))
    assert s3.column_names == ["id", "full_name", "score"]
    s4 = apply_schema_change_event(s, AlterColumnTypeEvent(TID, (("score", ct.bigint()),)))
    assert s4.get_column("score").type == ct.bigint()


def test_least_common_type_lattice():
    assert get_least_common_type(ct.int_(), ct.bigint()) == ct.bigint()
    assert get_least_common_type(ct.tinyint(), ct.smallint()) == ct.smallint()
    assert get_least_common_type(ct.float_(), ct.double()) == ct.double()
    # int x double -> double
    assert get_least_common_type(ct.int_(), ct.double()) == ct.double()
    # incompatible -> string
    assert get_least_common_type(ct.boolean(), ct.int_()) == ct.string()
    # decimal merging: max integral digits + max scale
    assert get_least_common_type(ct.decimal(10, 2), ct.decimal(5, 4)) == ct.decimal(12, 4)
    # decimal x int
    assert get_least_common_type(ct.decimal(10, 2), ct.int_()) == ct.decimal(12, 2)
    # timestamps: level and precision both widen
    assert get_least_common_type(ct.timestamp(3), ct.timestamp_ltz(6)) == ct.timestamp_ltz(6)
    # nullability unions
    assert get_least_common_type(ct.int_().not_null(), ct.bigint()).nullable


def test_least_common_schema_and_difference():
    s1 = _base_schema()
    s2 = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("name", "STRING")
        .physical_column("score", "BIGINT")
        .physical_column("added", "STRING")
        .primary_key("id")
        .build()
    )
    merged = get_least_common_schema(s1, s2)
    assert merged.get_column("score").type.root == "BIGINT"
    assert merged.column_names == ["id", "name", "score", "added"]
    events = get_schema_difference(TID, s1, merged)
    kinds = {type(e) for e in events}
    assert kinds == {AlterColumnTypeEvent, AddColumnEvent}


def test_lenientize():
    s = _base_schema()
    # drop becomes no-op
    assert lenientize_schema_change_event(DropColumnEvent(TID, ("score",)), s) == []
    # rename becomes add
    evts = lenientize_schema_change_event(RenameColumnEvent(TID, (("name", "nm"),)), s)
    assert len(evts) == 1 and isinstance(evts[0], AddColumnEvent)
    assert evts[0].added_columns[0].column.name == "nm"
    # narrowing type change is ignored (no widening possible)
    evts = lenientize_schema_change_event(
        AlterColumnTypeEvent(TID, (("score", ct.smallint()),)), s
    )
    assert evts == []
    # widening type change passes through widened
    evts = lenientize_schema_change_event(
        AlterColumnTypeEvent(TID, (("score", ct.bigint()),)), s
    )
    assert evts[0].type_mapping == (("score", ct.bigint()),)


def test_merge_create_table_events():
    s1 = _base_schema()
    s2 = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("name", "STRING")
        .physical_column("score", "DOUBLE")
        .primary_key("id")
        .build()
    )
    merged = merge_create_table_events(TID, [s1, s2])
    assert merged.get_column("score").type.root == "DOUBLE"
    assert merged.primary_keys == ("id",)


def test_ensure_pk_non_null():
    s = (
        new_schema()
        .physical_column("id", "BIGINT")
        .physical_column("v", "STRING")
        .primary_key("id")
        .build()
    )
    s2 = s.ensure_pk_non_null()
    assert not s2.get_column("id").type.nullable
    assert s2.get_column("v").type.nullable


def test_spark_struct_roundtrip():
    s = _base_schema()
    struct = s.to_spark_struct()
    assert [f.name for f in struct.fields] == ["id", "name", "score"]
    assert not struct.fields[0].nullable


def test_type_system_edges():
    """Type-system edge cases (SURVEY.md §7 hard-list #4): TIME(p),
    CHAR/VARCHAR/BINARY lengths, TIMESTAMP precisions, decimal defaults."""
    from flink_cdc_spark.core.types import from_spark_type, parse_type, to_spark_type
    from pyspark.sql import types as T

    t = parse_type("TIME(3)")
    assert t.precision == 3
    # TIME has no Spark native: carried as integer millis-of-day
    assert isinstance(to_spark_type(t), T.IntegerType)

    c = parse_type("CHAR(5)")
    assert c.length == 5
    assert isinstance(to_spark_type(c), T.StringType)

    vb = parse_type("VARBINARY(16)")
    assert vb.length == 16
    assert isinstance(to_spark_type(vb), T.BinaryType)

    ts = parse_type("TIMESTAMP(9)")
    assert ts.precision == 9
    assert isinstance(to_spark_type(ts), T.TimestampNTZType)

    ltz = parse_type("TIMESTAMP_LTZ")
    assert isinstance(to_spark_type(ltz), T.TimestampType)

    dec = parse_type("DECIMAL")
    assert (dec.precision, dec.scale) == (10, 0)

    nn = parse_type("VARCHAR(10) NOT NULL")
    assert nn.length == 10 and not nn.nullable

    # round-trip through string rendering
    for s in ["TIME(3)", "CHAR(5)", "DECIMAL(18,6)", "ARRAY<INT>", "MAP<STRING, INT>"]:
        assert parse_type(str(parse_type(s))) == parse_type(s)
