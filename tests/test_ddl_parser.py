"""SQL DDL -> SchemaChangeEvent parser (sources/ddl_parser.py).

Coverage intent mirrors CustomMySqlAntlrDdlParserTest: each mapped
statement family round-trips into the engine's event vocabulary.
"""

import pytest

from flink_cdc_spark.core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from flink_cdc_spark.sources.ddl_parser import parse_ddl, parse_ddl_statements


def test_create_table():
    ev = parse_ddl(
        "CREATE TABLE db.users (id BIGINT NOT NULL, name VARCHAR(50) COMMENT 'the name', "
        "bal DECIMAL(10,2), ts TIMESTAMP, PRIMARY KEY (id))"
    )
    assert isinstance(ev, CreateTableEvent)
    assert str(ev.table_id) == "db.users"
    s = ev.schema
    assert [c.name for c in s.columns] == ["id", "name", "bal", "ts"]
    assert s.primary_keys == ("id",)
    assert not s.get_column("id").type.nullable
    assert s.get_column("name").comment == "the name"
    assert str(s.get_column("bal").type) == "DECIMAL(10, 2)"


def test_create_table_quoted_and_if_not_exists():
    ev = parse_ddl('CREATE TABLE IF NOT EXISTS `db`.`t` (`k` INT, UNIQUE KEY uk (k))')
    assert isinstance(ev, CreateTableEvent)
    assert [c.name for c in ev.schema.columns] == ["k"]


def test_add_column_positions():
    ev = parse_ddl("ALTER TABLE db.t ADD COLUMN c INT")
    assert isinstance(ev, AddColumnEvent)
    assert ev.added_columns[0].position == ColumnPosition.LAST
    ev = parse_ddl("ALTER TABLE db.t ADD c2 DOUBLE FIRST")
    assert ev.added_columns[0].position == ColumnPosition.FIRST
    ev = parse_ddl("ALTER TABLE db.t ADD COLUMN c3 VARCHAR(10) AFTER c")
    cp = ev.added_columns[0]
    assert cp.position == ColumnPosition.AFTER and cp.existed_column_name == "c"


def test_drop_rename_change_modify():
    assert isinstance(parse_ddl("ALTER TABLE t DROP COLUMN x"), DropColumnEvent)
    ev = parse_ddl("ALTER TABLE t RENAME COLUMN a TO b")
    assert isinstance(ev, RenameColumnEvent) and ev.name_mapping == (("a", "b"),)
    ev = parse_ddl("ALTER TABLE t CHANGE a b BIGINT")
    assert isinstance(ev, RenameColumnEvent)  # MySQL CHANGE = rename
    ev = parse_ddl("ALTER TABLE t CHANGE a a BIGINT")
    assert isinstance(ev, AlterColumnTypeEvent)  # same-name CHANGE = retype
    ev = parse_ddl("ALTER TABLE t MODIFY COLUMN c DECIMAL(12,3)")
    assert isinstance(ev, AlterColumnTypeEvent)
    assert str(ev.type_mapping[0][1]) == "DECIMAL(12, 3)"
    ev = parse_ddl("ALTER TABLE t ALTER COLUMN c SET DATA TYPE BIGINT")
    assert isinstance(ev, AlterColumnTypeEvent)


def test_truncate_drop_table():
    assert isinstance(parse_ddl("TRUNCATE TABLE db.t"), TruncateTableEvent)
    assert isinstance(parse_ddl("DROP TABLE IF EXISTS db.t"), DropTableEvent)


def test_script_skips_unknown():
    events = parse_ddl_statements(
        "CREATE TABLE t (id INT, PRIMARY KEY (id)); "
        "SET foo = bar; "
        "ALTER TABLE t ADD c INT; "
        "GRANT ALL ON t TO x;"
    )
    assert [type(e).__name__ for e in events] == ["CreateTableEvent", "AddColumnEvent"]


def test_parsed_events_drive_schema_evolution():
    """Parsed DDL feeds the same evolution calculus as native events."""
    from flink_cdc_spark.core.schema_evolution import apply_schema_change_event

    s = None
    for sql in [
        "CREATE TABLE t (id BIGINT NOT NULL, v VARCHAR(10), PRIMARY KEY (id))",
        "ALTER TABLE t ADD COLUMN score DOUBLE AFTER id",
        "ALTER TABLE t RENAME COLUMN v TO label",
    ]:
        ev = parse_ddl(sql)
        if isinstance(ev, CreateTableEvent):
            s = ev.schema
        else:
            s = apply_schema_change_event(s, ev)
    assert [c.name for c in s.columns] == ["id", "score", "label"]


def test_unsupported_raises():
    with pytest.raises(ValueError):
        parse_ddl("OPTIMIZE TABLE t")
