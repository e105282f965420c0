"""PostgreSQL logical-decoding source (sources/postgres_cdc.py) against a
real postgres server. Coverage intent mirrors the reference's Postgres
connector tests (PostgresDataSourceFactoryTest / PostgresFullTypesITCase
scope, minus network).
"""

import pytest

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.envelope import wrap_as_inserts
from flink_cdc_spark.sources.postgres_cdc import (
    PostgresCdcConfig,
    PostgresCdcSource,
    PostgresServer,
    parse_test_decoding_line,
)


def test_parse_test_decoding_lines():
    tid, op, before, after = parse_test_decoding_line(
        "table public.t: INSERT: id[bigint]:1 v[text]:'a b: c' w[integer]:null"
    )
    assert (tid, op, before) == ("public.t", "INSERT", None)
    assert after == {"id": "1", "v": "a b: c", "w": None}

    tid, op, before, after = parse_test_decoding_line(
        "table public.t: UPDATE: old-key: id[bigint]:2 v[text]:'x,''y' "
        "new-tuple: id[bigint]:2 v[text]:'z'"
    )
    assert before == {"id": "2", "v": "x,'y"} and after == {"id": "2", "v": "z"}

    tid, op, before, after = parse_test_decoding_line(
        "table public.t: DELETE: id[bigint]:3 v[text]:'q'"
    )
    assert op == "DELETE" and after is None and before["id"] == "3"

    assert parse_test_decoding_line("BEGIN 123") is None
    assert parse_test_decoding_line("COMMIT 123") is None


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    root = tmp_path_factory.mktemp("pg")
    srv = PostgresServer(str(root / "srv"))
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture()
def items(pg):
    pg.sql("DROP TABLE IF EXISTS items")
    pg.sql(
        "SELECT pg_drop_replication_slot(slot_name) FROM pg_replication_slots "
        "WHERE slot_name = 'cdc_slot'"
    )
    pg.sql("CREATE TABLE items (id bigint primary key, name text, val double precision)")
    pg.sql("ALTER TABLE items REPLICA IDENTITY FULL")
    pg.sql("INSERT INTO items SELECT g, 'n'||g, g*1.5 FROM generate_series(1,40) g")
    return pg


def test_discovery(spark, items):
    src = PostgresCdcSource(spark, items, PostgresCdcConfig(table="items", key_column="id"))
    assert "public.items" in [str(t) for t in src.discover_tables()]
    assert [str(t) for t in src.discover_tables(selectors=r"public.it\.*")] == [
        "public.items"
    ]
    s = src.discover_schema()
    assert [(c.name, c.type.root) for c in s.columns] == [
        ("id", "BIGINT"), ("name", "VARCHAR"), ("val", "DOUBLE"),
    ]
    assert s.primary_keys == ("id",)


def test_chunked_snapshot_plus_slot_replay(spark, items, tmp_path):
    src = PostgresCdcSource(
        spark, items, PostgresCdcConfig(table="items", key_column="id", chunk_size=10)
    )
    src.create_slot()
    items.sql("UPDATE items SET val = val + 100 WHERE id % 4 = 1")
    items.sql("DELETE FROM items WHERE id % 10 = 6")
    items.sql("INSERT INTO items VALUES (99, 'late', 0.5)")

    snap = src.snapshot(str(tmp_path / "snap"))
    assert snap.rdd.getNumPartitions() > 1  # chunked COPY files
    env = src.read_changes()  # peek: repeatable
    assert env.count() == env.count()

    base = wrap_as_inserts(snap, "public.items")
    env = env.withColumn("__seq", env["__seq"] + (1 << 40))
    final = materialize_changelog(base.unionByName(env), ["id"])
    rows = {r.id: (r.name, r.val) for r in final.collect()}
    expected = {
        int(r["id"]): (r["name"], float(r["val"]))
        for r in items.rows("SELECT id, name, val FROM items")
    }
    assert rows == expected
    assert rows[1] == ("n1", 101.5) and 6 not in rows and rows[99] == ("late", 0.5)


def test_cli_postgres_source(spark, items, tmp_path):
    """YAML postgres source -> transform -> parquet sink via run_pipeline."""
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    src = PostgresCdcSource(spark, items, PostgresCdcConfig(table="items", key_column="id"))
    src.create_slot()
    items.sql("UPDATE items SET name = 'renamed' WHERE id = 1")
    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: postgres
  pgdata: {items.root}
  tables: public.items
sink:
  type: parquet
  path: {out}
transform:
  - source-table: public.items
    projection: id, UPPER(name) AS uname
    filter: id <= 5
pipeline:
  name: pg-e2e
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "public.items"))
    assert written.columns == ["id", "uname"]
    rows = {r.id: r.uname for r in written.collect()}
    assert rows == {1: "RENAMED", 2: "N2", 3: "N3", 4: "N4", 5: "N5"}


def test_get_changes_consumes_slot(spark, items, tmp_path):
    src = PostgresCdcSource(spark, items, PostgresCdcConfig(table="items", key_column="id"))
    src.create_slot()
    items.sql("UPDATE items SET val = -1 WHERE id = 2")
    assert src.read_changes(peek=False).count() == 1  # consumed
    assert src.read_changes(peek=True).count() == 0  # slot drained
