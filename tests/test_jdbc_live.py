"""Live JDBC source end-to-end against embedded Derby.

Coverage intent mirrors the reference's MySQL source tests
(MysqlE2eITCase / MySqlSchemaUtilsTest / JdbcTableDiscovererTest): a real
database, real DDL/DML, discovery through real metadata, capture through
real triggers, snapshot through real executor-side JDBC reads.
"""

import pytest

from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sources.jdbc_live import (
    JdbcEndpoint,
    JdbcLiveSource,
    JdbcLiveSourceConfig,
    derby_url,
    install_capture,
)
from flink_cdc_spark.sources.jdbc_snapshot import StartupMode

COLS = ["id", "name", "val"]


@pytest.fixture()
def db(spark, tmp_path):
    ep = JdbcEndpoint(spark, derby_url(str(tmp_path / "db")))
    ep.execute(
        "CREATE TABLE items (id BIGINT NOT NULL PRIMARY KEY, "
        "name VARCHAR(50), val DOUBLE)"
    )
    install_capture(ep, "items", COLS)
    ep.insert_rows("items", COLS, [(i, f"n{i}", float(i)) for i in range(1, 41)])
    yield ep, derby_url(str(tmp_path / "db"), create=False)
    ep.close()


def _source(spark, url, mode=StartupMode.INITIAL, **kw):
    cfg = JdbcLiveSourceConfig(
        url=url, table="items", key_column="id", table_id="app.items",
        chunk_size=10, snapshot_pool=2, startup_mode=mode, **kw,
    )
    return JdbcLiveSource(spark, cfg)


def _final(env):
    return {r.id: (r.name, r.val) for r in materialize_changelog(env, ["id"]).collect()}


def test_discovery_tables_and_schema(spark, db):
    ep, _ = db
    tables = ep.discover_tables()
    assert [str(t) for t in tables] == ["app.items"]
    # selector filtering (JdbcTableDiscoverer semantics)
    assert ep.discover_tables(selectors=r"app.nope") == []
    assert [str(t) for t in ep.discover_tables(selectors=r"app.it\.*")] == ["app.items"]
    s = ep.discover_schema("items")
    assert [(c.name, c.type.root) for c in s.columns] == [
        ("id", "BIGINT"), ("name", "VARCHAR"), ("val", "DOUBLE"),
    ]
    assert s.primary_keys == ("id",)
    assert not s.get_column("id").type.nullable


def test_capture_triggers_log_both_images(spark, db):
    ep, _ = db
    ep.execute_update("UPDATE items SET val = 99.0 WHERE id = 5")
    ep.execute_update("DELETE FROM items WHERE id = 6")
    rows = ep.query(
        "SELECT OP, B_ID, B_VAL, A_ID, A_VAL FROM ITEMS__CDCLOG "
        "WHERE OP <> 'I' ORDER BY SEQ"
    )
    assert rows[0] == ("U", 5, 5.0, 5, 99.0)  # update: before AND after
    assert rows[1][:3] == ("D", 6, 6.0) and rows[1][3] is None


def test_snapshot_reads_are_chunked_parallel(spark, db):
    _, url = db
    src = _source(spark, url)
    chunks, wms = src.snapshot_chunks()
    assert len(chunks) > 1  # 40 rows / chunk_size 10
    assert sum(c.count() for c in chunks) == 40
    # chunk ranges partition the key space
    assert wms[0].lo is None and wms[-1].hi is None


def test_initial_mode_full_state(spark, db):
    ep, url = db
    ep.execute_update("UPDATE items SET val = val + 0.5 WHERE MOD(id, 4) = 1")
    final = _final(_source(spark, url).read())
    assert len(final) == 40
    assert final[1] == ("n1", 1.5) and final[2] == ("n2", 2.0)


def test_scan_point_invariance_live_writes(spark, db):
    """Non-idempotent writes land mid-snapshot; the LW/HW handoff still
    converges to the database's final state (the protocol's whole point)."""
    ep, url = db

    def mutate():
        ep.execute_update("UPDATE items SET val = val * 10 WHERE id <= 20")
        ep.insert_rows("items", COLS, [(100, "late", 1.0)])
        ep.execute_update("DELETE FROM items WHERE id = 3")

    env = _source(spark, url).read(mid_scan_hook=mutate)
    got = _final(env)
    expected = {
        int(r[0]): (r[1], float(r[2]))
        for r in ep.query("SELECT id, name, val FROM items")
    }
    assert got == expected
    assert got[100] == ("late", 1.0) and 3 not in got and got[1] == ("n1", 10.0)


def test_snapshot_mode_no_tail(spark, db):
    _, url = db
    env = _source(spark, url, mode=StartupMode.SNAPSHOT).read()
    # snapshot-only output is pure inserts (no tail ops)
    assert env.select("__op").distinct().collect()[0][0] == "INSERT"
    assert len(_final(env)) == 40


def test_latest_offset_mode_sees_only_new_events(spark, db):
    ep, url = db
    src = _source(spark, url, mode=StartupMode.LATEST_OFFSET)
    env = src.read()  # offset (the JDBC predicate) is pinned here
    assert env.count() == 0  # nothing after current offset yet
    # events arriving after the offset was pinned ARE seen on re-execution
    ep.execute_update("UPDATE items SET val = -1 WHERE id = 2")
    ep.execute_update("DELETE FROM items WHERE id = 4")
    rows = env.collect()
    ops = [(r["__op"], (r["before"] or r["after"]).id) for r in rows]
    assert ops == [("UPDATE", 2), ("DELETE", 4)]


def test_earliest_offset_replays_history_to_current_state(spark, db):
    ep, url = db
    ep.execute_update("UPDATE items SET val = 7.0 WHERE id = 7")
    ep.execute_update("DELETE FROM items WHERE id = 8")
    env = _source(spark, url, mode=StartupMode.EARLIEST_OFFSET).read()
    got = _final(env)
    assert len(got) == 39 and got[7] == ("n7", 7.0) and 8 not in got


def test_specific_offsets_mode(spark, db):
    ep, url = db
    src = _source(spark, url)
    offset = src.current_offset()
    ep.execute_update("DELETE FROM items WHERE id = 9")
    env = _source(spark, url, mode=StartupMode.SPECIFIC_OFFSETS,
                  startup_offset=offset).read()
    rows = env.collect()
    assert len(rows) == 1 and rows[0]["__op"] == "DELETE"


def test_timestamp_mode_bounds(spark, db):
    """TIMESTAMP startup replays from the first log entry at/after the
    given wall time: a boundary before all events replays the full log, a
    future boundary replays nothing (deterministic regardless of clock)."""
    ep, url = db
    src = _source(spark, url, mode=StartupMode.TIMESTAMP,
                  startup_timestamp="1990-01-01 00:00:00")
    env = src.read()
    assert env.count() == 40  # the 40 capture-log inserts
    src2 = _source(spark, url, mode=StartupMode.TIMESTAMP,
                   startup_timestamp="2990-01-01 00:00:00")
    assert src2.read().count() == 0


def test_live_ddl_detection_via_metadata_diff(spark, db):
    """ALTER TABLE on the live database surfaces as SchemaChangeEvents
    derived from a real metadata re-discovery (the binlog-DDL-parse
    analog for a log-less capture channel)."""
    ep, url = db
    src = _source(spark, url)
    _, known = src.detect_schema_changes(None)
    assert [c.name for c in known.columns] == ["id", "name", "val"]

    ep.execute("ALTER TABLE items ADD COLUMN score DOUBLE")
    ep.execute_update("UPDATE items SET score = val * 2.0 WHERE id <= 3")
    events, new_schema = src.detect_schema_changes(known)
    assert [type(e).__name__ for e in events] == ["AddColumnEvent"]
    assert events[0].added_columns[0].column.name == "score"
    assert [c.name for c in new_schema.columns] == ["id", "name", "val", "score"]
    # snapshot reads now carry the new column through real JDBC
    chunks, _ = src.snapshot_chunks()
    assert "score" in chunks[0].columns
    merged = {r.id: r.score for c in chunks for r in c.collect() if r.id <= 3}
    assert merged == {1: 2.0, 2: 4.0, 3: 6.0}


def test_cli_jdbc_source(spark, db, tmp_path):
    """YAML -> jdbc source -> transform -> parquet sink, through run_pipeline."""
    ep, url = db
    from flink_cdc_spark.cli import run_pipeline
    from flink_cdc_spark.pipeline.yaml_parser import parse_pipeline_yaml

    out = tmp_path / "out"
    pipeline = parse_pipeline_yaml(
        f"""
source:
  type: jdbc
  url: "{url}"
  tables: app.items
sink:
  type: parquet
  path: {out}
transform:
  - source-table: app.items
    projection: id, UPPER(name) AS uname, val
    filter: id <= 10
pipeline:
  name: jdbc-e2e
  execution.runtime-mode: BATCH
"""
    )
    summary = run_pipeline(spark, pipeline)
    written = spark.read.parquet(str(out / "app.items"))
    assert written.columns == ["id", "uname", "val"]
    assert written.count() == 10
    assert {r.uname for r in written.collect()} == {f"N{i}" for i in range(1, 11)}


def test_live_random_history_matches_table(spark, tmp_path):
    """Differential against live Derby: seeded random op sequences through
    real SQL + trigger capture; snapshot+tail materializes to exactly the
    table's final contents."""
    import random

    from flink_cdc_spark.sources.jdbc_live import derby_url

    ep = JdbcEndpoint(spark, derby_url(str(tmp_path / "rnd")))
    ep.execute(
        "CREATE TABLE rnd (id BIGINT NOT NULL PRIMARY KEY, val BIGINT)"
    )
    install_capture(ep, "rnd", ["id", "val"])
    rng = random.Random(41)
    present = set()
    # seed some pre-snapshot rows
    for k in range(5):
        ep.insert_rows("rnd", ["id", "val"], [(k, rng.randrange(1000))])
        present.add(k)
    url = derby_url(str(tmp_path / "rnd"), create=False)
    cfg = JdbcLiveSourceConfig(
        url=url, table="rnd", key_column="id", table_id="app.rnd",
        chunk_size=3, snapshot_pool=2,
    )
    src = JdbcLiveSource(spark, cfg)
    env = src.read()  # snapshot + empty tail
    # post-snapshot random history captured by triggers
    for _ in range(30):
        key = rng.randrange(8)
        op = rng.randrange(3)
        val = rng.randrange(1000)
        if op == 0 and key not in present:
            ep.execute_update(f"INSERT INTO rnd VALUES ({key}, {val})")
            present.add(key)
        elif op == 1 and key in present:
            ep.execute_update(f"UPDATE rnd SET val = {val} WHERE id = {key}")
        elif op == 2 and key in present:
            ep.execute_update(f"DELETE FROM rnd WHERE id = {key}")
            present.discard(key)
    env2 = src.read()  # resumes: tail carries the captured history
    got = {r["id"]: r["val"]
           for r in materialize_changelog(env2, ["id"]).collect()}
    live = {int(a): int(b) for a, b in ep.query("SELECT id, val FROM rnd")}
    assert got == live
    assert set(got) == present
    ep.close()
