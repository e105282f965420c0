"""Live JDBC database -> checkpointed Structured Streaming pipeline
(streaming/live_bridge.py). Reference scope: the continuous composed
topology (FlinkPipelineComposer.java:120-261) — source reader feeding a
checkpointed streaming job, with offset + schema state surviving restarts.
"""

import pytest

from flink_cdc_spark.sources.jdbc_live import (
    JdbcEndpoint,
    JdbcLiveSourceConfig,
    derby_url,
    install_capture,
)
from flink_cdc_spark.streaming.live_bridge import JdbcLiveStreamBridge

COLS = ["id", "name", "val"]


@pytest.fixture()
def db(spark, tmp_path):
    ep = JdbcEndpoint(spark, derby_url(str(tmp_path / "db")))
    ep.execute(
        "CREATE TABLE ITEMS (ID BIGINT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(50), VAL DOUBLE)"
    )
    install_capture(ep, "items", COLS)
    ep.insert_rows("ITEMS", [c.upper() for c in COLS],
                   [(i, f"n{i}", float(i)) for i in range(1, 41)])
    yield ep, derby_url(str(tmp_path / "db"), create=False)
    ep.close()


def _bridge(spark, url, work):
    cfg = JdbcLiveSourceConfig(
        url=url, table="items", key_column="id", table_id="app.items",
        chunk_size=10, snapshot_pool=2,
    )
    return JdbcLiveStreamBridge(spark, cfg, str(work))


def test_bootstrap_then_incremental_ticks(spark, db, tmp_path):
    ep, url = db
    b = _bridge(spark, url, tmp_path / "w")
    b.bootstrap()
    b.process_available()
    assert b.current_state().count() == 40

    ep.execute_update("UPDATE ITEMS SET VAL = VAL * 10 WHERE ID <= 3")
    ep.execute_update("DELETE FROM ITEMS WHERE ID = 40")
    assert b.run_once() == 4
    rows = {r.id: r.val for r in b.current_state().collect()}
    assert rows[1] == 10.0 and 40 not in rows and len(rows) == 39
    # idle tick exports nothing
    assert b.run_once() == 0


def test_checkpoint_restart_resume_no_duplicates(spark, db, tmp_path):
    """A restarted bridge (fresh runner over the same checkpoint) neither
    re-merges processed files nor loses exported-but-unprocessed ones."""
    ep, url = db
    b = _bridge(spark, url, tmp_path / "w")
    b.bootstrap()
    b.process_available()

    ep.execute_update("UPDATE ITEMS SET VAL = -7 WHERE ID = 7")
    b.export_once()  # exported but NOT processed: "crash" before the drain

    b2 = _bridge(spark, url, tmp_path / "w")
    b2.bootstrap()  # no re-snapshot: meta exists
    b2.process_available()  # checkpoint resumes at the unprocessed file
    rows = {r.id: r.val for r in b2.current_state().collect()}
    assert rows[7] == -7.0 and len(rows) == 40
    assert b2.run_once() == 0  # nothing left


def test_source_ddl_across_restart_repairs_stale_window(spark, db, tmp_path):
    """ALTER + writes land while the bridge is DOWN: the restarted exporter
    detects the diff from its persisted schema, re-aligns capture, and the
    repair slice backfills the new column for touched keys."""
    ep, url = db
    b = _bridge(spark, url, tmp_path / "w")
    b.bootstrap()
    b.process_available()

    ep.execute("ALTER TABLE ITEMS ADD COLUMN TAG VARCHAR(20)")
    ep.execute_update("UPDATE ITEMS SET TAG = 'T' WHERE ID = 2")

    b2 = _bridge(spark, url, tmp_path / "w")
    b2.bootstrap()
    assert b2.run_once() >= 1
    out = {r.id: (r.val, r.tag) for r in b2.current_state().collect()}
    assert out[2] == (2.0, "T")  # repaired: old-trigger image lacked TAG
    assert out[1] == (1.0, None)

    # capture keeps working with the evolved schema
    ep.execute_update("UPDATE ITEMS SET TAG = 'Z', VAL = -1 WHERE ID = 5")
    b2.run_once()
    out = {r.id: (r.val, r.tag) for r in b2.current_state().collect()}
    assert out[5] == (-1.0, "Z")


def test_repair_above_collect_cap_uses_semi_join(spark, db, tmp_path):
    """Above the collect cap the repair path must not IN-predicate —
    it re-scans chunked and semi-joins executor-side, same result."""
    ep, url = db
    b = _bridge(spark, url, tmp_path / "w")
    b.repair_collect_cap = 5  # force the semi-join path (40 keys > 5)
    b.bootstrap()
    b.process_available()
    ep.execute("ALTER TABLE ITEMS ADD COLUMN TAG VARCHAR(20)")
    ep.execute_update("UPDATE ITEMS SET TAG = 'A'")  # touches every key
    assert b.run_once() >= 40
    out = {r.id: r.tag for r in b.current_state().collect()}
    assert set(out.values()) == {"A"} and len(out) == 40
