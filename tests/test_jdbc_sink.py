"""JDBC warehouse sink: real DDL + MERGE INTO (sinks/jdbc_sink.py).

Coverage intent mirrors the reference's warehouse-sink tests
(DorisMetadataApplierITCase / StarRocksMetadataApplierITCase): schema
changes execute as DDL on the live target; batches land with upsert
semantics.
"""

import pytest

from flink_cdc_spark.core.events import (
    AddColumnEvent,
    CreateTableEvent,
    DropColumnEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from flink_cdc_spark.core.schema import Column, new_schema
from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.sinks.jdbc_sink import JdbcWarehouseSink
from flink_cdc_spark.sources.jdbc_live import derby_url

from tests.test_lsm_store import PAYLOAD, _env

TID = TableId.parse("wh.t")


@pytest.fixture()
def sink(spark, tmp_path):
    s = JdbcWarehouseSink(spark, derby_url(str(tmp_path / "db")))
    schema = (
        new_schema()
        .physical_column("id", "BIGINT NOT NULL")
        .physical_column("name", "STRING")
        .primary_key("id")
        .build()
    )
    s.apply_schema_change(CreateTableEvent(TID, schema))
    return s, schema


def test_upsert_across_batches(spark, sink):
    s, schema = sink
    s.write_batch(TID, _env(spark, [("INSERT", None, (1, "a"), 1),
                                    ("INSERT", None, (2, "b"), 2)]), schema)
    s.write_batch(TID, _env(spark, [("UPDATE", (1, "a"), (1, "A"), 3),
                                    ("DELETE", (2, "b"), None, 4),
                                    ("INSERT", None, (3, "c"), 5)]), schema)
    rows = {r.id: r.name for r in s.read_table(TID).collect()}
    assert rows == {1: "A", 3: "c"}
    # within-batch last-image: insert then delete of same key -> absent
    s.write_batch(TID, _env(spark, [("INSERT", None, (9, "z"), 6),
                                    ("DELETE", (9, "z"), None, 7)]), schema)
    assert 9 not in {r.id for r in s.read_table(TID).collect()}


def test_exactly_once_batch_ledger(spark, sink):
    """A redelivered batch_id is a no-op: MERGE + ledger are atomic."""
    s, schema = sink
    env = _env(spark, [("INSERT", None, (1, "a"), 1)])
    s.write_batch(TID, env, schema, batch_id=7)
    # redelivery of the same batch with different (stale) content: skipped
    stale = _env(spark, [("INSERT", None, (1, "STALE"), 1)])
    s.write_batch(TID, stale, schema, batch_id=7)
    assert {r.name for r in s.read_table(TID).collect()} == {"a"}
    # a new batch id lands normally
    s.write_batch(TID, _env(spark, [("UPDATE", (1, "a"), (1, "b"), 2)]), schema,
                  batch_id=8)
    assert {r.name for r in s.read_table(TID).collect()} == {"b"}
    assert s.is_committed(TID, 7) and s.is_committed(TID, 8)
    assert not s.is_committed(TID, 9)


def test_ddl_executes_on_live_target(spark, sink):
    s, schema = sink
    s.write_batch(TID, _env(spark, [("INSERT", None, (1, "a"), 1)]), schema)
    s.apply_schema_change(AddColumnEvent.last(TID, Column("score", ct.double())))
    assert "score" in s.read_table(TID).columns
    s.apply_schema_change(RenameColumnEvent(TID, (("name", "full_name"),)))
    out = s.read_table(TID)
    assert "full_name" in out.columns and "name" not in out.columns
    assert out.collect()[0].full_name == "a"
    s.apply_schema_change(DropColumnEvent(TID, ("score",)))
    assert "score" not in s.read_table(TID).columns
    s.apply_schema_change(TruncateTableEvent(TID))
    assert s.read_table(TID).count() == 0
