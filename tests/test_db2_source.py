"""Db2 ASN change-table decode: D-then-I update pairing, op codes, types
(flink-connector-db2-cdc Db2Connection.GET_ALL_CHANGES_FOR_TABLE /
Db2StreamingChangeEventSource / Db2TypeUtils scope)."""

import pytest

from flink_cdc_spark.sources.db2_source import (
    Db2SourceConfig,
    cd_table_name,
    db2_streams,
    db2_type,
    decode_cd_table,
)
from flink_cdc_spark.sinks.materialize import materialize_changelog


def _cd_rows():
    # (commitseq, intentseq, op, id, name)
    return [
        # txn 1: plain inserts
        ("0001", "01", "I", 1, "a"),
        ("0001", "02", "I", 2, "b"),
        # txn 2: update of id=1 stored as D-then-I inside one commit
        ("0002", "01", "D", 1, "a"),
        ("0002", "02", "I", 1, "a2"),
        # txn 3: lone delete of id=2
        ("0003", "01", "D", 2, "b"),
        # txn 4: insert of id=3, then a separate commit updates it
        ("0004", "01", "I", 3, "c"),
        ("0005", "01", "D", 3, "c"),
        ("0005", "02", "I", 3, "c2"),
    ]


@pytest.fixture()
def cd_df(spark):
    return spark.createDataFrame(
        _cd_rows(),
        "IBMSNAP_COMMITSEQ string, IBMSNAP_INTENTSEQ string, "
        "IBMSNAP_OPERATION string, id long, name string",
    )


def test_decode_ops_and_pairing(spark, cd_df):
    env = decode_cd_table(cd_df, "DB2INST1.T")
    rows = sorted(
        (r["__seq"], r["__op"],
         None if r["before"] is None else (r["before"]["id"], r["before"]["name"]),
         None if r["after"] is None else (r["after"]["id"], r["after"]["name"]))
        for r in env.collect()
    )
    assert rows == [
        (1, "INSERT", None, (1, "a")),
        (2, "INSERT", None, (2, "b")),
        (3, "UPDATE", (1, "a"), (1, "a2")),
        (5, "DELETE", (2, "b"), None),
        (6, "INSERT", None, (3, "c")),
        (7, "UPDATE", (3, "c"), (3, "c2")),
    ]


def test_materialized_state(spark, cd_df):
    env = decode_cd_table(cd_df, "DB2INST1.T")
    final = materialize_changelog(env, ["id"])
    state = {r["id"]: r["name"] for r in final.collect()}
    assert state == {1: "a2", 3: "c2"}


def test_cross_commit_d_then_i_not_paired(spark):
    # a delete and an insert in DIFFERENT commits stay separate events
    df = spark.createDataFrame(
        [("0001", "01", "I", 1, "x"),
         ("0002", "01", "D", 1, "x"),
         ("0003", "01", "I", 1, "y")],
        "IBMSNAP_COMMITSEQ string, IBMSNAP_INTENTSEQ string, "
        "IBMSNAP_OPERATION string, id long, name string",
    )
    env = decode_cd_table(df, "DB2INST1.T")
    ops = [r["__op"] for r in env.orderBy("__seq").collect()]
    assert ops == ["INSERT", "DELETE", "INSERT"]


def test_type_mapping():
    assert str(db2_type("DECIMAL", 12, 2)) == "DECIMAL(12, 2)"
    assert str(db2_type("TIMESTAMP", 6)) == "TIMESTAMP(6)"
    assert str(db2_type("VARCHAR")) == "STRING"
    assert str(db2_type("BLOB")) == "BYTES"
    assert str(db2_type("INTEGER", nullable=False)).endswith("NOT NULL")


def test_config_and_resolver(spark):
    cfg = Db2SourceConfig.from_dict(
        {"hostname": "db2h", "database-name": "TESTDB",
         "schema-name": "DB2INST1", "table-name": "ORDERS", "port": "50001"}
    )
    assert cfg.jdbc_url() == "jdbc:db2://db2h:50001/TESTDB"
    assert cd_table_name("DB2INST1", "ORDERS") == "ASNCDC.DB2INST1_ORDERS"
    with pytest.raises(SystemExit, match="hostname"):
        db2_streams(spark, {})
    with pytest.raises(SystemExit, match="change-table decoder"):
        db2_streams(spark, {"hostname": "db2h", "database-name": "TESTDB"})
