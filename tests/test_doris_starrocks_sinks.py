"""Doris / StarRocks stream-load sink wire formats (sinks/doris_sink.py,
sinks/starrocks_sink.py): serializer conventions, delete-sign / __op
columns, type-render rules, MetadataApplier DDL, factory option surfaces."""

import datetime
import json

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sinks.doris_sink import (
    DEFAULT_DATETIME,
    DORIS_DELETE_SIGN,
    DorisMetadataApplier,
    decode_doris,
    doris_type,
    encode_doris,
    validate_doris_options,
)
from flink_cdc_spark.sinks.materialize import materialize_changelog
from flink_cdc_spark.sinks.starrocks_sink import (
    STARROCKS_OP,
    StarRocksMetadataApplier,
    decode_starrocks,
    encode_starrocks,
    starrocks_type,
    validate_starrocks_options,
)
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE


def _env(spark):
    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("__table_id", T.StringType()),
            T.StructField("__op", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("__meta", T.MapType(T.StringType(), T.StringType())),
            T.StructField("__seq", T.LongType()),
        ]
    )
    t1 = datetime.datetime(2024, 3, 1, 10, 20, 30, 123456)
    t2 = datetime.datetime(2024, 3, 2, 11, 21, 31, 654321)
    rows = [
        ("db.sch.t", OP_INSERT, None, (1, "a", t1), {}, 1),
        ("db.sch.t", OP_UPDATE, (1, "a", t1), (1, "b", t2), {}, 2),
        ("db.sch.t", OP_DELETE, (2, "x", t1), None, {}, 3),
        ("db.sch.t", OP_INSERT, None, (3, None, None), {}, 4),
    ]
    return spark.createDataFrame(rows, schema), payload


# ---------------------------------------------------------------------------
# Doris wire format
# ---------------------------------------------------------------------------


def test_doris_delete_sign_and_images(spark):
    env, _ = _env(spark)
    recs = {r["__seq"]: r for r in encode_doris(env).collect()}
    r1 = json.loads(recs[1]["row"])
    assert r1[DORIS_DELETE_SIGN] == "0" and r1["name"] == "a"
    # UPDATE serializes the after image with sign 0
    r2 = json.loads(recs[2]["row"])
    assert r2[DORIS_DELETE_SIGN] == "0" and r2["name"] == "b"
    # DELETE serializes the before image with sign 1
    r3 = json.loads(recs[3]["row"])
    assert r3[DORIS_DELETE_SIGN] == "1" and r3["id"] == 2
    # database/table = last two dotted parts (getSchemaName/getTableName)
    assert recs[1]["database"] == "sch" and recs[1]["table"] == "t"


def test_doris_timestamp_render_micros(spark):
    env, _ = _env(spark)
    recs = {r["__seq"]: r for r in encode_doris(env).collect()}
    # DATE_TIME_FORMATTER = yyyy-MM-dd HH:mm:ss.SSSSSS
    assert json.loads(recs[1]["row"])["ts"] == "2024-03-01 10:20:30.123456"


def test_doris_null_fields_serialized(spark):
    env, _ = _env(spark)
    recs = {r["__seq"]: r for r in encode_doris(env).collect()}
    r4 = json.loads(recs[4]["row"])
    # Jackson writes explicit nulls for null values
    assert "name" in r4 and r4["name"] is None


def test_doris_partition_default_fill(spark):
    env, _ = _env(spark)
    recs = {
        r["__seq"]: r
        for r in encode_doris(env, partition_key="ts").collect()
    }
    # null auto-partition column backfilled with DEFAULT_DATETIME
    assert json.loads(recs[4]["row"])["ts"] == DEFAULT_DATETIME


def test_doris_labels_deterministic(spark):
    env, _ = _env(spark)
    a = sorted(r["label"] for r in encode_doris(env, label_prefix="x").collect())
    b = sorted(r["label"] for r in encode_doris(env, label_prefix="x").collect())
    assert a == b  # replay regenerates identical labels (dedup key)
    assert all(lbl.startswith("x_sch_t_") for lbl in a)


def test_doris_roundtrip_state(spark):
    env, payload = _env(spark)
    decoded = decode_doris(encode_doris(env), payload, "db.sch.t")
    state = {
        r["id"]: r for r in materialize_changelog(decoded, ["id"]).collect()
    }
    assert set(state) == {1, 3}
    assert state[1]["name"] == "b"
    assert state[1]["ts"] == datetime.datetime(2024, 3, 2, 11, 21, 31, 654321)


def test_doris_type_mapping():
    assert doris_type(T.TimestampType(), 3) == "DATETIMEV2(3)"
    assert doris_type(T.TimestampType(), 9) == "DATETIMEV2(6)"  # clamp
    assert doris_type(T.DateType()) == "DATEV2"
    assert doris_type(T.DecimalType(12, 2)) == "DECIMALV3(12,2)"
    assert doris_type(T.StringType(), 10) == "VARCHAR(30)"  # *3 utf-8 bytes
    assert doris_type(T.StringType()) == "STRING"
    assert doris_type(T.LongType()) == "BIGINT"


def test_doris_metadata_applier_ddl():
    app = DorisMetadataApplier()
    create = app.create_table(
        "db", "t",
        [("v", T.DoubleType(), None), ("id", T.LongType(), None)],
        ["id"],
    )
    # UNIQUE model when pk present; key column ordered first
    assert "UNIQUE KEY(`id`)" in create
    assert create.index("`id` BIGINT") < create.index("`v` DOUBLE")
    assert "light_schema_change" in create
    assert "ADD COLUMN `c` DATETIMEV2(6)" in app.add_column(
        "db", "t", "c", T.TimestampType()
    )
    assert app.rename_column("db", "t", "a", "b").endswith("RENAME COLUMN `a` `b`")
    assert "DUPLICATE KEY(`v`)" in app.create_table(
        "db", "nopk", [("v", T.DoubleType(), None)], []
    )


def test_doris_option_surface():
    ok = validate_doris_options(
        {"fenodes": "fe:8030", "username": "root", "password": "",
         "sink.label-prefix": "cdc", "table.create.properties.replication_num": "1"}
    )
    assert ok.label_prefix == "cdc"
    assert ok.table_properties == {"replication_num": "1"}
    with pytest.raises(ValueError, match="missing required"):
        validate_doris_options({"username": "root"})
    with pytest.raises(ValueError, match="unknown option"):
        validate_doris_options(
            {"fenodes": "x", "username": "u", "bogus": "1"}
        )


# ---------------------------------------------------------------------------
# StarRocks wire format
# ---------------------------------------------------------------------------


def test_starrocks_op_column(spark):
    env, _ = _env(spark)
    recs = {r["__seq"]: r for r in encode_starrocks(env).collect()}
    assert json.loads(recs[1]["row"])[STARROCKS_OP] == 0
    assert json.loads(recs[2]["row"])[STARROCKS_OP] == 0
    r3 = json.loads(recs[3]["row"])
    assert r3[STARROCKS_OP] == 1 and r3["id"] == 2  # delete: before image
    assert recs[1]["database"] == "sch" and recs[1]["table"] == "t"


def test_starrocks_datetime_render_seconds(spark):
    env, _ = _env(spark)
    recs = {r["__seq"]: r for r in encode_starrocks(env).collect()}
    # DATETIME_FORMATTER = yyyy-MM-dd HH:mm:ss (second precision)
    assert json.loads(recs[1]["row"])["ts"] == "2024-03-01 10:20:30"


def test_starrocks_roundtrip_state(spark):
    env, payload = _env(spark)
    decoded = decode_starrocks(encode_starrocks(env), payload, "db.sch.t")
    state = {
        r["id"]: r for r in materialize_changelog(decoded, ["id"]).collect()
    }
    assert set(state) == {1, 3}
    # sub-second precision is lost on the StarRocks wire
    assert state[1]["ts"] == datetime.datetime(2024, 3, 2, 11, 21, 31)


def test_starrocks_type_mapping():
    # char/varchar lengths are bytes: scaled by unicode-char.max-bytes
    assert starrocks_type(T.StringType(), length=10, is_char=True) == "CHAR(30)"
    assert starrocks_type(T.StringType(), length=100, is_char=True) == "VARCHAR(300)"
    # char in a primary key becomes varchar
    assert (
        starrocks_type(T.StringType(), length=10, is_char=True, is_primary_key=True)
        == "VARCHAR(30)"
    )
    # decimal can't key a table: VARCHAR(p+2) when scale != 0
    assert starrocks_type(T.DecimalType(10, 2), is_primary_key=True) == "VARCHAR(12)"
    assert starrocks_type(T.DecimalType(10, 0), is_primary_key=True) == "VARCHAR(11)"
    assert starrocks_type(T.DecimalType(10, 2)) == "DECIMAL(10,2)"
    assert starrocks_type(T.TimestampType()) == "DATETIME"
    assert starrocks_type(T.ArrayType(T.LongType())) == "JSON"


def test_starrocks_metadata_applier_ddl():
    app = StarRocksMetadataApplier(num_buckets=8)
    create = app.create_table(
        "db", "t",
        [("v", T.DoubleType(), None), ("id", T.LongType(), None)],
        ["id"],
    )
    assert "PRIMARY KEY(`id`)" in create and "BUCKETS 8" in create
    assert "`id` BIGINT NOT NULL" in create
    assert app.rename_column("db", "t", "a", "b").endswith(
        "RENAME COLUMN `a` TO `b`"
    )
    assert "MODIFY COLUMN `v` STRING" in app.alter_column_type(
        "db", "t", "v", T.StringType()
    )


def test_starrocks_option_surface():
    ok = validate_starrocks_options(
        {
            "jdbc-url": "jdbc:mysql://fe:9030",
            "load-url": "fe:8080",
            "username": "root",
            "password": "",
            "table.create.num-buckets": "16",
            "sink.properties.format": "json",
        }
    )
    assert ok.num_buckets == 16
    with pytest.raises(ValueError, match="missing required"):
        validate_starrocks_options({"jdbc-url": "x"})
    with pytest.raises(ValueError, match="unknown option"):
        validate_starrocks_options(
            {"jdbc-url": "x", "load-url": "y", "username": "u",
             "password": "", "nope": "1"}
        )
