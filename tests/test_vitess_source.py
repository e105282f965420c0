"""Vitess source: GTID-set algebra, VGTID resume filtering, VStream decode
(flink-connector-vitess-cdc / Debezium Vitess envelope scope)."""

import json

import pytest
from pyspark.sql import types as T

from flink_cdc_spark.sources.vitess_source import (
    GtidSet,
    Vgtid,
    VitessSourceConfig,
    decode_vstream,
    vitess_streams,
)
from flink_cdc_spark.sinks.materialize import materialize_changelog


# -- GTID algebra -----------------------------------------------------------


def test_gtid_set_parse_contains_format():
    g = GtidSet.parse("MySQL56/aaa:1-5:7,bbb:10")
    assert g.contains("aaa", 3) and g.contains("aaa", 7) and g.contains("bbb", 10)
    assert not g.contains("aaa", 6) and not g.contains("ccc", 1)
    assert g.format() == "aaa:1-5:7,bbb:10"
    # adjacent intervals merge
    assert GtidSet.parse("aaa:1-3:4-6").format() == "aaa:1-6"


def test_gtid_set_union_superset():
    a = GtidSet.parse("aaa:1-5")
    b = GtidSet.parse("aaa:4-9,bbb:1")
    u = a.union(b)
    assert u.format() == "aaa:1-9,bbb:1"
    assert u.is_superset_of(a) and u.is_superset_of(b)
    assert not a.is_superset_of(b)


def test_gtid_set_rejects_garbage():
    with pytest.raises(ValueError):
        GtidSet.parse("aaa")
    with pytest.raises(ValueError):
        GtidSet.parse("aaa:5-2")
    with pytest.raises(ValueError):
        GtidSet.parse("aaa:x")


def test_vgtid_roundtrip():
    text = json.dumps(
        [
            {"keyspace": "ks", "shard": "-80", "gtid": "MySQL56/aaa:1-10"},
            {"keyspace": "ks", "shard": "80-", "gtid": "MySQL56/aaa:1-7"},
        ]
    )
    v = Vgtid.parse(text)
    assert v.covers("-80", "aaa", 10) and not v.covers("-80", "aaa", 11)
    assert v.covers("80-", "aaa", 7) and not v.covers("80-", "aaa", 8)
    assert Vgtid.parse(v.format()).shards == v.shards


# -- VStream decode ---------------------------------------------------------

PAYLOAD = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _rec(op, shard, txid, before=None, after=None):
    return (
        json.dumps(
            {
                "before": before,
                "after": after,
                "op": op,
                "source": {
                    "keyspace": "ks",
                    "table": "t",
                    "shard": shard,
                    "gtid": f"aaa:{txid}",
                },
            }
        ),
    )


@pytest.fixture()
def records(spark):
    rows = [
        _rec("c", "-80", 1, after={"id": 1, "v": "a"}),
        _rec("c", "80-", 1, after={"id": 2, "v": "b"}),
        _rec("u", "-80", 2, before={"id": 1, "v": "a"}, after={"id": 1, "v": "a2"}),
        _rec("d", "80-", 2, before={"id": 2, "v": "b"}),
        _rec("c", "80-", 3, after={"id": 3, "v": "c"}),
    ]
    return spark.createDataFrame(rows, "value string")


def test_decode_all(spark, records):
    env = decode_vstream(records, PAYLOAD)
    assert env.count() == 5
    final = materialize_changelog(env, ["id"])
    assert {(r["id"], r["v"]) for r in final.collect()} == {(1, "a2"), (3, "c")}
    row = env.where("__op = 'UPDATE'").first()
    assert row["__meta"]["shard"] == "-80" and row["__meta"]["gtid"] == "aaa:2"
    assert row["__table_id"] == "ks.t"


def test_decode_with_start_vgtid(spark, records):
    # resume past shard -80 tx 1-2 and shard 80- tx 1: only later events kept
    start = Vgtid.parse(
        json.dumps(
            [
                {"keyspace": "ks", "shard": "-80", "gtid": "MySQL56/aaa:1-2"},
                {"keyspace": "ks", "shard": "80-", "gtid": "MySQL56/aaa:1"},
            ]
        )
    )
    env = decode_vstream(records, PAYLOAD, start_vgtid=start)
    got = sorted((r["__meta"]["shard"], r["__seq"]) for r in env.collect())
    assert got == [("80-", 2), ("80-", 3)]


# -- options ----------------------------------------------------------------


def test_config_and_resolver(spark):
    cfg = VitessSourceConfig.from_dict(
        {"hostname": "vtgate", "keyspace": "ks", "tablet-type": "master",
         "vitess.shard": "-80", "vitess.stop_on_reshard": "true"}
    )
    assert cfg.tablet_type == "MASTER" and cfg.stop_on_reshard is True
    with pytest.raises(ValueError, match="tablet-type"):
        VitessSourceConfig.from_dict({"tablet-type": "primary"})
    with pytest.raises(SystemExit, match="keyspace"):
        vitess_streams(spark, {"hostname": "vtgate"})
    with pytest.raises(SystemExit, match="VStream decoder"):
        vitess_streams(spark, {"hostname": "vtgate", "keyspace": "ks"})
