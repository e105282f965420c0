"""Prepartition operators (operators/partition.py): PK-hash channel
assignment (RegularPrePartitionOperator scope) and the distributed
multi-table variant (DistributedPrePartitionOperator scope)."""

from pyspark.sql import functions as F, types as T

from flink_cdc_spark.operators import (
    repartition_by_primary_key,
    repartition_distributed,
)
from flink_cdc_spark.sources.envelope import OP_DELETE, OP_INSERT, OP_UPDATE


def _env(spark, tables=("db.t",)):
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
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
    rows = []
    seq = 0
    for tid in tables:
        for k in range(40):
            rows.append((tid, OP_INSERT, None, (k, 1.0), {}, seq)); seq += 1
            rows.append((tid, OP_UPDATE, (k, 1.0), (k, 2.0), {}, seq)); seq += 1
            if k % 5 == 0:
                rows.append((tid, OP_DELETE, (k, 2.0), None, {}, seq)); seq += 1
    return spark.createDataFrame(rows, schema)


def _key_partitions(df, with_table):
    cols = [F.spark_partition_id().alias("pid"), F.coalesce(
        F.col("after.id"), F.col("before.id")).alias("k"), F.col("__table_id")]
    rows = df.select(*cols).collect()
    seen = {}
    for r in rows:
        key = (r["__table_id"], r["k"]) if with_table else r["k"]
        seen.setdefault(key, set()).add(r["pid"])
    return seen


def test_pk_hash_all_changes_of_key_colocate(spark):
    env = _env(spark)
    out = repartition_by_primary_key(env, ["id"], num_partitions=7)
    assert out.rdd.getNumPartitions() == 7
    seen = _key_partitions(out, with_table=False)
    # every key's inserts/updates/deletes (delete keys from the BEFORE
    # image) land in exactly one channel — per-key order survives
    assert all(len(p) == 1 for p in seen.values())
    # envelope columns untouched (temp key cols dropped)
    assert out.columns == env.columns


def test_distributed_routes_by_table_and_key(spark):
    env = _env(spark, tables=("db.a", "db.b"))
    out = repartition_distributed(env, ["id"], num_partitions=6)
    seen = _key_partitions(out, with_table=True)
    assert all(len(p) == 1 for p in seen.values())
    # the table id participates in the key: the same pk value of two
    # tables is free to land on different channels (no forced collision)
    pid_a = {next(iter(seen[("db.a", k)])) for _, k in
             [(t, k) for (t, k) in seen if t == "db.a"]}
    assert len(pid_a) > 1  # keys actually spread over channels
    assert out.columns == env.columns
