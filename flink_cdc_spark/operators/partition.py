"""Partitioning operators.

The reference's PrePartition/EventPartitioner
(runtime/partitioning/RegularPrePartitionOperator.java:85-121) computes
channel = hash(primary key) % parallelism so all changes of one key land on
one writer, preserving per-key order. In Spark the same contract is
`repartition(n, hash_cols)` — and the sink additionally sorts by __seq and
keeps the last image per key, so correctness never depends on arrival order
(important under AQE, which may re-plan the shuffle).

Schema/flush broadcast has no Spark analog: DDL is driver-side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..sources.envelope import ENVELOPE_TABLE_ID


def repartition_by_primary_key(df: DataFrame, primary_keys, num_partitions: Optional[int] = None) -> DataFrame:
    cols = [F.col(f"after.{k}") for k in primary_keys]
    # DELETE rows have null after; fall back to before image for the key
    key_cols = [
        F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__pk_{k}")
        for k in primary_keys
    ]
    tmp = df.select("*", *key_cols)
    names = [f"__pk_{k}" for k in primary_keys]
    if num_partitions:
        tmp = tmp.repartition(num_partitions, *names)
    else:
        tmp = tmp.repartition(*names)
    return tmp.drop(*names)


def repartition_by_table_id(df: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    if num_partitions:
        return df.repartition(num_partitions, ENVELOPE_TABLE_ID)
    return df.repartition(ENVELOPE_TABLE_ID)


def repartition_distributed(
    df: DataFrame, primary_keys, num_partitions: Optional[int] = None
) -> DataFrame:
    """The DistributedPrePartitionOperator analog for a MULTI-table
    envelope: the reference keeps one hash function per table (recreated
    on schema change) and broadcasts schema events to every channel
    (DistributedPrePartitionOperator.java:85-111). In Spark, DDL is
    driver-side metadata — no broadcast needed — and the per-table
    routing is the shuffle key (table_id, pk...): one key's changes for
    one table land in one partition without cross-table hash collisions
    steering unrelated tables to the same hot channel."""
    key_cols = [
        F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__pk_{k}")
        for k in primary_keys
    ]
    tmp = df.select("*", *key_cols)
    names = [ENVELOPE_TABLE_ID] + [f"__pk_{k}" for k in primary_keys]
    if num_partitions:
        tmp = tmp.repartition(num_partitions, *names)
    else:
        tmp = tmp.repartition(*names)
    return tmp.drop(*[f"__pk_{k}" for k in primary_keys])
