"""Materializing sink: changelog envelope -> current table state.

Semantics match the reference's ValuesDatabase
(pipeline-connector-values/.../ValuesDatabase.java:248-431): apply events in
order by primary key — INSERT/REPLACE put, UPDATE put(after), DELETE remove;
final state is the map's contents. On Spark this is last-image-per-key:

    fast path  (insert-only changelog, unique keys): select after.* — a pure
               narrow projection, NO shuffle. At 100 TB this is the path the
               initial snapshot load takes, so it must not shuffle.
    general    one hash shuffle on the primary key: max(__seq) per key via a
               window, keep rn=1, drop rows whose last image is DELETE.

Without a primary key the changelog degenerates to append-only semantics
(deletes/updates need keys), matching the reference's non-PK behavior.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..sources.envelope import ENVELOPE_OP, ENVELOPE_SEQ, OP_DELETE


def materialize_changelog(
    df: DataFrame,
    primary_keys: Sequence[str],
    insert_only: bool = False,
) -> DataFrame:
    """Reduce an envelope frame (single table) to its final state."""
    if insert_only or not primary_keys:
        return df.where(F.col(ENVELOPE_OP) != OP_DELETE).select("after.*")

    key_exprs = [
        F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__key_{k}")
        for k in primary_keys
    ]
    keyed = df.select("*", *key_exprs)
    w = Window.partitionBy(*[f"__key_{k}" for k in primary_keys]).orderBy(
        F.col(ENVELOPE_SEQ).desc()
    )
    latest = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(F.col(ENVELOPE_OP) != OP_DELETE)
    )
    return latest.select("after.*")
