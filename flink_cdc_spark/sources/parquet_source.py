"""Parquet table -> changelog source.

Plays the role of the reference's snapshot phase (the values/JDBC source
emitting CreateTableEvent + an insert-only changelog; SURVEY.md §2.3): a
parquet table is read as the snapshot image and wrapped in the envelope.

Optionally synthesizes a deterministic mutation tail (UPDATE/DELETE events
keyed by primary key; FIXTURES.md F4) so downstream operators exercise
changelog semantics (update splitting, last-per-key materialization). The
mutation recipe is pure column arithmetic on the key — SQL-expressible, so
a DuckDB oracle can reproduce the exact final state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.schema import Schema
from ..core.table_id import TableId
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    wrap_as_inserts,
)


def _nanos_timestamp_columns(path: str) -> set:
    """Columns stored as parquet TIMESTAMP(NANOS) (pyarrow timestamp[ns])."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return set()
    out = set()
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.add(field.name)
    return out


@dataclass
class MutationSpec:
    """Deterministic mutation tail derived from the snapshot rows.

    For rows where key % update_mod == update_rem: emit an UPDATE that
    applies `update_exprs` (SQL expr strings over the payload columns).
    For rows where key % delete_mod == delete_rem: emit a DELETE.
    A row can receive both (update then delete; delete sequences later).
    """

    key_column: str
    update_mod: int = 10
    update_rem: int = 3
    update_exprs: dict = None  # column -> SQL expression over original values
    delete_mod: int = 20
    delete_rem: int = 7

    def oracle_final_state_sql(self, table: str, columns: list) -> str:
        """DuckDB SQL computing the exact post-changelog state."""
        sets = self.update_exprs or {}
        proj = ", ".join(
            f"CASE WHEN ({self.key_column} % {self.update_mod}) = {self.update_rem} "
            f"THEN ({sets[c]}) ELSE {c} END AS {c}" if c in sets else c
            for c in columns
        )
        return (
            f"SELECT {proj} FROM {table} "
            f"WHERE ({self.key_column} % {self.delete_mod}) <> {self.delete_rem}"
        )


class ParquetTableSource:
    """Reads `{sf_dir}/{table}.parquet` as a changelog envelope."""

    def __init__(self, spark: SparkSession, sf_dir: str, pin_utc: bool = True):
        """pin_utc: the engine's convention is that naive timestamps are
        UTC (session.py sets it globally; the DuckDB oracle assumes it).
        Sessions built elsewhere may carry another zone, so by default the
        source pins UTC — pass pin_utc=False to leave foreign sessions
        untouched (results then depend on the ambient zone)."""
        self.spark = spark
        self.sf_dir = sf_dir
        if pin_utc and spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    def snapshot(self, table: str) -> DataFrame:
        path = f"{self.sf_dir}/{table}.parquet"
        nanos_cols = _nanos_timestamp_columns(path)
        if nanos_cols:
            # runtime-settable SQL conf; required to read TIMESTAMP(NANOS)
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        if nanos_cols:
            # nanos were read as long (spark.sql.legacy.parquet.nanosAsLong);
            # normalize to micros TIMESTAMP_NTZ, matching DuckDB's cast
            df = df.select(
                *[
                    F.expr(f"cast(timestamp_micros(`{c}` div 1000) as timestamp_ntz)").alias(c)
                    if c in nanos_cols
                    else F.col(c)
                    for c in df.columns
                ]
            )
        return df

    def changelog(
        self,
        table: str,
        table_id: Optional[str] = None,
        mutations: Optional[MutationSpec] = None,
    ) -> DataFrame:
        tid = table_id or f"default.{table}"
        df = self.snapshot(table)
        inserts = wrap_as_inserts(df, tid)
        if mutations is None:
            return inserts
        return inserts.unionByName(self._mutation_tail(df, tid, mutations))

    def _mutation_tail(self, df: DataFrame, table_id: str, spec: MutationSpec) -> DataFrame:
        key = F.col(spec.key_column)
        payload_before = F.struct(*[F.col(c) for c in df.columns])
        updated_cols = [
            F.expr(spec.update_exprs[c]).cast(df.schema[c].dataType).alias(c)
            if spec.update_exprs and c in spec.update_exprs
            else F.col(c)
            for c in df.columns
        ]
        payload_after = F.struct(*updated_cols)
        null_payload = F.lit(None).cast(T.StructType(df.schema.fields))
        empty_meta = F.create_map().cast("map<string,string>")

        # updates sequence after all inserts; deletes after all updates.
        # 2^40 offsets keep the bands disjoint from monotonically_increasing_id.
        upd = (
            df.where((key % spec.update_mod) == spec.update_rem)
            .select(
                F.lit(table_id).alias(ENVELOPE_TABLE_ID),
                F.lit(OP_UPDATE).alias(ENVELOPE_OP),
                payload_before.alias("before"),
                payload_after.alias("after"),
                empty_meta.alias(ENVELOPE_META),
                (F.monotonically_increasing_id() + F.lit(1 << 41)).alias(ENVELOPE_SEQ),
            )
        )
        # the delete's before image reflects the update when one applied
        deleted_payload = F.when(
            (key % spec.update_mod) == spec.update_rem, payload_after
        ).otherwise(payload_before)
        dele = (
            df.where((key % spec.delete_mod) == spec.delete_rem)
            .select(
                F.lit(table_id).alias(ENVELOPE_TABLE_ID),
                F.lit(OP_DELETE).alias(ENVELOPE_OP),
                deleted_payload.alias("before"),
                null_payload.alias("after"),
                empty_meta.alias(ENVELOPE_META),
                (F.monotonically_increasing_id() + F.lit(1 << 42)).alias(ENVELOPE_SEQ),
            )
        )
        return upd.unionByName(dele)


def read_table_as_changelog(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    table_id: Optional[str] = None,
    mutations: Optional[MutationSpec] = None,
) -> DataFrame:
    return ParquetTableSource(spark, sf_dir).changelog(table, table_id, mutations)
