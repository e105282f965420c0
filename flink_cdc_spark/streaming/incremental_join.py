"""Incrementally-maintained JOIN view over two CDC changelogs —
streaming materialized-view maintenance (the Flink-SQL continuous-join
capability the reference pipeline feeds): a fact⋈dimension equi-join
whose materialization stays correct under INSERT / UPDATE / DELETE on
EITHER side, recomputing only the keys a micro-batch touched.

Per epoch, with left Δ keyed by the left pk and right Δ keyed by the
join key:

    affected(view row) := its left pk ∈ ΔL  OR  its join key ∈ ΔR
    view_new = view_old minus affected rows
             ∪ (L_new restricted to affected) ⋈ R_new

Both the state updates and the view repair are keyed to the CHANGED key
sets (broadcast hash semi/anti-joins against per-batch key sets, which
are micro-batch-sized, i.e. corpus-sublinear) — the unaffected bulk of
the view is carried forward untouched. That is the actual incremental
contract: per-epoch cost proportional to the delta, not the view.

State tables (left, right, view) are versioned by epoch id exactly like
retract_agg: an epoch always merges from its committed PREDECESSOR and
overwrites its own version, so foreachBatch crash-retries are
idempotent. Money columns ride as exact integer cents.

Scale: at real scale the three state tables would live bucketed by
their key in a table format (the repo's lsm/iceberg stores); the parquet
versions here keep the same keyed-merge plan shape. The repair join
broadcasts the affected left segment only when it is small — it is
delta-sized by construction.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sinks.materialize import materialize_changelog
from .retract_agg import stage_replay_batches
from ..sources.envelope import ENVELOPE_OP, ENVELOPE_TABLE_ID, OP_DELETE, OP_INSERT, OP_UPDATE

N_REPLAY_BATCHES = 4


def delta_last_image(env: DataFrame, pk: str) -> DataFrame:
    """Per-key last image of one batch's envelope rows: (pk, alive,
    payload...). alive=false is a tombstone (the key was deleted)."""
    latest = materialize_changelog(env, [pk])
    keys = env.select(
        F.coalesce(F.col(f"after.{pk}"), F.col(f"before.{pk}")).alias(pk)
    ).distinct()
    return keys.join(
        latest.withColumn("__alive", F.lit(True)), pk, "left"
    ).withColumn("__alive", F.coalesce(F.col("__alive"), F.lit(False)))


def apply_delta(state: Optional[DataFrame], delta: DataFrame, pk: str) -> DataFrame:
    """Carry unaffected state rows, replace affected ones with their live
    last images: one broadcast anti-join on the delta-sized key set."""
    live = delta.where(F.col("__alive")).drop("__alive")
    if state is None:
        return live
    changed = delta.select(pk)
    carried = state.join(F.broadcast(changed), pk, "left_anti")
    return carried.unionByName(live)


class IncrementalJoinView:
    """Maintains `left ⋈ right ON left.join_key = right.pk_right`
    incrementally from a single interleaved changelog stream carrying
    both tables (split per epoch by __table_id)."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        left_table_id: str,
        right_table_id: str,
        pk_left: str,
        join_key: str,
        pk_right: str,
        left_cols,
        right_cols,
        staged_dir: Optional[str] = None,
    ):
        self.spark = spark
        self.left_table_id = left_table_id
        self.right_table_id = right_table_id
        self.pk_left = pk_left
        self.join_key = join_key
        self.pk_right = pk_right
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.active = staged_dir or os.path.join(work_dir, "active")
        self.ckpt = os.path.join(work_dir, "ckpt")
        self.state_dir = os.path.join(work_dir, "state")
        os.makedirs(self.active, exist_ok=True)
        os.makedirs(self.state_dir, exist_ok=True)
        self._schema = None

    # -- staging (same mtime-ordered single-file batches as retract_agg) ----

    def stage(self, env: DataFrame) -> None:
        """Inserts of both tables split over the first two batches by key
        parity, then updates, then deletes — mutations always target rows
        accumulated in earlier micro-batches, on both sides."""
        pk_of = F.when(
            F.col(ENVELOPE_TABLE_ID) == self.left_table_id,
            F.coalesce(F.col(f"after.{self.pk_left}"), F.col(f"before.{self.pk_left}")),
        ).otherwise(
            F.coalesce(F.col(f"after.{self.pk_right}"), F.col(f"before.{self.pk_right}")),
        )
        env = env.withColumn(
            "__b",
            F.when(F.col(ENVELOPE_OP) == OP_INSERT, (pk_of % 2).cast("int"))
            .when(F.col(ENVELOPE_OP) == OP_UPDATE, F.lit(2))
            .otherwise(F.lit(3)),
        )
        self._schema = env.drop("__b").schema
        stage_replay_batches(env, self.active)

    # -- state versioning (retract_agg pattern) -----------------------------

    def _versions(self, name: str):
        root = os.path.join(self.state_dir, name)
        if not os.path.isdir(root):
            return []
        return sorted(
            int(fn[1:])
            for fn in os.listdir(root)
            if fn.startswith("v")
            and os.path.exists(os.path.join(root, fn, "_SUCCESS"))
        )

    def _read(self, name: str, v: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.state_dir, name, f"v{v}"))

    def _prev(self, name: str, epoch: int) -> Optional[DataFrame]:
        prior = [v for v in self._versions(name) if v < epoch]
        return self._read(name, max(prior)) if prior else None

    def _write(self, name: str, epoch: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, name, f"v{epoch}")
        )

    # -- the maintenance epoch ----------------------------------------------

    def _merge_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        left_env = batch_df.where(
            F.col(ENVELOPE_TABLE_ID) == self.left_table_id
        )
        right_env = batch_df.where(
            F.col(ENVELOPE_TABLE_ID) == self.right_table_id
        )
        dl = delta_last_image(left_env, self.pk_left).select(
            self.pk_left,
            "__alive",
            *[c for c in self.left_cols if c != self.pk_left],
        )
        dr = delta_last_image(right_env, self.pk_right).select(
            self.pk_right,
            "__alive",
            *[c for c in self.right_cols if c != self.pk_right],
        )

        l_new = apply_delta(self._prev("left", epoch_id), dl, self.pk_left)
        r_new = apply_delta(self._prev("right", epoch_id), dr, self.pk_right)
        self._write("left", epoch_id, l_new)
        self._write("right", epoch_id, r_new)

        l_new = self._read("left", epoch_id)
        r_new = self._read("right", epoch_id)

        view_old = self._prev("view", epoch_id)
        changed_l = dl.select(self.pk_left)
        changed_r = dr.select(F.col(self.pk_right).alias("__jk"))
        if view_old is None:
            carried = None
        else:
            carried = view_old.join(
                F.broadcast(changed_l), self.pk_left, "left_anti"
            ).join(
                F.broadcast(changed_r),
                F.col(self.join_key) == F.col("__jk"),
                "left_anti",
            )
        # left rows needing (re)join: their pk changed, or their join key
        # points at a changed right key — delta-sized by construction
        repair_l = l_new.join(
            F.broadcast(changed_l), self.pk_left, "left_semi"
        ).unionByName(
            l_new.join(
                F.broadcast(changed_r),
                F.col(self.join_key) == F.col("__jk"),
                "left_semi",
            )
        ).dropDuplicates([self.pk_left])
        repaired = repair_l.join(
            r_new, F.col(self.join_key) == F.col(self.pk_right)
        ).select(
            *self.left_cols,
            *[c for c in self.right_cols if c != self.pk_right],
        )
        view_new = repaired if carried is None else carried.unionByName(repaired)
        self._write("view", epoch_id, view_new)

    def staged(self) -> bool:
        return os.path.exists(os.path.join(self.active, "_STAGED"))

    def run(self) -> None:
        if self._schema is None:  # attached to a pre-staged directory
            self._schema = self.spark.read.parquet(
                os.path.join(self.active, "b0.parquet")
            ).schema
        from .windowed import STATE_PARTITIONS, scoped_shuffle_partitions

        stream = (
            self.spark.readStream.schema(self._schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.active)
        )
        with scoped_shuffle_partitions(self.spark, STATE_PARTITIONS):
            self._run_stream(stream)

    def _run_stream(self, stream) -> None:
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: self._merge_epoch(df, eid))
            .option("checkpointLocation", self.ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def current_view(self) -> DataFrame:
        versions = self._versions("view")
        if not versions:
            raise RuntimeError("no committed view state")
        return self._read("view", versions[-1])


def harmonize_envelope(env: DataFrame, superset) -> DataFrame:
    """Rebuild before/after as the SUPERSET payload struct (missing
    columns null) so changelogs of different tables can ride one file
    stream — the parquet analog of a schema-per-table wire topic.
    superset: ordered (name, sql_type) pairs."""
    from ..sources.envelope import ENVELOPE_META, ENVELOPE_SEQ, payload_struct

    have = {f.name for f in payload_struct(env).fields}

    def conv(side: str):
        return F.when(
            F.col(side).isNotNull(),
            F.struct(
                *[
                    (
                        F.col(f"{side}.{c}") if c in have else F.lit(None)
                    ).cast(t).alias(c)
                    for c, t in superset
                ]
            ),
        )

    return env.select(
        ENVELOPE_TABLE_ID,
        ENVELOPE_OP,
        conv("before").alias("before"),
        conv("after").alias("after"),
        ENVELOPE_META,
        ENVELOPE_SEQ,
    )
