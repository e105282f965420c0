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

State tables (the folded left+right table keyed by (__left, __pk), and
the view) are versioned by epoch id exactly like retract_agg: an epoch
always merges from its committed PREDECESSOR and overwrites its own
version, so foreachBatch crash-retries are idempotent. Money columns
ride as exact integer cents. Folding both sides into ONE keyed state
table (possible because the stream is harmonized to a superset payload)
means an epoch is two state writes and one delta shuffle, not three and
two — per-epoch job count was the r9 bench's dominant cost.

Scale: at real scale the state tables would live bucketed by their key
in a table format (the repo's lsm/iceberg stores); the parquet versions
here keep the same keyed-merge plan shape. The repair join broadcasts
the affected left segment only when it is small — it is delta-sized by
construction.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .retract_agg import stage_replay_batches, staged_schema
from ..sources.envelope import ENVELOPE_OP, ENVELOPE_TABLE_ID, OP_DELETE, OP_INSERT, OP_UPDATE

N_REPLAY_BATCHES = 4


def two_sided_delta(
    env: DataFrame,
    left_table_id: str,
    pk_left: str,
    pk_right: str,
) -> DataFrame:
    """Per-key last image of one interleaved batch, BOTH sides in one
    shuffle: (__left, __pk, __alive, after). Requires the harmonized
    superset payload (harmonize_envelope) and pks of a comparable type.
    __alive=false is a tombstone (the key was deleted)."""
    from pyspark.sql import Window

    from ..sources.envelope import ENVELOPE_SEQ

    is_left = F.col(ENVELOPE_TABLE_ID) == left_table_id
    pk_col = F.when(
        is_left,
        F.coalesce(F.col(f"after.{pk_left}"), F.col(f"before.{pk_left}")),
    ).otherwise(
        F.coalesce(F.col(f"after.{pk_right}"), F.col(f"before.{pk_right}")),
    )
    w = Window.partitionBy("__left", "__pk").orderBy(F.col(ENVELOPE_SEQ).desc())
    return (
        env.select("*", is_left.alias("__left"), pk_col.alias("__pk"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "__left",
            "__pk",
            (F.col(ENVELOPE_OP) != OP_DELETE).alias("__alive"),
            "after",
        )
    )


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
        """Inserts of both tables, then updates, then deletes — mutations
        always target rows accumulated in earlier micro-batches, on both
        sides. Three epochs: the r9 bench showed per-epoch cost is
        dominated by the two state writes regardless of batch size, so
        the old parity split of inserts over two epochs bought no extra
        coverage (update epochs already exercise state-merge-onto-state)
        for a full extra epoch of fixed overhead."""
        env = env.withColumn(
            "__b",
            F.when(F.col(ENVELOPE_OP) == OP_INSERT, F.lit(0))
            .when(F.col(ENVELOPE_OP) == OP_UPDATE, F.lit(1))
            .otherwise(F.lit(2)),
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
        """One epoch = TWO state writes (the folded left+right table and
        the view), not three: both sides' last images reduce in one
        shuffle (two_sided_delta), both sides' state lives in one keyed
        parquet table partitioned by (__left, __pk) — the r9 verdict's
        per-epoch-overhead item."""
        delta = two_sided_delta(
            batch_df, self.left_table_id, self.pk_left, self.pk_right
        ).cache()  # consumed ~7x below (live, lr anti, view anti x2, semi x2, join)
        live = delta.where(F.col("__alive")).select("__left", "__pk", "after.*")
        lr_old = self._prev("lr", epoch_id)
        if lr_old is None:
            lr_new = live
        else:
            changed = delta.select("__left", "__pk")
            lr_new = lr_old.join(
                F.broadcast(changed), ["__left", "__pk"], "left_anti"
            ).unionByName(live)
        self._write("lr", epoch_id, lr_new)
        lr = self._read("lr", epoch_id)
        l_new = lr.where(F.col("__left")).select(*self.left_cols)
        r_new = lr.where(~F.col("__left")).select(*self.right_cols)

        view_old = self._prev("view", epoch_id)
        changed_l = delta.where(F.col("__left")).select(
            F.col("__pk").alias(self.pk_left)
        )
        changed_r = delta.where(~F.col("__left")).select(
            F.col("__pk").alias("__jk")
        )
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
        # aliased sides: when the left's join-key column NAME equals the
        # right's pk name (the common FK==PK-name CDC layout), a bare
        # F.col is AMBIGUOUS_REFERENCE — caught by the r10 randomized
        # streaming differential; the contract fixture's distinct
        # o_custkey/c_custkey names had masked it
        repaired = repair_l.alias("__l").join(
            r_new.alias("__r"),
            F.col(f"__l.{self.join_key}") == F.col(f"__r.{self.pk_right}"),
        ).select(
            *[F.col(f"__l.{c}") for c in self.left_cols],
            *[
                F.col(f"__r.{c}")
                for c in self.right_cols
                if c != self.pk_right
            ],
        )
        view_new = repaired if carried is None else carried.unionByName(repaired)
        try:
            self._write("view", epoch_id, view_new)
        finally:
            delta.unpersist()

    def staged(self) -> bool:
        return os.path.exists(os.path.join(self.active, "_STAGED"))

    def run(self) -> None:
        if self._schema is None:  # attached to a pre-staged directory
            self._schema = staged_schema(self.spark, self.active)
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
        from .windowed import unload_state_store_providers

        unload_state_store_providers(self.spark)

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
