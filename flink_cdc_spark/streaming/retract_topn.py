"""Per-group Top-N maintained under a CDC changelog — Flink SQL's
retract Top-N (the rank operator the reference's pipelines feed into
Flink SQL; reference semantics: flink's RetractableTopNFunction —
a ranked view stays correct when INSERT/UPDATE/DELETE re-orders rows,
re-emitting only the groups an update touched).

Spark rendition, same epoch-keyed idempotent state machine as
retract_agg / incremental_join:

  * state table ``tbl`` = per-key last images (keyed merge: broadcast
    anti-join on the batch's delta keys, union the live images);
  * view table ``topn`` = per-group Top-N. Per epoch the Top-N is
    recomputed ONLY for groups the batch touched — including the
    BEFORE-image group of every update (a group-moving update must
    repair the group it left, or the view keeps a ghost row); every
    untouched group's rows carry forward by broadcast anti-join.

Per-epoch cost is proportional to (delta keys + rows of touched
groups), never to the view: the retract contract. Both state tables are
versioned by epoch id, always merging from the committed predecessor —
crash-retried epochs rewrite their own version (idempotent
foreachBatch). Money rides as exact integer cents.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.envelope import ENVELOPE_OP, ENVELOPE_SEQ, OP_DELETE, OP_INSERT, OP_UPDATE
from .retract_agg import stage_replay_batches, staged_schema


class RetractTopNStream:
    """Maintains ``SELECT *, row_number() OVER (PARTITION BY group
    ORDER BY value DESC, key ASC) <= n`` over a replayed changelog."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key: str,
        group: str,
        value: str,
        n: int = 2,
        staged_dir: Optional[str] = None,
    ):
        self.spark = spark
        self.key = key
        self.group = group
        self.value = value
        self.n = n
        self.active = staged_dir or os.path.join(work_dir, "active")
        self.ckpt = os.path.join(work_dir, "ckpt")
        self.state_dir = os.path.join(work_dir, "state")
        os.makedirs(self.active, exist_ok=True)
        os.makedirs(self.state_dir, exist_ok=True)
        self._schema = None

    # -- staging (retract_agg pattern: inserts, updates, deletes) -----------

    def stage(self, env: DataFrame) -> None:
        env = env.withColumn(
            "__b",
            F.when(F.col(ENVELOPE_OP) == OP_INSERT, F.lit(0))
            .when(F.col(ENVELOPE_OP) == OP_UPDATE, F.lit(1))
            .otherwise(F.lit(2)),
        )
        self._schema = env.drop("__b").schema
        stage_replay_batches(env, self.active)

    def staged(self) -> bool:
        return os.path.exists(os.path.join(self.active, "_STAGED"))

    # -- versioned state (retract_agg pattern) -------------------------------

    def _versions(self):
        root = os.path.join(self.state_dir, "both")
        if not os.path.isdir(root):
            return []
        return sorted(
            int(fn[1:])
            for fn in os.listdir(root)
            if fn.startswith("v")
            and os.path.exists(os.path.join(root, fn, "_SUCCESS"))
        )

    def _read(self, name: str, v: int) -> DataFrame:
        df = self.spark.read.parquet(
            os.path.join(self.state_dir, "both", f"v{v}")
        ).where(F.col("__t") == name)
        if name == "tbl":
            return df.select("__pk", self.group, self.key, "value_cents")
        return df.select(self.group, self.key, "value_cents", "rnk")

    def _prev(self, name: str, epoch: int) -> Optional[DataFrame]:
        prior = [v for v in self._versions() if v < epoch]
        return self._read(name, max(prior)) if prior else None

    def _write_epoch(self, epoch: int, tbl_new: DataFrame, topn_new: DataFrame) -> None:
        """Both state tables land in ONE partitioned write: one Spark job
        per epoch instead of two (the write is the dominant per-epoch
        cost). Commit atomicity comes from the _SUCCESS gate in
        _versions, not the single job per se — a crash mid-write leaves
        a partial v{epoch} dir that is simply never read. The job
        references tbl_new twice (directly and via topn_new's
        affected-groups lineage); the caller caches it for the write's
        duration so the keyed anti-join computes once per epoch."""
        both = tbl_new.withColumn("__t", F.lit("tbl")).unionByName(
            topn_new.withColumn("__t", F.lit("topn")),
            allowMissingColumns=True,
        )
        both.write.mode("overwrite").partitionBy("__t").parquet(
            os.path.join(self.state_dir, "both", f"v{epoch}")
        )

    # -- the maintenance epoch ------------------------------------------------

    def _merge_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        k, g, v = self.key, self.group, self.value
        pk = F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}"))
        w = Window.partitionBy("__pk").orderBy(F.col(ENVELOPE_SEQ).desc())
        delta = (
            batch_df.withColumn("__pk", pk)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "__pk",
                (F.col(ENVELOPE_OP) != OP_DELETE).alias("__alive"),
                F.col(f"after.{g}").alias("__g_new"),
                # the state table stores ONLY the ranked attributes —
                # group, key, exact-cents value — not the full payload:
                # per-epoch state write volume is O(keys x 3 columns),
                # not O(keys x table width)
                F.col(f"after.{k}").alias(k),
                F.expr(f"CAST(floor(after.{v} * 100 + 0.5) AS BIGINT)").alias(
                    "value_cents"
                ),
            )
        ).cache()
        # touched groups: the group a key lands in AND every group any of
        # the batch's images mention (a group-moving update repairs the
        # group it left; a delete repairs the group it leaves)
        touched = (
            delta.select(F.col("__g_new").alias("__g"))
            .unionByName(
                batch_df.select(F.col(f"before.{g}").alias("__g"))
            )
            .unionByName(batch_df.select(F.col(f"after.{g}").alias("__g")))
        )

        live = delta.where(F.col("__alive")).select(
            "__pk", F.col("__g_new").alias(g), k, "value_cents"
        )
        tbl_old = self._prev("tbl", epoch_id)
        if tbl_old is not None:
            # a changelog whose DELETEs carry a NULL before image names no
            # group to repair — the key silently leaves the state table but
            # its old topn row would survive as a ghost. The state table's
            # own current group for every delta key closes that hole (and
            # subsumes before.g when images are complete); one semi-join
            # against the broadcast delta keyset, bounded by the delta.
            touched = touched.unionByName(
                tbl_old.join(
                    F.broadcast(delta.select("__pk")), "__pk", "left_semi"
                ).select(F.col(g).alias("__g"))
            )
        touched = touched.where(F.col("__g").isNotNull()).distinct()
        if tbl_old is None:
            tbl_new = live
        else:
            changed = delta.select("__pk")
            tbl_new = tbl_old.join(
                F.broadcast(changed), "__pk", "left_anti"
            ).unionByName(live)
        # tbl_new feeds BOTH branches of the single epoch write (directly
        # and via topn's affected-groups lineage) — cache it so the keyed
        # anti-join over the previous version computes once per epoch,
        # not twice (r13 A/B, interleaved: 5.03/6.31/4.75 -> 4.57/4.78/4.07)
        tbl_new = tbl_new.cache()
        try:
            # the cache() sits inside the try so an exception anywhere in
            # the top-n recompute can't leak the cached frame for the
            # session lifetime (ADVICE r13)
            topn_old = self._prev("topn", epoch_id)
            # the top-n recompute consumes the tbl_new PLAN directly (a
            # cheap broadcast anti-join over the previous parquet version
            # + the cached delta) — no write-then-read-back barrier
            affected = tbl_new.join(
                F.broadcast(touched), tbl_new[g] == F.col("__g"), "left_semi"
            )
            wv = Window.partitionBy(g).orderBy(
                F.col("value_cents").desc(), F.col(k).asc()
            )
            recomputed = (
                affected.withColumn(
                    "rnk", F.row_number().over(wv).cast("bigint")
                )
                .where(F.col("rnk") <= self.n)
                .select(F.col(g), F.col(k), F.col("value_cents"), "rnk")
            )
            if topn_old is None:
                topn_new = recomputed
            else:
                carried = topn_old.join(
                    F.broadcast(touched),
                    topn_old[g] == F.col("__g"),
                    "left_anti",
                )
                topn_new = carried.unionByName(recomputed)
            self._write_epoch(epoch_id, tbl_new, topn_new)
        finally:
            delta.unpersist()
            tbl_new.unpersist()

    # -- the streaming query ---------------------------------------------------

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

    def current_topn(self) -> DataFrame:
        versions = self._versions()
        if not versions:
            raise RuntimeError("no committed topn state")
        return self._read("topn", versions[-1])


def retract_topn_oracle_sql(
    final_state_sql: str, key: str, group: str, value: str, n: int
) -> str:
    """The maintained view must equal a from-scratch Top-N over the
    post-changelog final state."""
    cents = f"CAST(floor({value} * 100 + 0.5) AS BIGINT)"
    return f"""
    WITH fs AS ({final_state_sql}),
    ranked AS (
      SELECT {group}, {key}, {cents} AS value_cents,
             CAST(row_number() OVER (
                    PARTITION BY {group}
                    ORDER BY {cents} DESC, {key} ASC) AS BIGINT) AS rnk
      FROM fs
    )
    SELECT {group}, {key}, value_cents, rnk FROM ranked WHERE rnk <= {n}
    """
