"""SCD2 (type-2 slowly-changing-dimension) history materialization over
a CDC changelog — validity-interval history with an `is_current` flag.

This is the single most common downstream shape the changelog model
feeds: the reference exposes exactly this pattern through Flink SQL
temporal tables (flink-cdc's pipelines materialize a changelog that
Flink SQL then queries `FOR SYSTEM_TIME AS OF`; see
flink-cdc-composer's sink-side changelog contract,
FlinkPipelineComposer.java). The as-of join operator in this repo
CONSUMES such a table; this operator PRODUCES it from the envelope.

Semantics per primary key, events ordered by the envelope sequence:

  * every surviving image (INSERT or UPDATE after-image) opens a
    version interval at its per-key version number;
  * the next event on the same key — any op — closes the previous
    interval (an UPDATE supersedes it, a DELETE terminates it);
  * a DELETE emits no interval of its own: it only closes its
    predecessor, so a deleted key has no current row;
  * `is_current` marks the one open interval of each live key.

Versions are per-key ordinals (1, 2, ...) rather than raw envelope
sequence values: ordinals are deterministic under any monotone
re-sequencing of the same per-key event order (raw `__seq` values from
`monotonically_increasing_id` are partition-dependent), which is what
makes the result oracle-comparable and replay-stable.

Scale: ONE hash exchange on the primary key (the window), then map-only
projection — no broadcast, no driver materialization, no state. At
100 TB this is the minimal-shuffle shape for history building; skew is
bounded by events-per-key, which CDC keeps small.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..sources.envelope import ENVELOPE_OP, ENVELOPE_SEQ, OP_DELETE


def scd2_history(
    env: DataFrame,
    pk: str,
    payload_cols: Optional[Sequence[str]] = None,
    ts_expr: Optional[str] = None,
) -> DataFrame:
    """-> (pk, <payload...>, valid_from_ver, valid_to_ver, is_current):
    one row per surviving image of each key; `valid_to_ver` is NULL on
    the open interval, `is_current` true only there.

    When `ts_expr` is given (a SQL expression over the envelope yielding
    the change timestamp, e.g. ``CAST(__meta['op_ts'] AS TIMESTAMP)`` or
    a payload column), the output additionally carries
    `valid_from_ts` / `valid_to_ts` — the wall-clock validity interval
    the reference's `FOR SYSTEM_TIME AS OF` temporal join consumes
    (valid_to_ts = the NEXT event's timestamp on the key, NULL on the
    open interval). Same single pk exchange; the lead() rides the
    already-sorted window."""
    if payload_cols is None:
        payload_cols = [
            f.name for f in env.schema["after"].dataType.fields if f.name != pk
        ]
    pk_col = F.coalesce(F.col(f"after.{pk}"), F.col(f"before.{pk}"))
    w = Window.partitionBy(pk).orderBy(F.col(ENVELOPE_SEQ).asc())
    cols = [
        pk_col.alias(pk),
        F.col(ENVELOPE_SEQ).alias("__seq"),
        (F.col(ENVELOPE_OP) != OP_DELETE).alias("__alive"),
        *[F.col(f"after.{c}").alias(c) for c in payload_cols],
    ]
    if ts_expr is not None:
        cols.append(F.expr(ts_expr).alias("__change_ts"))
    events = env.select(*cols)
    versioned = events.withColumn(
        "valid_from_ver", F.row_number().over(w).cast("bigint")
    ).withColumn(
        # the NEXT event on the key (any op) closes this interval; its
        # ordinal is exactly from+1 when it exists
        "valid_to_ver",
        F.when(
            F.lead("__seq").over(w).isNotNull(),
            F.col("valid_from_ver") + F.lit(1),
        ).cast("bigint"),
    )
    out_cols = [pk, *payload_cols, "valid_from_ver", "valid_to_ver"]
    if ts_expr is not None:
        versioned = versioned.withColumn(
            "valid_from_ts", F.col("__change_ts")
        ).withColumn("valid_to_ts", F.lead("__change_ts").over(w))
        out_cols += ["valid_from_ts", "valid_to_ts"]
    return versioned.where(F.col("__alive")).select(
        *out_cols,
        F.col("valid_to_ver").isNull().alias("is_current"),
    )
