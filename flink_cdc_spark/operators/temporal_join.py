"""Event-time temporal table join — ``FOR SYSTEM_TIME AS OF e.ts`` over
an SCD2 validity-interval history.

This is the reference's headline consumer of the changelog model: Flink
CDC materializes a versioned table and Flink SQL joins a probe stream
against it with ``FOR SYSTEM_TIME AS OF`` (temporal table join,
docs/content/docs/core-concept/transform.md's delegation to Flink SQL;
the versioned-table contract is what FlinkPipelineComposer's sink side
feeds). `operators/scd2.py` PRODUCES the history; this operator CONSUMES
it: each probe row joins the dimension version whose validity interval
contains the probe timestamp —

    valid_from_ts <= probe.ts AND (valid_to_ts IS NULL OR probe.ts < valid_to_ts)

with LEFT semantics: a probe before the key's first version, after its
DELETE, or with an unknown/NULL key passes through unenriched (all-NULL
dimension columns), exactly like SQL's LEFT JOIN ... FOR SYSTEM_TIME AS OF.

Scale shape — the MERGE formulation, not the range join:

  * Tag and union three row kinds: interval CLOSES (kind 0, at
    valid_to_ts, carrying an "invalid" marker), interval OPENS (kind 1,
    at valid_from_ts, carrying the version payload), and PROBES (kind 2).
  * ONE hash exchange on the key, one per-key sort by
    (t, kind, version), and a running `last(ignorenulls)` carry of the
    dimension struct.  At a version boundary T (v_n closes and v_{n+1}
    opens at the same instant) the close sorts first, so a probe at
    exactly T sees v_{n+1}; a probe at exactly a DELETE's timestamp sees
    NULL — both matching the half-open interval contract above.
  * Never the probe x versions range cross-join: per-key work is a sort
    run over (2 x versions + probes) rows, the same shape as
    `datapipe/features.asof_enrich` and how kdb/Flink temporal joins
    scale out.  Skew is bounded by per-key event counts; NULL-key probes
    all land in one partition — pre-filter them if they dominate.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def temporal_join(
    probe: DataFrame,
    history: DataFrame,
    probe_key: str,
    probe_ts: str,
    dim_key: str,
    payload_cols: Sequence[str],
    valid_from: str = "valid_from_ts",
    valid_to: str = "valid_to_ts",
    version_col: Optional[str] = "valid_from_ver",
) -> DataFrame:
    """-> probe rows with `payload_cols` (and `version_col`, if given)
    appended from the dimension version valid AT the probe timestamp;
    NULLs when no version's interval contains it (LEFT semantics)."""
    dim_types = dict((f.name, f.dataType) for f in history.schema.fields)
    carry_cols = list(payload_cols) + ([version_col] if version_col else [])
    clash = set(carry_cols) & {f.name for f in probe.schema.fields}
    if clash:
        raise ValueError(
            f"probe and dimension column names collide: {sorted(clash)} — "
            "alias one side before the temporal join"
        )

    def _dim_struct(open_: bool):
        fields = [F.lit(open_).alias("__open")]
        for c in carry_cols:
            fields.append(
                (F.col(c) if open_ else F.lit(None).cast(dim_types[c])).alias(c)
            )
        return F.struct(*fields)

    probe_fields = [
        f for f in probe.schema.fields if f.name not in (probe_key, probe_ts)
    ]

    def _probe_cols(is_probe: bool):
        if is_probe:
            return [F.col(f.name) for f in probe_fields]
        return [F.lit(None).cast(f.dataType).alias(f.name) for f in probe_fields]

    null_dim = F.lit(None).cast(
        "struct<__open:boolean,"
        + ",".join(f"{c}:{dim_types[c].simpleString()}" for c in carry_cols)
        + ">"
    )
    # open + (optional) close emitted in ONE pass over the history — an
    # array explode, not a self-union, so the upstream history build
    # (e.g. the scd2 window) is scanned and exchanged exactly once
    open_el = F.struct(
        F.col(valid_from).alias("__t"),
        F.lit(1).alias("__kind"),
        _dim_struct(True).alias("__dim"),
    )
    close_el = F.when(
        F.col(valid_to).isNotNull(),
        F.struct(
            F.col(valid_to).alias("__t"),
            F.lit(0).alias("__kind"),
            _dim_struct(False).alias("__dim"),
        ),
    )
    dim_rows = history.select(
        F.col(dim_key).alias("__k"),
        F.explode(F.array_compact(F.array(open_el, close_el))).alias("__e"),
    ).select(
        "__k",
        F.col("__e.__t").alias("__t"),
        F.col("__e.__kind").alias("__kind"),
        F.col("__e.__dim").alias("__dim"),
        F.lit(False).alias("__is_probe"),
        *_probe_cols(False),
    )
    probes = probe.select(
        F.col(probe_key).alias("__k"),
        F.col(probe_ts).alias("__t"),
        F.lit(2).alias("__kind"),
        null_dim.alias("__dim"),
        F.lit(True).alias("__is_probe"),
        *_probe_cols(True),
    )
    merged = dim_rows.unionByName(probes)
    order = [F.col("__t").asc_nulls_first(), F.col("__kind").asc()]
    if version_col:
        order.append(F.col(f"__dim.{version_col}").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        "__cur", F.last("__dim", ignorenulls=True).over(w)
    )
    valid = F.col("__cur").isNotNull() & F.col("__cur.__open")
    out = [
        F.col("__k").alias(probe_key),
        F.col("__t").alias(probe_ts),
        *[F.col(f.name) for f in probe_fields],
    ]
    for c in carry_cols:
        out.append(
            F.when(valid, F.col(f"__cur.{c}")).otherwise(
                F.lit(None).cast(dim_types[c])
            ).alias(c)
        )
    return carried.where(F.col("__is_probe")).select(*out)
