"""Global sequence numbers WITHOUT a global single-partition window.

A changelog decoder needs a total order over its polled slice (the
envelope sequence), but ``Window.orderBy(...)`` with no partition moves
every row to ONE task — the scale-killer the round-9 audit flagged in
three decoders. The decomposition used here is the textbook fix (the
same shape as TeraSort's range-boundary pass):

    rank over (band, k)  ==  rank of k within its band
                             + cumulative count of keys in earlier bands

The only serialized window then runs over the per-band AGGREGATE (one
row per transaction/commit/cluster-time in the slice — orders of
magnitude smaller than the change rows), and the offsets join back
broadcast on the band key the intra-band window already shuffled on.

Reference scope: the per-event ordering contracts of
``Db2Connection.java`` GET_ALL_CHANGES pairing, SQL Server
``cdc.*_CT`` ``__$seqval`` ordering, and the Mongo resume-token
sequence; the reference serializes these per poll on one reader thread
— here the per-band work stays distributed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def banded_global_rank(
    df: DataFrame,
    band: str,
    order: Sequence[str] | str,
    out: str,
    dense: bool = True,
    within: Sequence[str] | str | None = None,
) -> DataFrame:
    """Add ``out`` = the 1-based global rank of each row under
    ``ORDER BY band, *order``, computed as intra-band rank plus a
    cumulative per-band offset.

    ``dense=True`` reproduces ``dense_rank`` (ties on the full ordering
    tuple share a rank; offsets count DISTINCT order tuples per band);
    ``dense=False`` reproduces ``row_number`` over a globally unique
    ordering (offsets count rows per band — only use when (band, order)
    is unique per row, else numbering within ties is nondeterministic,
    exactly as row_number itself would be).

    ``within`` scopes the whole ranking: ranks restart at 1 per
    ``within`` group, and the cumulative-offset window partitions by it
    (so with ``within`` the offsets pass isn't even single-partition —
    it distributes across the groups).
    """
    order_cols = [order] if isinstance(order, str) else list(order)
    scope = (
        [] if within is None
        else [within] if isinstance(within, str)
        else list(within)
    )
    w_intra = Window.partitionBy(*scope, band).orderBy(*order_cols)
    intra = (F.dense_rank() if dense else F.row_number()).over(w_intra)
    # dense offsets must count NULL order tuples the way dense_rank
    # ranks them (NULL is a rankable value) — bare countDistinct would
    # skip all-NULL tuples and undercount the cumulative offsets, making
    # global ranks collide across bands. A struct is never NULL even
    # when its fields are, so countDistinct(struct(...)) counts exactly
    # the distinct ordering tuples.
    counter = (
        F.countDistinct(F.struct(*order_cols)) if dense else F.count(F.lit(1))
    ).alias("__n")
    per_band = df.groupBy(*scope, band).agg(counter)
    # lit(0) partition (unscoped case): the per-band aggregate is small
    # by construction (one row per band in the polled slice) — the
    # single partition is intentional, not an accident of a missing key.
    w_off = (
        Window.partitionBy(*(scope or [F.lit(0)]))
        .orderBy(band)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_band.select(
        *scope,
        band,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        df.withColumn("__intra", intra)
        .join(F.broadcast(offsets), [*scope, band])
        .withColumn(out, (F.col("__off") + F.col("__intra")).cast("long"))
        .drop("__intra", "__off")
    )
