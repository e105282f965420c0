"""Size-disciplined broadcast hints for the analytics family.

A hard ``F.broadcast()`` hint bypasses ``autoBroadcastJoinThreshold``
entirely: Spark WILL collect the frame to the driver and ship it to
every executor no matter how big it turns out to be.  That is correct
only when the frame's size is bounded by something other than the
corpus — a fixed-cardinality dimension (nation is 25 rows at every
scale factor), a provably-sublinear derivation (HAVING survivors), or a
1-row scalar aggregate.  A frame that is a *constant fraction* of a
scale-proportional table (1/5 of customer, the PROMO slice of part) is
trivially broadcastable at sf0.1 and a guaranteed OOM in the broadcast
exchange at 100 TB.

``broadcast_if_bounded`` makes the classification explicit at every
call site.  Bounded reasons get the hard hint (they deserve it — AQE
would also pick it, but the hint documents intent and saves the
initial sort-merge planning).  Scale-proportional frames are returned
UNHINTED: adaptive query execution (enabled engine-wide with a 64 MB
adaptive threshold, see ``session.py``) converts the join to broadcast
at runtime whenever the materialized side actually fits — so the
physical plan at test scale is identical, while at 100 TB the same
query degrades gracefully to a shuffle join instead of dying.

``tests/test_broadcast_discipline.py`` pins the discipline: no raw
``F.broadcast`` may appear in the analytics family, every reason must
be one of the vocabulary below, and the scale-proportional path must
leave the plan hint-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Cardinality fixed by the schema, not the corpus (region=5, nation=25
#: at every TPC-H scale factor; any frame derived from them alone).
FIXED = "fixed-cardinality"

#: Provably sublinear in the corpus (e.g. groups surviving a HAVING
#: threshold whose count shrinks as data grows relative to the corpus).
SUBLINEAR = "sublinear"

#: A 1-row (or group-cardinality-bounded) aggregate used as a scalar.
SCALAR = "scalar-aggregate"

#: A constant fraction of a table that grows with the scale factor —
#: NEVER hard-hinted; AQE decides at runtime from the measured size.
SCALE_PROPORTIONAL = "scale-proportional"

_HINTED = frozenset({FIXED, SUBLINEAR, SCALAR})
_KNOWN = _HINTED | {SCALE_PROPORTIONAL}


def broadcast_if_bounded(df: DataFrame, reason: str) -> DataFrame:
    """Apply a broadcast hint only when ``reason`` proves the frame's
    size is corpus-independent; otherwise return ``df`` unchanged and
    let AQE pick the join strategy from the runtime size."""
    if reason not in _KNOWN:
        raise ValueError(
            f"unknown broadcast reason {reason!r}; expected one of {sorted(_KNOWN)}"
        )
    if reason in _HINTED:
        return F.broadcast(df)
    return df
