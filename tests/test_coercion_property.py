"""Differential property suite for DATA-plane record coercion.

The r7/r8 rounds differentially tested the schema ALGEBRA
(test_schema_evolution_property.py); this suite covers its data-plane
counterpart: random values coerced through random legal widening chains
via ``operators/coerce.py::coerce_envelope_payload`` (the Spark-cast
rendition of SchemaMergingUtils.coerceObject,
common/utils/SchemaMergingUtils.java:484-560 and
SchemaDerivator.coerceDataRecord, runtime/operators/schema/common/
SchemaDerivator.java:299) against a naive Python transcription of the
coercion contract.

Invariants checked per cell:
  * NULL in -> NULL out; a NON-null value NEVER becomes null through a
    legal widening (the lattice promises losslessness — a silently
    nulling cast is the exact bug class ANSI-off Spark hides);
  * exact-numeric widenings preserve the integer/decimal value exactly;
  * float widenings preserve the IEEE value (float -> double widens the
    representation, never perturbs it);
  * to-string coercions parse back to the source value;
  * a two-step chain src -> mid -> dst lands on the same result as the
    direct src -> dst coercion whenever mid is on the widening path
    (chain-consistency: the SchemaOperator may deliver widenings one
    DDL at a time or collapsed);
  * missing target columns are null-padded, renamed columns follow
    source_names, and a NULL before/after image stays NULL.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from flink_cdc_spark.core import types as ct
from flink_cdc_spark.core.schema_evolution import (
    _TYPE_MERGING_TREE,
    get_least_common_type,
)
from flink_cdc_spark.operators.coerce import coerce_envelope_payload
from flink_cdc_spark.sources.envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# source types whose Spark mapping is exercisable with plain Python
# literals (TIME/TIMESTAMP_TZ map to int/string columns — covered by the
# int/string entries; ARRAY/MAP/ROW/VARIANT widen only to string and are
# pinned in the spec corpus)
_INT_BOUNDS = {
    ct.TINYINT: 127,
    ct.SMALLINT: 32767,
    ct.INT: 2147483647,
    ct.BIGINT: 9223372036854775807,
}


@st.composite
def column_case(draw):
    """(source ct type, target ct type on the widening path, value)."""
    kind = draw(
        st.sampled_from(
            ["tinyint", "smallint", "int", "bigint", "float", "double",
             "decimal", "string", "boolean", "date", "timestamp"]
        )
    )
    if kind in ("tinyint", "smallint", "int", "bigint"):
        src = {"tinyint": ct.tinyint(), "smallint": ct.smallint(),
               "int": ct.int_(), "bigint": ct.bigint()}[kind]
        bound = _INT_BOUNDS[src.root]
        val = draw(st.one_of(st.none(), st.integers(-bound, bound)))
    elif kind == "float":
        src = ct.float_()
        # values exactly representable in float32 so widening is lossless
        val = draw(st.one_of(st.none(), st.integers(-2**20, 2**20).map(
            lambda n: float(n) / 4.0)))
    elif kind == "double":
        src = ct.double()
        val = draw(st.one_of(st.none(), st.floats(
            allow_nan=False, allow_infinity=False, width=64)))
    elif kind == "decimal":
        p = draw(st.integers(1, 18))
        s = draw(st.integers(0, p))
        src = ct.decimal(p, s)
        unscaled = draw(st.one_of(
            st.none(), st.integers(-(10 ** p) + 1, (10 ** p) - 1)))
        val = None if unscaled is None else Decimal(unscaled).scaleb(-s)
    elif kind == "string":
        src = ct.string()
        val = draw(st.one_of(st.none(), st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=12)))
    elif kind == "boolean":
        src = ct.boolean()
        val = draw(st.one_of(st.none(), st.booleans()))
    elif kind == "date":
        src = ct.date()
        val = draw(st.one_of(st.none(), st.dates(
            datetime.date(1900, 1, 1), datetime.date(2100, 1, 1))))
    else:  # timestamp (NTZ)
        src = ct.timestamp(6)
        val = draw(st.one_of(st.none(), st.datetimes(
            datetime.datetime(1900, 1, 1), datetime.datetime(2100, 1, 1))))
    # target: somewhere up this source's widening tree (always legal),
    # or the source itself (identity coercion)
    tree = [t for t in _TYPE_MERGING_TREE[src.root]
            if t.root != ct.TIMESTAMP_TZ]  # TZ renders as string already
    target = draw(st.sampled_from([src] + tree))
    # keep decimal targets wide enough for the drawn source value
    if target.root == ct.DECIMAL and src.root in _INT_BOUNDS:
        target = get_least_common_type(src, target)
    return src, target, val


def _expect(val, src, dst):
    """Naive Python transcription of the coerceObject contract for the
    checked invariants. Returns ('exact', v) | ('parseback', src, v)."""
    ts_family = (ct.TIMESTAMP, ct.TIMESTAMP_LTZ)
    if val is None:
        return ("exact", None)
    if dst.root == src.root:
        # identity or a precision widening within the same root
        return ("exact", val)
    if src.root in ts_family and dst.root in ts_family:
        # NTZ <-> LTZ under the pinned-UTC session keeps the wall clock
        return ("exact", val)
    if src.root == ct.DATE and dst.root in ts_family:
        return ("exact", datetime.datetime.combine(val, datetime.time()))
    if src.root in _INT_BOUNDS and dst.root in _INT_BOUNDS:
        return ("exact", int(val))
    if src.root in _INT_BOUNDS and dst.root == ct.DECIMAL:
        return ("exact", Decimal(int(val)).scaleb(0))
    if dst.root in (ct.FLOAT, ct.DOUBLE):
        return ("exact", float(val))
    return ("parseback", val)


def _check_cell(got, val, src, dst):
    mode, expect = _expect(val, src, dst)[0], _expect(val, src, dst)[1]
    if expect is None:
        assert got is None
        return
    # the lattice promise: a legal widening never nulls a value
    assert got is not None, f"{src} -> {dst} nulled value {val!r}"
    if mode == "exact":
        if isinstance(expect, float):
            assert got == expect or (math.isnan(got) and math.isnan(expect))
        elif isinstance(expect, Decimal):
            assert Decimal(got) == expect
        else:
            assert got == expect, f"{src} -> {dst}: {val!r} -> {got!r}"
        return
    # parse-back: the string rendition must round-trip to the source value
    s = got
    assert isinstance(s, str)
    if src.root in _INT_BOUNDS:
        assert int(s) == int(val)
    elif src.root == ct.DECIMAL:
        assert Decimal(s) == val
    elif src.root == ct.BOOLEAN:
        assert s.lower() == ("true" if val else "false")
    elif src.root == ct.DATE:
        assert datetime.date.fromisoformat(s) == val
    elif src.root == ct.TIMESTAMP:
        assert datetime.datetime.fromisoformat(s.replace(" ", "T")) == val
    elif src.root in (ct.FLOAT, ct.DOUBLE):
        assert float(s) == float(val)
    else:
        assert s == str(val)


def _envelope(spark, cases, rows_vals):
    src_struct = T.StructType(
        [T.StructField(f"c{i}", ct.to_spark_type(src), True)
         for i, (src, _t, _v) in enumerate(cases)]
    )
    schema = T.StructType([
        T.StructField(ENVELOPE_TABLE_ID, T.StringType(), False),
        T.StructField(ENVELOPE_OP, T.StringType(), False),
        T.StructField("before", src_struct, True),
        T.StructField("after", src_struct, True),
        T.StructField(ENVELOPE_META, T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(ENVELOPE_SEQ, T.LongType(), False),
    ])
    rows = [("db.t", "INSERT", None, tuple(vals), {}, i)
            for i, vals in enumerate(rows_vals)]
    return spark.createDataFrame(rows, schema)


@SETTINGS
@given(st.lists(column_case(), min_size=1, max_size=6))
def test_coercion_matches_naive_model(spark, cases):
    """Spark-cast coercion == the naive coerceObject transcription for
    every (source type, widened target, value) cell; NULL images stay
    NULL; the null row exercises image-level null propagation."""
    tgt_struct = T.StructType(
        [T.StructField(f"c{i}", ct.to_spark_type(tgt.null()), True)
         for i, (_s, tgt, _v) in enumerate(cases)]
    )
    env = _envelope(spark, cases, [[v for (_s, _t, v) in cases]])
    out = coerce_envelope_payload(env, tgt_struct).collect()
    assert len(out) == 1
    row = out[0]
    assert row["before"] is None  # NULL image stays NULL
    for i, (src, tgt, val) in enumerate(cases):
        _check_cell(row["after"][f"c{i}"], val, src, tgt)


_INT_FAMILY = (ct.TINYINT, ct.SMALLINT, ct.INT, ct.BIGINT)


def _mid_types(src, dst):
    """Genuine intermediates on the widening path src -> mid -> dst
    (mid != src, mid != dst, and dst still reachable from mid).

    For STRING targets only value-rendition-preserving hops qualify:
    the rendered text depends on the stored representation (smallint 0
    -> '0' directly, but -> float -> '0.0'; date -> '2024-01-01' but
    -> timestamp -> '2024-01-01 00:00:00'), and the reference has the
    same path-dependence — coerceObject renders whatever type the
    column CURRENTLY stores. So through-string chains restrict mids to
    the exact-integer family (whose decimal text is stable)."""
    out = []
    string_dst = dst.root in (ct.CHAR, ct.VARCHAR)
    for m in _TYPE_MERGING_TREE[src.root]:
        if m.root in (dst.root, src.root, ct.TIMESTAMP_TZ):
            continue
        if string_dst and not (
            src.root in _INT_FAMILY and m.root in _INT_FAMILY
        ):
            continue
        if any(t.root == dst.root for t in _TYPE_MERGING_TREE[m.root]):
            out.append(m)
    return out


@SETTINGS
@given(st.data(), st.lists(column_case(), min_size=1, max_size=4))
def test_coercion_chain_consistency(spark, data, cases):
    """src -> mid -> dst equals src -> dst directly for a genuine
    intermediate on the widening path (e.g. tinyint -> int -> double):
    the SchemaOperator may deliver widenings one AlterColumnType at a
    time or collapsed; the record must land identically."""
    mids = []
    for (src, tgt, _v) in cases:
        pool = _mid_types(src, tgt)
        mids.append(
            data.draw(st.sampled_from(pool)) if pool
            else get_least_common_type(src, tgt)
        )
    mid_struct = T.StructType(
        [T.StructField(f"c{i}", ct.to_spark_type(m.null()), True)
         for i, m in enumerate(mids)]
    )
    tgt_struct = T.StructType(
        [T.StructField(f"c{i}", ct.to_spark_type(tgt.null()), True)
         for i, (_s, tgt, _v) in enumerate(cases)]
    )
    env = _envelope(spark, cases, [[v for (_s, _t, v) in cases]])
    direct = coerce_envelope_payload(env, tgt_struct).collect()[0]["after"]
    chained = coerce_envelope_payload(
        coerce_envelope_payload(env, mid_struct), tgt_struct
    ).collect()[0]["after"]
    assert direct == chained, f"chain diverged: {direct} != {chained}"


def test_coercion_null_pad_and_rename(spark):
    """Missing target columns null-pad; renamed columns map via
    source_names (rename_map_through contract)."""
    cases = [(ct.int_(), ct.bigint(), 7)]
    env = _envelope(spark, cases, [[7]])
    tgt = T.StructType([
        T.StructField("renamed", T.LongType(), True),
        T.StructField("added", T.StringType(), True),
    ])
    out = coerce_envelope_payload(
        env, tgt, source_names={"renamed": "c0"}
    ).collect()[0]["after"]
    assert out["renamed"] == 7 and out["added"] is None


# -- as-of join differential (same suite: Spark plan vs naive model) --------


@SETTINGS
@given(
    st.lists(  # events: (user, t)
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=1, max_size=12),
    st.lists(  # orders: (user, t, okey-seed)
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=0, max_size=12),
)
def test_asof_enrich_matches_bruteforce(spark, evs, ords):
    """The merge-formulation as-of join equals the brute-force
    latest-at-or-before scan for random interleavings, including
    same-instant ties (resolved to the highest order key) and users with
    no prior orders."""
    import datetime

    from flink_cdc_spark.datapipe import features

    base = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    ev_rows = [(i + 1, base + t * day, u) for i, (u, t) in enumerate(evs)]
    ord_rows = [(100 + i, u, base + t * day) for i, (u, t) in enumerate(ords)]
    ev = spark.createDataFrame(
        ev_rows, "event_id long, ts timestamp_ntz, user_id long")
    orders = spark.createDataFrame(
        ord_rows, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz")
    got = {r.event_id: (r.order_key, r.order_t_us)
           for r in features.asof_enrich(ev, orders).collect()}

    def us(dt):
        import datetime as _dt
        return int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6)

    expect = {}
    for (eid, ets, u) in ev_rows:
        cands = [(ot, ok) for (ok, ou, ot) in ord_rows
                 if ou == u and ot <= ets]
        if cands:
            best = max(cands)  # (latest date, then highest key)
            expect[eid] = (best[1], us(best[0]))
        else:
            expect[eid] = (None, None)
    assert got == expect
