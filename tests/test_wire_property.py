"""Property-based checks (hypothesis) for the binary wire codecs added in
round 7: roundtrip identity and, where the format is memcomparable,
byte-order == value-order."""

import datetime
import decimal
import json

from hypothesis import given, settings, strategies as st

from flink_cdc_spark.sources import mysql_json_binary as jb
from flink_cdc_spark.sources import tikv_wire as tw
from flink_cdc_spark.sources.gtid import GtidSet
from flink_cdc_spark.sources.mongodb_source import (
    decode_resume_token,
    encode_resume_token,
)
from flink_cdc_spark.sources.mysql_binlog_wire import (
    decode_datetime2,
    decode_newdecimal,
    encode_datetime2,
    encode_newdecimal,
)

SETTINGS = settings(max_examples=200, deadline=None)


# -- TiDB record keys / row v2 ---------------------------------------------

i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@SETTINGS
@given(i64, i64)
def test_tikv_row_key_roundtrip(table_id, handle):
    assert tw.decode_row_key(tw.encode_row_key(table_id, handle)) == (
        table_id, handle,
    )


@SETTINGS
@given(st.lists(i64, min_size=2, max_size=6))
def test_tikv_handle_order_is_byte_order(handles):
    keys = [tw.encode_row_key(5, h) for h in handles]
    assert [h for _, h in sorted(zip(keys, handles))] == sorted(handles)


row_values = st.dictionaries(
    st.integers(min_value=1, max_value=40),
    st.one_of(
        st.none(),
        i64,
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=40),
    ),
    max_size=8,
)


@SETTINGS
@given(row_values)
def test_tikv_row_v2_roundtrip(values):
    types = {
        cid: ("long" if isinstance(v, int) else
              "double" if isinstance(v, float) else "string")
        for cid, v in values.items() if v is not None
    }
    enc = tw.encode_row_v2(values)
    assert tw.decode_row_v2(enc, types) == values


@SETTINGS
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64),
                min_size=2, max_size=6))
def test_tikv_double_encoding_order(ds):
    encs = [tw._encode_double_value(d) for d in ds]
    assert [d for _, d in sorted(zip(encs, ds))] == sorted(ds)


# -- MySQL NEWDECIMAL / DATETIME2 ------------------------------------------


@SETTINGS
@given(st.decimals(min_value=-10**16, max_value=10**16,
                   allow_nan=False, allow_infinity=False, places=2))
def test_newdecimal_roundtrip(d):
    enc = encode_newdecimal(d, 20, 2)
    got, off = decode_newdecimal(enc, 0, 20, 2)
    assert got == d.quantize(decimal.Decimal("0.01")) and off == len(enc)


@SETTINGS
@given(st.lists(st.decimals(min_value=-10**10, max_value=10**10,
                            allow_nan=False, allow_infinity=False, places=2),
                min_size=2, max_size=6))
def test_newdecimal_memcomparable(ds):
    qs = [d.quantize(decimal.Decimal("0.01")) for d in ds]
    encs = [encode_newdecimal(d, 16, 2) for d in qs]
    assert [d for _, d in sorted(zip(encs, qs), key=lambda t: t[0])] == sorted(qs)


@SETTINGS
@given(st.datetimes(min_value=datetime.datetime(1000, 1, 1),
                    max_value=datetime.datetime(9999, 12, 31)))
def test_datetime2_roundtrip(dt):
    dt = dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    enc = encode_datetime2(dt, 3)
    got, off = decode_datetime2(enc, 0, 3)
    assert got == dt and off == len(enc)


# -- MySQL JSON binary ------------------------------------------------------

json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=30),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(min_size=1, max_size=10), children, max_size=5),
    ),
    max_leaves=12,
)


@SETTINGS
@given(json_values)
def test_json_binary_roundtrip(doc):
    assert jb.decode_json_binary(jb.encode_json_binary(doc)) == doc


@SETTINGS
@given(json_values)
def test_json_binary_text_stable(doc):
    """encode∘decode is a fixpoint: re-encoding the decoded doc yields
    identical bytes (key ordering is canonical)."""
    enc = jb.encode_json_binary(doc)
    assert jb.encode_json_binary(jb.decode_json_binary(enc)) == enc


# -- GTID sets --------------------------------------------------------------

intervals = st.lists(
    st.tuples(st.integers(1, 10**6), st.integers(0, 100)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=0, max_size=5,
)
gtid_sets = st.dictionaries(
    st.sampled_from(["aaa", "bbb", "ccc"]), intervals, max_size=3
).map(lambda d: GtidSet({u: GtidSet._normalize(iv) for u, iv in d.items() if iv}))


@SETTINGS
@given(gtid_sets)
def test_gtid_format_parse_roundtrip(g):
    assert GtidSet.parse(g.format()) == g


@SETTINGS
@given(gtid_sets, gtid_sets)
def test_gtid_union_laws(a, b):
    u = a.union(b)
    assert u.is_superset_of(a) and u.is_superset_of(b)
    # membership of the union == membership of either
    for uuid in set(a.intervals) | set(b.intervals):
        for lo, hi in u.intervals.get(uuid, ()):
            for x in (lo, hi):
                assert a.contains(uuid, x) or b.contains(uuid, x)


# -- Mongo resume tokens ----------------------------------------------------


@SETTINGS
@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_resume_token_roundtrip(t, i):
    assert decode_resume_token(encode_resume_token(t, i)) == (t, i)
