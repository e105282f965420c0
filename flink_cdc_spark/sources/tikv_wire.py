"""TiKV wire codec: TiDB RowKey + row-format-v2 value encode/decode.

The byte-level piece of the reference's TiDB connector
(flink-connector-tidb-cdc/.../RowDataTiKVChangeEventDeserializationSchema.java:
``RowKey.decode(row.getKey())`` + ``decodeObjects(row.getValue(), handle,
tableInfo)``), re-implemented from TiDB's public storage formats:

RowKey ("t{tableId}_r{handle}" record keys):
    0x74 't' | int64 tableId | 0x5F 0x72 '_r' | int64 handle
    where int64s use the memcomparable encoding (big-endian with the sign
    bit flipped, so byte order == numeric order).

Row value, format v2 (TiDB "new row format" — the 0x80-flagged codec):
    [0x80 version][flags u8 (bit0 = big)]
    [numNotNull u16 LE][numNull u16 LE]
    [not-null column ids, ascending][null column ids, ascending]
    [value end-offsets, u16 LE each (u32 when big)]
    [value bytes]
    ids are u8 (u32 when big). Per-type value encodings:
      signed int   -> minimal 1/2/4/8 little-endian bytes, sign-extended
      double       -> 8 bytes, IEEE bits with the order-preserving
                      transform (positive: flip sign bit; negative: flip
                      all bits), big-endian
      string/bytes -> raw bytes

Only the types the contract exercises are encoded (BIGINT, DOUBLE,
STRING); anything else raises rather than mis-decoding.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

_SIGN_MASK = 0x8000000000000000
_RECORD_PREFIX = b"t"
_RECORD_SEP = b"_r"

CODEC_VER = 0x80


def _encode_i64_comparable(v: int) -> bytes:
    return struct.pack(">Q", (v ^ _SIGN_MASK) & 0xFFFFFFFFFFFFFFFF)


def _decode_i64_comparable(b: bytes) -> int:
    (u,) = struct.unpack(">Q", b)
    u ^= _SIGN_MASK
    return u - (1 << 64) if u >= (1 << 63) else u


def encode_row_key(table_id: int, handle: int) -> bytes:
    """t{tableId}_r{handle} record key (19 bytes, memcomparable ints)."""
    return (
        _RECORD_PREFIX
        + _encode_i64_comparable(table_id)
        + _RECORD_SEP
        + _encode_i64_comparable(handle)
    )


def decode_row_key(key: bytes) -> Tuple[int, int]:
    """-> (table_id, handle); raises on non-record keys (index keys use
    ``_i``, meta keys another prefix — the connector only sees records)."""
    key = bytes(key)
    if len(key) != 19 or key[:1] != _RECORD_PREFIX or key[9:11] != _RECORD_SEP:
        raise ValueError(f"not a TiDB record key: {key.hex()}")
    return _decode_i64_comparable(key[1:9]), _decode_i64_comparable(key[11:19])


def _encode_int_value(v: int) -> bytes:
    u = v & 0xFFFFFFFFFFFFFFFF
    for size, fmt in ((1, "<b"), (2, "<h"), (4, "<i"), (8, "<q")):
        lo = -(1 << (size * 8 - 1))
        hi = (1 << (size * 8 - 1)) - 1
        if lo <= v <= hi:
            return struct.pack(fmt, v)
    raise ValueError(f"int out of int64 range: {v}")


def _decode_int_value(b: bytes) -> int:
    fmt = {1: "<b", 2: "<h", 4: "<i", 8: "<q"}.get(len(b))
    if fmt is None:
        raise ValueError(f"bad int value width {len(b)}")
    return struct.unpack(fmt, b)[0]


def _encode_double_value(v: float) -> bytes:
    (u,) = struct.unpack(">Q", struct.pack(">d", v))
    if u & _SIGN_MASK:
        u ^= 0xFFFFFFFFFFFFFFFF  # negative: flip all
    else:
        u |= _SIGN_MASK  # positive: flip sign bit
    return struct.pack(">Q", u)


def _decode_double_value(b: bytes) -> float:
    (u,) = struct.unpack(">Q", b)
    if u & _SIGN_MASK:
        u ^= _SIGN_MASK
    else:
        u ^= 0xFFFFFFFFFFFFFFFF
    return struct.unpack(">d", struct.pack(">Q", u))[0]


def encode_row_v2(values: Dict[int, object]) -> bytes:
    """Encode {column_id: value} (ids 1-255, None = NULL column)."""
    not_null = sorted(k for k, v in values.items() if v is not None)
    nulls = sorted(k for k, v in values.items() if v is None)
    if any(k < 1 or k > 255 for k in values):
        raise ValueError("column ids must be 1-255 in the small-row codec")
    payloads: List[bytes] = []
    for cid in not_null:
        v = values[cid]
        if isinstance(v, bool):
            raise ValueError("BOOLEAN not in the supported encode subset")
        if isinstance(v, int):
            payloads.append(_encode_int_value(v))
        elif isinstance(v, float):
            payloads.append(_encode_double_value(v))
        elif isinstance(v, str):
            payloads.append(v.encode("utf-8"))
        elif isinstance(v, (bytes, bytearray)):
            payloads.append(bytes(v))
        else:
            raise ValueError(f"unsupported type for row v2 encode: {type(v)}")
    offsets, end = [], 0
    for p in payloads:
        end += len(p)
        offsets.append(end)
    if end > 0xFFFF:
        raise ValueError("big-row (u32 offsets) not needed by this surface")
    out = bytearray()
    out.append(CODEC_VER)
    out.append(0)  # flags: small row
    out += struct.pack("<HH", len(not_null), len(nulls))
    out += bytes(not_null)
    out += bytes(nulls)
    for off in offsets:
        out += struct.pack("<H", off)
    for p in payloads:
        out += p
    return bytes(out)


def decode_row_v2(
    value: bytes, column_types: Dict[int, str]
) -> Dict[int, object]:
    """Decode a v2 row into {column_id: value} using declared per-column
    types ('long' | 'double' | 'string' | 'bytes') — the ``tableInfo``
    the reference's decodeObjects consults."""
    value = bytes(value)
    if len(value) < 6 or value[0] != CODEC_VER:
        raise ValueError("not a row-format-v2 value")
    if value[1] & 0x01:
        raise ValueError("big-row flag not supported by this surface")
    n_not_null, n_null = struct.unpack_from("<HH", value, 2)
    p = 6
    not_null = list(value[p : p + n_not_null])
    p += n_not_null
    nulls = list(value[p : p + n_null])
    p += n_null
    offsets = list(struct.unpack_from(f"<{n_not_null}H", value, p))
    p += 2 * n_not_null
    data = value[p:]
    out: Dict[int, object] = {cid: None for cid in nulls}
    start = 0
    for cid, end in zip(not_null, offsets):
        chunk = data[start:end]
        start = end
        t = column_types.get(cid)
        if t == "long":
            out[cid] = _decode_int_value(chunk)
        elif t == "double":
            out[cid] = _decode_double_value(chunk)
        elif t == "string":
            out[cid] = chunk.decode("utf-8")
        elif t == "bytes":
            out[cid] = chunk
        elif t is None:
            raise ValueError(f"column id {cid} missing from tableInfo")
        else:
            raise ValueError(f"unsupported declared type {t!r}")
    return out
