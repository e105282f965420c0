"""MySQL JSON binary storage format (json_binary) encode/decode.

The format binlogged for JSON columns (MySQL's public json_binary
layout; mysql/json_binary.h documents it at length):

    doc       = type(1) payload
    types     : 0x00 small-object  0x01 large-object
                0x02 small-array   0x03 large-array
                0x04 literal (0x00 null, 0x01 true, 0x02 false)
                0x05 int16  0x06 uint16  0x07 int32  0x08 uint32
                0x09 int64  0x0a uint64  0x0b double  0x0c string
    small obj = count(u16) size(u16)
                key-entry(key_off u16, key_len u16) * count
                val-entry(type u8, inline-or-offset u16) * count
                keys... values...
    small arr = count(u16) size(u16) val-entry * count values...
    string    = varlen(7-bit little-endian continuation) utf8-bytes

Offsets are relative to the start of the (object|array) payload. Small
documents inline literals and int16/uint16 in the 2-byte entry slot;
everything else stores at an offset. Only the small variants are
emitted (the large u32 forms decode too — same layout with 4-byte
fields — for inputs that need them).

MySQL serializes object keys sorted by (length, bytes); encode applies
the same order so roundtrips reproduce server byte layouts.
"""

from __future__ import annotations

import struct
from typing import Tuple

T_SMALL_OBJ = 0x00
T_LARGE_OBJ = 0x01
T_SMALL_ARR = 0x02
T_LARGE_ARR = 0x03
T_LITERAL = 0x04
T_INT16 = 0x05
T_UINT16 = 0x06
T_INT32 = 0x07
T_UINT32 = 0x08
T_INT64 = 0x09
T_UINT64 = 0x0A
T_DOUBLE = 0x0B
T_STRING = 0x0C

LIT_NULL, LIT_TRUE, LIT_FALSE = 0x00, 0x01, 0x02


def _varlen_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varlen_decode(data: bytes, off: int) -> Tuple[int, int]:
    n, shift = 0, 0
    while True:
        b = data[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, off
        shift += 7


def _scalar(value):
    """-> (type, payload_bytes) for a non-container value."""
    if value is None:
        return T_LITERAL, bytes([LIT_NULL])
    if isinstance(value, bool):
        return T_LITERAL, bytes([LIT_TRUE if value else LIT_FALSE])
    if isinstance(value, int):
        if -(1 << 15) <= value < (1 << 15):
            return T_INT16, struct.pack("<h", value)
        if -(1 << 31) <= value < (1 << 31):
            return T_INT32, struct.pack("<i", value)
        if -(1 << 63) <= value < (1 << 63):
            return T_INT64, struct.pack("<q", value)
        if value < (1 << 64):
            return T_UINT64, struct.pack("<Q", value)
        raise ValueError("integer out of JSON binary range")
    if isinstance(value, float):
        return T_DOUBLE, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return T_STRING, _varlen_encode(len(raw)) + raw
    raise ValueError(f"unsupported JSON scalar: {type(value)}")


def _encode_container(value) -> Tuple[int, bytes]:
    if isinstance(value, dict):
        # MySQL sorts object keys by (length, bytes)
        keys = sorted(value.keys(), key=lambda k: (len(k.encode()), k.encode()))
        entries = [(k.encode("utf-8"), _encode_value(value[k])) for k in keys]
        count = len(entries)
        header = 4 + 4 * count + 3 * count  # count+size + key entries + val entries
        key_bytes = b"".join(k for k, _ in entries)
        key_offs = []
        pos = header
        for k, _ in entries:
            key_offs.append(pos)
            pos += len(k)
        out_vals = bytearray()
        val_entries = []
        for _, (vtype, payload, inline) in entries:
            if inline:
                val_entries.append((vtype, payload))
            else:
                val_entries.append((vtype, None, len(out_vals)))
                out_vals.extend(payload)
        size = pos + len(out_vals)
        buf = bytearray(struct.pack("<HH", count, size))
        for (k, _), ko in zip(entries, key_offs):
            buf += struct.pack("<HH", ko, len(k))
        base_vals = pos
        for ve in val_entries:
            if ve[1] is not None:  # inlined
                buf += bytes([ve[0]]) + ve[1].ljust(2, b"\x00")[:2]
            else:
                buf += bytes([ve[0]]) + struct.pack("<H", base_vals + ve[2])
        buf += key_bytes
        buf += out_vals
        return T_SMALL_OBJ, bytes(buf)
    # array
    items = [_encode_value(v) for v in value]
    count = len(items)
    header = 4 + 3 * count
    out_vals = bytearray()
    val_entries = []
    for vtype, payload, inline in items:
        if inline:
            val_entries.append((vtype, payload))
        else:
            val_entries.append((vtype, None, len(out_vals)))
            out_vals.extend(payload)
    size = header + len(out_vals)
    buf = bytearray(struct.pack("<HH", count, size))
    for ve in val_entries:
        if ve[1] is not None:
            buf += bytes([ve[0]]) + ve[1].ljust(2, b"\x00")[:2]
        else:
            buf += bytes([ve[0]]) + struct.pack("<H", header + ve[2])
    buf += out_vals
    return T_SMALL_ARR, bytes(buf)


def _encode_value(value) -> Tuple[int, bytes, bool]:
    """-> (type, payload, inlinable-in-2-byte-slot)."""
    if isinstance(value, (dict, list)):
        t, payload = _encode_container(value)
        return t, payload, False
    t, payload = _scalar(value)
    inline = t in (T_LITERAL, T_INT16, T_UINT16)
    return t, payload, inline


def encode_json_binary(doc) -> bytes:
    """Python object -> MySQL JSON binary document (type byte + payload)."""
    t, payload, _ = _encode_value(doc)
    return bytes([t]) + payload


def _decode_inline(vtype: int, raw2: bytes):
    if vtype == T_LITERAL:
        lit = raw2[0]
        return {LIT_NULL: None, LIT_TRUE: True, LIT_FALSE: False}[lit]
    if vtype == T_INT16:
        return struct.unpack("<h", raw2)[0]
    if vtype == T_UINT16:
        return struct.unpack("<H", raw2)[0]
    raise ValueError(f"type {vtype:#x} is not inlinable")


def _decode_payload(vtype: int, payload: bytes, off: int):
    if vtype in (T_SMALL_OBJ, T_LARGE_OBJ, T_SMALL_ARR, T_LARGE_ARR):
        return _decode_container(vtype, payload[off:])
    if vtype == T_LITERAL:
        return _decode_inline(vtype, payload[off:off + 2].ljust(2, b"\x00"))
    if vtype == T_INT16:
        return struct.unpack_from("<h", payload, off)[0]
    if vtype == T_UINT16:
        return struct.unpack_from("<H", payload, off)[0]
    if vtype == T_INT32:
        return struct.unpack_from("<i", payload, off)[0]
    if vtype == T_UINT32:
        return struct.unpack_from("<I", payload, off)[0]
    if vtype == T_INT64:
        return struct.unpack_from("<q", payload, off)[0]
    if vtype == T_UINT64:
        return struct.unpack_from("<Q", payload, off)[0]
    if vtype == T_DOUBLE:
        return struct.unpack_from("<d", payload, off)[0]
    if vtype == T_STRING:
        ln, p = _varlen_decode(payload, off)
        return payload[p:p + ln].decode("utf-8")
    raise ValueError(f"unknown JSON binary type {vtype:#x}")


def _decode_container(vtype: int, payload: bytes):
    large = vtype in (T_LARGE_OBJ, T_LARGE_ARR)
    w, fmt = (4, "<I") if large else (2, "<H")
    count = struct.unpack_from(fmt, payload, 0)[0]
    is_obj = vtype in (T_SMALL_OBJ, T_LARGE_OBJ)
    p = 2 * w
    keys = []
    if is_obj:
        for _ in range(count):
            ko = struct.unpack_from(fmt, payload, p)[0]
            kl = struct.unpack_from("<H", payload, p + w)[0]
            keys.append(payload[ko:ko + kl].decode("utf-8"))
            p += w + 2
    vals = []
    inline_width = 4 if large else 2
    for _ in range(count):
        vt = payload[p]
        slot = payload[p + 1:p + 1 + inline_width]
        p += 1 + inline_width
        if vt in (T_LITERAL, T_INT16, T_UINT16) or (
            large and vt in (T_INT32, T_UINT32)
        ):
            if vt in (T_INT32, T_UINT32):
                vals.append(struct.unpack("<i" if vt == T_INT32 else "<I", slot)[0])
            else:
                vals.append(_decode_inline(vt, slot[:2]))
        else:
            voff = struct.unpack(fmt, slot)[0]
            vals.append(_decode_payload(vt, payload, voff))
    return dict(zip(keys, vals)) if is_obj else vals


def decode_json_binary(data: bytes):
    """MySQL JSON binary document -> Python object."""
    data = bytes(data)
    if not data:
        return None
    return _decode_payload(data[0], data, 1)
