"""MySQL binlog v4 BINARY wire format: writer + parser.

The JSONL replay decoder (mysql_source.MySqlBinlogDecoder) covers the
semantic contract of MySqlEventDeserializer; this module adds the actual
wire layout per the public MySQL replication protocol documentation
(binary log event format, v4):

  file     = magic '\\xfebin' , event*
  header   = timestamp(4 LE) type(1) server_id(4) event_size(4)
             log_pos(4) flags(2)                                  [19 bytes]
  QUERY    = thread_id(4) exec_time(4) schema_len(1) error(2)
             status_len(2) status schema '\\0' sql
  TABLE_MAP= table_id(6) flags(2) schema_len(1) schema '\\0'
             table_len(1) table '\\0' n_cols(lenenc) types(n)
             meta_len(lenenc) meta null_bitmap((n+7)/8)
  ROWS v2  = table_id(6) flags(2) extra_len(2) n_cols(lenenc)
             included_bitmap [, included_bitmap_after for UPDATE]
             row*  where row = null_bitmap , values

TABLE_MAP carries column TYPES but NO NAMES — names come from parsed DDL
(QUERY events), exactly why the reference embeds a DDL parser
(CustomMySqlAntlrDdlParser). The parser here emits the same event-dict
shape the JSONL decoder consumes, with TABLE_MAP names resolved from the
DDL-tracked schema, so every downstream piece (epoch resolution,
executor-side row decode, schema evolution) is shared.

Column types supported (the dialect subset the engine maps): TINY, SHORT,
LONG, LONGLONG, FLOAT, DOUBLE, VARCHAR, NEWDECIMAL (the strings/decimal.c
memcomparable base-10^9 layout), DATETIME2 (5-byte packed + fsp
fraction), DATE. Signedness is a DDL property (the
binlog does not record it); values decode signed, matching the engine's
type coercion.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

MAGIC = b"\xfebin"
HEADER_LEN = 19

# event type codes (binlog_event.h)
FORMAT_DESCRIPTION_EVENT = 15
ROTATE_EVENT = 4
QUERY_EVENT = 2
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V2 = 30
UPDATE_ROWS_EVENT_V2 = 31
DELETE_ROWS_EVENT_V2 = 32
GTID_LOG_EVENT = 33

# column type codes (enum_field_types)
MYSQL_TYPE_TINY = 1
MYSQL_TYPE_SHORT = 2
MYSQL_TYPE_LONG = 3
MYSQL_TYPE_FLOAT = 4
MYSQL_TYPE_DOUBLE = 5
MYSQL_TYPE_LONGLONG = 8
MYSQL_TYPE_DATE = 10
MYSQL_TYPE_VARCHAR = 15
MYSQL_TYPE_TIMESTAMP2 = 17
MYSQL_TYPE_DATETIME2 = 18
MYSQL_TYPE_JSON = 245
MYSQL_TYPE_NEWDECIMAL = 246

# strings/decimal.c: bytes needed for n leftover decimal digits
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
_DIG_PER_GROUP = 9

_TYPE_BY_DDL = {
    "TINYINT": MYSQL_TYPE_TINY,
    "SMALLINT": MYSQL_TYPE_SHORT,
    "INT": MYSQL_TYPE_LONG,
    "INTEGER": MYSQL_TYPE_LONG,
    "BIGINT": MYSQL_TYPE_LONGLONG,
    "FLOAT": MYSQL_TYPE_FLOAT,
    "DOUBLE": MYSQL_TYPE_DOUBLE,
    "VARCHAR": MYSQL_TYPE_VARCHAR,
    "DECIMAL": MYSQL_TYPE_NEWDECIMAL,
    "NUMERIC": MYSQL_TYPE_NEWDECIMAL,
    "DATE": MYSQL_TYPE_DATE,
    "DATETIME": MYSQL_TYPE_DATETIME2,
    "TIMESTAMP": MYSQL_TYPE_TIMESTAMP2,
    "JSON": MYSQL_TYPE_JSON,
}


def _decimal_meta(ddl_type: str):
    """(precision, scale) from DECIMAL(p[,s]) — MySQL default (10, 0)."""
    inner = ddl_type.split("(", 1)
    if len(inner) < 2:
        return (10, 0)
    bits = inner[1].rstrip(")").split(",")
    p = int(bits[0])
    sfrac = int(bits[1]) if len(bits) > 1 else 0
    return (p, sfrac)


def _fsp_of(ddl_type: str) -> int:
    inner = ddl_type.split("(", 1)
    if len(inner) < 2:
        return 0
    return int(inner[1].rstrip(")"))


def _meta_for(code: int, ddl_type: str):
    if code == MYSQL_TYPE_VARCHAR:
        return _varchar_max(ddl_type)
    if code == MYSQL_TYPE_NEWDECIMAL:
        return _decimal_meta(ddl_type)
    if code in (MYSQL_TYPE_DATETIME2, MYSQL_TYPE_TIMESTAMP2):
        return _fsp_of(ddl_type)
    return 0


def encode_newdecimal(v, precision: int, scale: int) -> bytes:
    """strings/decimal.c decimal2bin: base-10^9 groups big-endian, the
    first byte's sign bit flipped, negative values complemented — the
    layout is memcomparable (byte order == numeric order)."""
    import decimal as _d

    d = _d.Decimal(str(v)).quantize(
        _d.Decimal(1).scaleb(-scale), rounding=_d.ROUND_HALF_UP
    )
    negative = d < 0
    digits = f"{abs(d):f}"
    if "." in digits:
        int_part, frac_part = digits.split(".")
    else:
        int_part, frac_part = digits, ""
    intg = precision - scale
    if len(int_part.lstrip("0") or "0") > max(intg, 1) or (
        intg == 0 and int_part.lstrip("0")
    ):
        # MySQL clamps/errors on overflow rather than dropping leading
        # digits; silently truncating would make a bad fixture roundtrip
        # to a DIFFERENT number
        raise ValueError(
            f"decimal value {v!r} overflows DECIMAL({precision},{scale}): "
            f"{len(int_part.lstrip('0'))} integer digits > {intg}"
        )
    int_part = int_part.rjust(intg, "0")[-intg:] if intg else ""
    frac_part = frac_part.ljust(scale, "0")[:scale]

    out = bytearray()

    def put_groups(digs: str, leading: bool):
        # leading partial group first for the integer part, trailing
        # partial group last for the fraction
        k = len(digs) % _DIG_PER_GROUP
        if leading and k:
            out.extend(int(digs[:k]).to_bytes(_DIG2BYTES[k], "big"))
            digs = digs[k:]
        while len(digs) >= _DIG_PER_GROUP:
            out.extend(int(digs[:_DIG_PER_GROUP]).to_bytes(4, "big"))
            digs = digs[_DIG_PER_GROUP:]
        if not leading and digs:
            out.extend(int(digs).to_bytes(_DIG2BYTES[len(digs)], "big"))

    put_groups(int_part, leading=True)
    put_groups(frac_part, leading=False)
    if negative:
        for i in range(len(out)):
            out[i] ^= 0xFF
    out[0] ^= 0x80
    return bytes(out)


def decode_newdecimal(data: bytes, off: int, precision: int, scale: int):
    import decimal as _d

    intg = precision - scale
    size = (
        (intg // _DIG_PER_GROUP) * 4 + _DIG2BYTES[intg % _DIG_PER_GROUP]
        + (scale // _DIG_PER_GROUP) * 4 + _DIG2BYTES[scale % _DIG_PER_GROUP]
    )
    buf = bytearray(data[off:off + size])
    buf[0] ^= 0x80
    negative = bool(buf[0] & 0x80)
    if negative:
        for i in range(len(buf)):
            buf[i] ^= 0xFF

    pos = 0
    digs = ""

    def take(n_digits: int) -> None:
        nonlocal pos, digs
        width = _DIG2BYTES[n_digits] if n_digits < _DIG_PER_GROUP else 4
        digs += str(int.from_bytes(buf[pos:pos + width], "big")).rjust(
            n_digits, "0"
        )
        pos += width

    k = intg % _DIG_PER_GROUP
    if k:
        take(k)
    for _ in range(intg // _DIG_PER_GROUP):
        take(_DIG_PER_GROUP)
    int_digits = digs or "0"
    digs = ""
    for _ in range(scale // _DIG_PER_GROUP):
        take(_DIG_PER_GROUP)
    k = scale % _DIG_PER_GROUP
    if k:
        take(k)
    frac_digits = digs
    text = int_digits + ("." + frac_digits if frac_digits else "")
    val = _d.Decimal(("-" if negative else "") + text)
    return val, off + size


def encode_datetime2(v, fsp: int) -> bytes:
    """5-byte packed big-endian (sign | year*13+month | day | hour | min |
    sec) + 0/1/2/3 fractional bytes for fsp 0/2/4/6 — memcomparable."""
    ym = v.year * 13 + v.month
    packed = (
        (1 << 39) | (ym << 22) | (v.day << 17)
        | (v.hour << 12) | (v.minute << 6) | v.second
    )
    out = packed.to_bytes(5, "big")
    frac_bytes = (fsp + 1) // 2
    if frac_bytes:
        frac = v.microsecond // (10 ** (6 - fsp))
        out += frac.to_bytes(frac_bytes, "big")
    return out


def decode_datetime2(data: bytes, off: int, fsp: int):
    import datetime as _dt

    packed = int.from_bytes(data[off:off + 5], "big")
    off += 5
    sec = packed & 0x3F
    minute = (packed >> 6) & 0x3F
    hour = (packed >> 12) & 0x1F
    day = (packed >> 17) & 0x1F
    ym = (packed >> 22) & 0x1FFFF
    year, month = divmod(ym, 13)
    frac_bytes = (fsp + 1) // 2
    micros = 0
    if frac_bytes:
        micros = int.from_bytes(data[off:off + frac_bytes], "big") * (
            10 ** (6 - fsp)
        )
        off += frac_bytes
    return _dt.datetime(year, month, day, hour, minute, sec, micros), off


def encode_timestamp2(v, fsp: int) -> bytes:
    """4-byte big-endian epoch seconds + the DATETIME2 fraction scheme.
    MySQL TIMESTAMP stores the UTC instant; naive datetimes are taken as
    UTC (the engine's session convention)."""
    import calendar

    secs = calendar.timegm(v.timetuple())
    if secs < 0 or secs > 0xFFFFFFFF:
        raise ValueError("TIMESTAMP out of the 1970-2106 binlog range")
    out = secs.to_bytes(4, "big")
    frac_bytes = (fsp + 1) // 2
    if frac_bytes:
        out += (v.microsecond // (10 ** (6 - fsp))).to_bytes(frac_bytes, "big")
    return out


def decode_timestamp2(data: bytes, off: int, fsp: int):
    import datetime as _dt

    secs = int.from_bytes(data[off:off + 4], "big")
    off += 4
    frac_bytes = (fsp + 1) // 2
    micros = 0
    if frac_bytes:
        micros = int.from_bytes(data[off:off + frac_bytes], "big") * (
            10 ** (6 - fsp)
        )
        off += frac_bytes
    return (
        _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=secs, microseconds=micros),
        off,
    )


def encode_mysql_date(v) -> bytes:
    return (v.day | (v.month << 5) | (v.year << 9)).to_bytes(3, "little")


def decode_mysql_date(data: bytes, off: int):
    import datetime as _dt

    packed = int.from_bytes(data[off:off + 3], "little")
    return _dt.date(packed >> 9, (packed >> 5) & 0x0F, packed & 0x1F), off + 3


def type_code_for_ddl(ddl_type: str) -> int:
    """'VARCHAR(64)' / 'TINYINT(1)' / 'BIGINT' -> wire type code."""
    base = ddl_type.split("(", 1)[0].strip().upper()
    if base not in _TYPE_BY_DDL:
        raise ValueError(f"unsupported wire type: {ddl_type!r}")
    return _TYPE_BY_DDL[base]


def _varchar_max(ddl_type: str) -> int:
    if "(" in ddl_type:
        return int(ddl_type.split("(", 1)[1].rstrip(") "))
    return 255


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 0x10000:
        return b"\xfc" + struct.pack("<H", n)
    return b"\xfd" + struct.pack("<I", n)[:3]


def _read_lenenc(data: bytes, off: int) -> Tuple[int, int]:
    b0 = data[off]
    if b0 < 0xFB:
        return b0, off + 1
    if b0 == 0xFC:
        return struct.unpack_from("<H", data, off + 1)[0], off + 3
    if b0 == 0xFD:
        return int.from_bytes(data[off + 1:off + 4], "little"), off + 4
    return struct.unpack_from("<Q", data, off + 1)[0], off + 9


# ---------------------------------------------------------------------------
# writer (fixture half: the engine's tests and canned replays)
# ---------------------------------------------------------------------------


class BinlogWriter:
    """Serializes events into the v4 wire format (checksum off)."""

    def __init__(self, server_id: int = 1):
        self.server_id = server_id
        self.buf = bytearray(MAGIC)
        self._write_format_description()

    @property
    def pos(self) -> int:
        return len(self.buf)

    def _event(self, type_code: int, body: bytes, timestamp: int = 0) -> int:
        size = HEADER_LEN + len(body)
        log_pos = len(self.buf) + size
        self.buf += struct.pack(
            "<IB4sII H".replace(" ", ""),
            timestamp,
            type_code,
            struct.pack("<I", self.server_id),
            size,
            log_pos,
            0,
        )
        self.buf += body
        return log_pos

    def _write_format_description(self):
        body = struct.pack("<H", 4)                       # binlog version
        body += b"8.0.0-mock".ljust(50, b"\x00")          # server version
        body += struct.pack("<I", 0)                      # create ts
        body += bytes([HEADER_LEN])                       # header length
        body += bytes(39)                                 # post-header lens
        body += b"\x00"                                   # checksum alg: off
        self._event(FORMAT_DESCRIPTION_EVENT, body)

    def query(self, database: str, sql: str) -> int:
        db = database.encode()
        body = struct.pack("<IIBHH", 0, 0, len(db), 0, 0)
        body += db + b"\x00" + sql.encode()
        return self._event(QUERY_EVENT, body)

    def rotate(self, next_file: str, pos: int = 4) -> int:
        """ROTATE_EVENT closing a segment: 8-byte LE position in the next
        file + the next file's name (no terminator)."""
        return self._event(
            ROTATE_EVENT, struct.pack("<Q", pos) + next_file.encode()
        )

    def gtid(self, sid_hex: str, gno: int) -> int:
        """GTID_LOG_EVENT opening a transaction: commit-flag byte +
        16-byte server uuid (SID) + signed 64-bit LE group number."""
        sid = bytes.fromhex(sid_hex.replace("-", ""))
        if len(sid) != 16:
            raise ValueError("GTID SID must be a 16-byte uuid")
        return self._event(GTID_LOG_EVENT, b"\x01" + sid + struct.pack("<q", gno))

    def xid(self, xid: int = 1) -> int:
        return self._event(XID_EVENT, struct.pack("<Q", xid))

    def table_map(
        self, table_num: int, database: str, table: str, ddl_types: List[str]
    ) -> int:
        db, tb = database.encode(), table.encode()
        n = len(ddl_types)
        body = struct.pack("<Q", table_num)[:6] + struct.pack("<H", 1)
        body += bytes([len(db)]) + db + b"\x00"
        body += bytes([len(tb)]) + tb + b"\x00"
        body += _lenenc(n)
        codes = [type_code_for_ddl(t) for t in ddl_types]
        body += bytes(codes)
        meta = b""
        for code, t in zip(codes, ddl_types):
            if code == MYSQL_TYPE_VARCHAR:
                meta += struct.pack("<H", _varchar_max(t))
            elif code in (MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE):
                meta += bytes([4 if code == MYSQL_TYPE_FLOAT else 8])
            elif code == MYSQL_TYPE_NEWDECIMAL:
                pr, sc = _decimal_meta(t)
                meta += bytes([pr, sc])
            elif code in (MYSQL_TYPE_DATETIME2, MYSQL_TYPE_TIMESTAMP2):
                meta += bytes([_fsp_of(t)])
            elif code == MYSQL_TYPE_JSON:
                meta += bytes([4])
        body += _lenenc(len(meta)) + meta
        body += b"\xff" * ((n + 7) // 8)  # all columns nullable
        return self._event(TABLE_MAP_EVENT, body)

    def _encode_value(self, code: int, meta: int, v) -> bytes:
        if code == MYSQL_TYPE_TINY:
            return struct.pack("<b", int(v))
        if code == MYSQL_TYPE_SHORT:
            return struct.pack("<h", int(v))
        if code == MYSQL_TYPE_LONG:
            return struct.pack("<i", int(v))
        if code == MYSQL_TYPE_LONGLONG:
            return struct.pack("<q", int(v))
        if code == MYSQL_TYPE_FLOAT:
            return struct.pack("<f", float(v))
        if code == MYSQL_TYPE_DOUBLE:
            return struct.pack("<d", float(v))
        if code == MYSQL_TYPE_VARCHAR:
            raw = str(v).encode()
            if meta < 256:
                return bytes([len(raw)]) + raw
            return struct.pack("<H", len(raw)) + raw
        if code == MYSQL_TYPE_NEWDECIMAL:
            pr, sc = meta
            return encode_newdecimal(v, pr, sc)
        if code == MYSQL_TYPE_DATETIME2:
            return encode_datetime2(v, meta)
        if code == MYSQL_TYPE_TIMESTAMP2:
            return encode_timestamp2(v, meta)
        if code == MYSQL_TYPE_DATE:
            return encode_mysql_date(v)
        if code == MYSQL_TYPE_JSON:
            import json as _json

            from .mysql_json_binary import encode_json_binary

            doc = _json.loads(v) if isinstance(v, str) else v
            payload = encode_json_binary(doc)
            return struct.pack("<I", len(payload)) + payload
        raise ValueError(f"unsupported type code {code}")

    def _row_image(self, codes, metas, values) -> bytes:
        n = len(codes)
        null_bitmap = bytearray((n + 7) // 8)
        payload = b""
        for i, v in enumerate(values):
            if v is None:
                null_bitmap[i // 8] |= 1 << (i % 8)
            else:
                payload += self._encode_value(codes[i], metas[i], v)
        return bytes(null_bitmap) + payload

    def _rows(self, type_code, table_num, codes, metas, images, ts: int = 0) -> int:
        n = len(codes)
        body = struct.pack("<Q", table_num)[:6] + struct.pack("<H", 1)
        body += struct.pack("<H", 2)  # extra-data length (2 = empty)
        body += _lenenc(n)
        body += b"\xff" * ((n + 7) // 8)  # all columns included
        if type_code == UPDATE_ROWS_EVENT_V2:
            body += b"\xff" * ((n + 7) // 8)
        for img in images:
            if type_code == UPDATE_ROWS_EVENT_V2:
                before, after = img
                body += self._row_image(codes, metas, before)
                body += self._row_image(codes, metas, after)
            else:
                body += self._row_image(codes, metas, img)
        return self._event(type_code, body, timestamp=ts)

    def write_rows(self, table_num, ddl_types, rows, ts: int = 0) -> int:
        codes = [type_code_for_ddl(t) for t in ddl_types]
        metas = [_meta_for(c, t) for c, t in zip(codes, ddl_types)]
        return self._rows(WRITE_ROWS_EVENT_V2, table_num, codes, metas, rows, ts=ts)

    def update_rows(self, table_num, ddl_types, pairs, ts: int = 0) -> int:
        codes = [type_code_for_ddl(t) for t in ddl_types]
        metas = [_meta_for(c, t) for c, t in zip(codes, ddl_types)]
        return self._rows(UPDATE_ROWS_EVENT_V2, table_num, codes, metas, pairs, ts=ts)

    def delete_rows(self, table_num, ddl_types, rows, ts: int = 0) -> int:
        codes = [type_code_for_ddl(t) for t in ddl_types]
        metas = [_meta_for(c, t) for c, t in zip(codes, ddl_types)]
        return self._rows(DELETE_ROWS_EVENT_V2, table_num, codes, metas, rows, ts=ts)

    def to_bytes(self) -> bytes:
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _decode_value(code: int, meta: int, data: bytes, off: int):
    if code == MYSQL_TYPE_TINY:
        return struct.unpack_from("<b", data, off)[0], off + 1
    if code == MYSQL_TYPE_SHORT:
        return struct.unpack_from("<h", data, off)[0], off + 2
    if code == MYSQL_TYPE_LONG:
        return struct.unpack_from("<i", data, off)[0], off + 4
    if code == MYSQL_TYPE_LONGLONG:
        return struct.unpack_from("<q", data, off)[0], off + 8
    if code == MYSQL_TYPE_FLOAT:
        return struct.unpack_from("<f", data, off)[0], off + 4
    if code == MYSQL_TYPE_DOUBLE:
        return struct.unpack_from("<d", data, off)[0], off + 8
    if code == MYSQL_TYPE_VARCHAR:
        if meta < 256:
            ln = data[off]
            off += 1
        else:
            ln = struct.unpack_from("<H", data, off)[0]
            off += 2
        return data[off:off + ln].decode(), off + ln
    if code == MYSQL_TYPE_NEWDECIMAL:
        pr, sc = meta
        return decode_newdecimal(data, off, pr, sc)
    if code == MYSQL_TYPE_DATETIME2:
        return decode_datetime2(data, off, meta)
    if code == MYSQL_TYPE_TIMESTAMP2:
        return decode_timestamp2(data, off, meta)
    if code == MYSQL_TYPE_DATE:
        return decode_mysql_date(data, off)
    if code == MYSQL_TYPE_JSON:
        import json as _json

        from .mysql_json_binary import decode_json_binary

        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        doc = decode_json_binary(data[off:off + ln])
        # JSON columns map to STRING (MySqlTypeUtils): render compactly
        return _json.dumps(doc, separators=(",", ":")), off + ln
    raise ValueError(f"unsupported type code {code}")


def _parse_row_image(data: bytes, off: int, codes, metas):
    n = len(codes)
    bm = data[off:off + (n + 7) // 8]
    off += (n + 7) // 8
    values = []
    for i in range(n):
        if bm[i // 8] & (1 << (i % 8)):
            values.append(None)
        else:
            v, off = _decode_value(codes[i], metas[i], data, off)
            values.append(v)
    return values, off


def parse_binlog_bytes(data: bytes, base_pos: int = 0) -> Iterator[dict]:
    """Parse one binlog file into event dicts (the JSONL decoder's shape).

    TABLE_MAP events carry ``col_codes``/``col_metas`` instead of column
    names — callers resolve names from DDL (resolve_table_maps).

    ``base_pos`` globalizes positions across rotated segments: segment k
    passes k << 30 (a segment is at most 1 GiB — MySQL's max_binlog_size
    ceiling — so in-file positions never spill into the next band) and
    the stream's total order is simply the globalized position."""
    if data[:4] != MAGIC:
        raise ValueError("not a binlog file (bad magic)")
    off = 4
    # binlog table_num -> (codes, metas) for rows-event decoding
    tmaps: Dict[int, Tuple[List[int], List[int]]] = {}
    while off + HEADER_LEN <= len(data):
        ts, type_code = struct.unpack_from("<IB", data, off)
        size, log_pos, _flags = struct.unpack_from("<IIH", data, off + 9)
        body = data[off + HEADER_LEN:off + size]
        end = len(body)
        if log_pos >= 1 << 30:
            raise ValueError(
                f"binlog position {log_pos} exceeds the 1 GiB segment band"
            )
        pos = base_pos + log_pos  # globalized end-position: the order key
        if type_code == QUERY_EVENT:
            _tid, _et, schema_len, _err, status_len = struct.unpack_from(
                "<IIBHH", body, 0
            )
            p = 13 + status_len
            db = body[p:p + schema_len].decode()
            p += schema_len + 1  # nul
            sql = body[p:].decode()
            yield {"type": "QUERY", "pos": pos, "database": db, "sql": sql}
        elif type_code == TABLE_MAP_EVENT:
            tnum = int.from_bytes(body[0:6], "little")
            p = 8
            dblen = body[p]; p += 1
            db = body[p:p + dblen].decode(); p += dblen + 1
            tblen = body[p]; p += 1
            tb = body[p:p + tblen].decode(); p += tblen + 1
            n, p = _read_lenenc(body, p)
            codes = list(body[p:p + n]); p += n
            mlen, p = _read_lenenc(body, p)
            metas = []
            mp = p
            for c in codes:
                if c == MYSQL_TYPE_VARCHAR:
                    metas.append(struct.unpack_from("<H", body, mp)[0]); mp += 2
                elif c in (MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE):
                    metas.append(body[mp]); mp += 1
                elif c == MYSQL_TYPE_NEWDECIMAL:
                    metas.append((body[mp], body[mp + 1])); mp += 2
                elif c in (MYSQL_TYPE_DATETIME2, MYSQL_TYPE_TIMESTAMP2,
                           MYSQL_TYPE_JSON):
                    metas.append(body[mp]); mp += 1
                else:
                    metas.append(0)
            tmaps[tnum] = (codes, metas)
            yield {
                "type": "TABLE_MAP", "pos": pos, "table_id": tnum,
                "database": db, "table": tb,
                "col_codes": codes, "col_metas": metas,
            }
        elif type_code in (
            WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2, DELETE_ROWS_EVENT_V2
        ):
            tnum = int.from_bytes(body[0:6], "little")
            p = 8
            extra = struct.unpack_from("<H", body, p)[0]
            p += extra  # extra_len includes its own 2 bytes
            n, p = _read_lenenc(body, p)
            codes, metas = tmaps[tnum]
            p += (n + 7) // 8  # included bitmap (always all columns here)
            if type_code == UPDATE_ROWS_EVENT_V2:
                p += (n + 7) // 8
            rows = []
            while p < end:
                if type_code == UPDATE_ROWS_EVENT_V2:
                    before, p = _parse_row_image(body, p, codes, metas)
                    after, p = _parse_row_image(body, p, codes, metas)
                    rows.append({"before": before, "after": after})
                else:
                    img, p = _parse_row_image(body, p, codes, metas)
                    rows.append(img)
            kind = {
                WRITE_ROWS_EVENT_V2: "EXT_WRITE_ROWS",
                UPDATE_ROWS_EVENT_V2: "EXT_UPDATE_ROWS",
                DELETE_ROWS_EVENT_V2: "EXT_DELETE_ROWS",
            }[type_code]
            yield {
                "type": kind, "pos": pos, "table_id": tnum, "rows": rows,
                # binlog header timestamp (seconds) — the reference's
                # op_ts metadata source (MySqlDataSourceOptions
                # `metadata.list: op_ts`, Debezium source.ts_ms)
                "ts": ts,
            }
        elif type_code == ROTATE_EVENT:
            (next_pos,) = struct.unpack_from("<Q", body, 0)
            yield {
                "type": "ROTATE", "pos": pos,
                "next_file": body[8:].decode(), "next_pos": next_pos,
            }
        elif type_code == GTID_LOG_EVENT:
            sid = body[1:17]
            (gno,) = struct.unpack_from("<q", body, 17)
            sid_hex = sid.hex()
            uuid = (
                f"{sid_hex[:8]}-{sid_hex[8:12]}-{sid_hex[12:16]}-"
                f"{sid_hex[16:20]}-{sid_hex[20:]}"
            )
            yield {"type": "GTID", "pos": pos, "sid": uuid, "gno": gno}
        elif type_code == XID_EVENT:
            yield {"type": "XID", "pos": pos}
        elif type_code == FORMAT_DESCRIPTION_EVENT:
            yield {"type": "FORMAT_DESCRIPTION", "pos": pos}
        off += size


def resolve_table_maps(events, schemas_by_table: Optional[dict] = None):
    """Fill TABLE_MAP column names from DDL-derived schemas (the binlog
    itself has none — Debezium does the same resolution). ``schemas`` is
    built incrementally from the stream's own QUERY DDL when not given."""
    from ..core.schema_evolution import apply_schema_change_event
    from .ddl_parser import parse_ddl
    from .mysql_source import mysql_type

    schemas = dict(schemas_by_table or {})
    out = []
    for ev in events:
        if ev["type"] == "QUERY":
            sql = ev.get("sql", "")
            if sql and not sql.upper().startswith(("BEGIN", "COMMIT")):
                try:
                    event = parse_ddl(sql, type_parser=mysql_type)
                except ValueError:
                    out.append(ev)
                    continue
                tid = event.table_id
                if tid.schema_name is None and ev.get("database"):
                    key = f"{ev['database']}.{tid.table_name}"
                else:
                    key = str(tid)
                schemas[key] = apply_schema_change_event(schemas.get(key), event)
            out.append(ev)
        elif ev["type"] == "TABLE_MAP":
            key = f"{ev['database']}.{ev['table']}"
            schema = schemas.get(key)
            if schema is None:
                raise ValueError(
                    f"TABLE_MAP for {key} precedes its DDL — column names "
                    "unresolvable (the binlog carries only types)"
                )
            names = [c.name for c in schema.columns]
            if len(names) != len(ev["col_codes"]):
                raise ValueError(
                    f"TABLE_MAP column count {len(ev['col_codes'])} != DDL "
                    f"schema width {len(names)} for {key}"
                )
            enriched = dict(ev)
            enriched["columns"] = [
                {"name": n, "type": str(c.type)}
                for n, c in zip(names, schema.columns)
            ]
            out.append(enriched)
        else:
            out.append(ev)
    return out, schemas
