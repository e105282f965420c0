"""PostgreSQL `pgoutput` logical replication message format (protocol v1).

`test_decoding` is the debug plugin; **pgoutput is the production
protocol** (what native logical replication and Debezium's default
pgoutput mode consume). Message layout per the public PostgreSQL
"Logical Replication Message Formats" documentation — all integers
big-endian, strings NUL-terminated:

  'B' Begin    : final_lsn(8) commit_ts(8) xid(4)
  'C' Commit   : flags(1) commit_lsn(8) end_lsn(8) commit_ts(8)
  'R' Relation : oid(4) namespace(cstr) relname(cstr) replident(1)
                 ncols(2) { flags(1) colname(cstr) type_oid(4) typmod(4) }*
  'I' Insert   : oid(4) 'N' tuple
  'U' Update   : oid(4) [ 'K'|'O' old_tuple ] 'N' new_tuple
  'D' Delete   : oid(4) 'K'|'O' old_tuple
  tuple        : ncols(2) { 'n' | 'u' | 't' len(4) bytes }*

The relation's column NAMES arrive in-stream via 'R' messages before the
first row message for that table (the same two-plane shape as MySQL's
TABLE_MAP — control metadata resolves rows), so the decoder does a cheap
driver-side control pass for 'R' and decodes row messages executor-side.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple


def _cstr(data: bytes, off: int) -> Tuple[str, int]:
    end = data.index(b"\x00", off)
    return data[off:end].decode(), end + 1


def _tuple_data(data: bytes, off: int) -> Tuple[List[Optional[str]], int]:
    (ncols,) = struct.unpack_from(">H", data, off)
    off += 2
    cells: List[Optional[str]] = []
    for _ in range(ncols):
        kind = data[off:off + 1]
        off += 1
        if kind == b"n":          # SQL NULL
            cells.append(None)
        elif kind == b"u":        # unchanged TOAST — treated as NULL here
            cells.append(None)
        elif kind == b"t":        # text-format value
            (ln,) = struct.unpack_from(">I", data, off)
            off += 4
            cells.append(data[off:off + ln].decode())
            off += ln
        else:
            raise ValueError(f"unknown tuple cell kind {kind!r}")
    return cells, off


def parse_pgoutput_message(data: bytes) -> dict:
    """One replication message -> event dict. Unknown/auxiliary message
    types ('Y' type, 'O' origin, 'T' truncate, ...) return
    {'type': 'OTHER', 'tag': <char>} so callers skip them loudly-visibly."""
    tag = data[0:1].decode()
    if tag == "B":
        final_lsn, ts, xid = struct.unpack_from(">QQI", data, 1)
        return {"type": "BEGIN", "final_lsn": final_lsn, "xid": xid}
    if tag == "C":
        _flags = data[1]
        commit_lsn, end_lsn, ts = struct.unpack_from(">QQQ", data, 2)
        return {"type": "COMMIT", "commit_lsn": commit_lsn, "end_lsn": end_lsn}
    if tag == "R":
        (oid,) = struct.unpack_from(">I", data, 1)
        off = 5
        ns, off = _cstr(data, off)
        rel, off = _cstr(data, off)
        replident = chr(data[off]); off += 1
        (ncols,) = struct.unpack_from(">H", data, off)
        off += 2
        cols = []
        for _ in range(ncols):
            _cflags = data[off]; off += 1
            name, off = _cstr(data, off)
            type_oid, typmod = struct.unpack_from(">Ii", data, off)
            off += 8
            cols.append({"name": name, "type_oid": type_oid})
        return {
            "type": "RELATION", "oid": oid, "namespace": ns, "relation": rel,
            "replica_identity": replident, "columns": cols,
        }
    if tag == "I":
        (oid,) = struct.unpack_from(">I", data, 1)
        if data[5:6] != b"N":
            raise ValueError(
                f"pgoutput Insert: expected 'N' tuple marker, got {data[5:6]!r}"
            )
        cells, _ = _tuple_data(data, 6)
        return {"type": "INSERT", "oid": oid, "new": cells}
    if tag == "U":
        (oid,) = struct.unpack_from(">I", data, 1)
        off = 5
        old = None
        marker = data[off:off + 1]
        if marker in (b"K", b"O"):
            off += 1
            old, off = _tuple_data(data, off)
            marker = data[off:off + 1]
        if marker != b"N":
            raise ValueError(f"pgoutput Update: expected new tuple, got {marker!r}")
        new, _ = _tuple_data(data, off + 1)
        return {"type": "UPDATE", "oid": oid, "old": old, "new": new}
    if tag == "D":
        (oid,) = struct.unpack_from(">I", data, 1)
        marker = data[5:6]
        if marker not in (b"K", b"O"):
            raise ValueError(f"pgoutput Delete: unexpected marker {marker!r}")
        old, _ = _tuple_data(data, 6)
        return {"type": "DELETE", "oid": oid, "old": old}
    if tag == "T":
        # Truncate: nrels(u32) options(u8: 1 CASCADE, 2 RESTART IDENTITY)
        # then the relation oids
        (nrels,) = struct.unpack_from(">I", data, 1)
        options = data[5]
        oids = list(struct.unpack_from(f">{nrels}I", data, 6))
        return {"type": "TRUNCATE", "oids": oids, "options": options}
    return {"type": "OTHER", "tag": tag}


def truncate_events(hex_lines, rels: Dict[int, dict]):
    """Driver-side control pass for 'T' messages (hex prefix '54'):
    -> TruncateTableEvent per truncated relation, resolved through the
    relation map (the publication must be created WITH (publish =
    '...,truncate') for the server to send these)."""
    from ..core.events import TruncateTableEvent
    from ..core.table_id import TableId

    out = []
    for hx in hex_lines:
        if not hx.startswith("54"):  # 'T'
            continue
        msg = parse_pgoutput_message(bytes.fromhex(hx))
        for oid in msg["oids"]:
            rel = rels.get(oid)
            if rel is None:
                continue
            out.append(
                TruncateTableEvent(
                    TableId.parse(f"{rel['namespace']}.{rel['relation']}")
                )
            )
    return out


def relation_map(hex_lines) -> Dict[int, dict]:
    """Driver-side control pass: decode only 'R' messages (hex prefix
    '52') from spooled (seq, hex) lines — the executor row decode gets
    this map broadcast, like MySQL's TABLE_MAP epochs."""
    rels: Dict[int, dict] = {}
    for hx in hex_lines:
        if not hx.startswith("52"):  # 'R'
            continue
        msg = parse_pgoutput_message(bytes.fromhex(hx))
        rels[msg["oid"]] = msg
    return rels
