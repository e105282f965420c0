"""SQL DDL statement -> SchemaChangeEvent parser.

The engine analog of the reference's binlog DDL parser
(pipeline-connector-mysql/.../source/parser/CustomMySqlAntlrDdlParser.java,
which walks a MySQL grammar and emits SchemaChangeEvents): sources whose
changelog carries raw DDL statements (binlog, Kafka DDL topics, wire
streams) parse them here into the same event vocabulary the rest of the
engine speaks. Hand-rolled tokenizer-free parsing over a small, fixed
statement family — the reference grammar's surface that maps onto
SchemaChangeEvent:

    CREATE TABLE t (col TYPE [NOT NULL] [COMMENT '...'], ..., PRIMARY KEY (a, b))
    ALTER TABLE t ADD [COLUMN] c TYPE [NOT NULL] [FIRST | AFTER x]
    ALTER TABLE t DROP [COLUMN] c
    ALTER TABLE t RENAME [COLUMN] a TO b
    ALTER TABLE t CHANGE [COLUMN] a b TYPE        (MySQL rename+retype)
    ALTER TABLE t MODIFY [COLUMN] c TYPE          (MySQL retype)
    ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE TYPE   (ANSI retype)
    TRUNCATE TABLE t
    DROP TABLE t

Type names go through core.types.parse_type — the same dialect mapping the
expression compiler uses (BYTE/SHORT/LONG synonyms, DECIMAL(p,s), ...).
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..core.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    ColumnWithPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from ..core.schema import Column, Schema
from ..core.table_id import TableId
from ..core.types import parse_type

_IDENT = r"[`\"]?([A-Za-z_][A-Za-z0-9_$]*)[`\"]?"
_PART = r"[`\"]?[A-Za-z_][A-Za-z0-9_$]*[`\"]?"
_QIDENT = rf"{_PART}(?:\.{_PART}){{0,2}}"


def _unquote(name: str) -> str:
    return ".".join(p.strip().strip('`"') for p in name.strip().split("."))


def _split_top_level(s: str, sep: str = ",") -> List[str]:
    """Split on sep outside parentheses and quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_column_def(defn: str, type_parser=None) -> Optional[Column]:
    m = re.match(rf"\s*{_IDENT}\s+(.+?)\s*$", defn, re.IGNORECASE)
    if not m:
        return None
    name, rest = _unquote(m.group(1)), m.group(2)
    comment = None
    cm = re.search(r"\bCOMMENT\s+'((?:[^']|'')*)'", rest, re.IGNORECASE)
    if cm:
        comment = cm.group(1).replace("''", "'")
        rest = rest[: cm.start()] + rest[cm.end():]
    rest = re.sub(r"\bDEFAULT\s+\S+", "", rest, flags=re.IGNORECASE)
    type_str = rest.strip()
    return Column(name, (type_parser or parse_type)(type_str), comment)


def parse_ddl(
    sql: str,
    default_table_id: Optional[str] = None,
    type_parser=None,
) -> SchemaChangeEvent:
    """Parse one DDL statement into a SchemaChangeEvent. Raises ValueError
    for unsupported statements (callers decide whether to skip, as the
    reference's parser ignores grammar it doesn't map). ``type_parser``
    overrides column-type resolution — the dialect hook a subclassed
    parser provides in the reference (CustomMySqlAntlrDdlParser extends
    the stock MySQL grammar; here the MySQL source passes mysql_type)."""
    tp = type_parser or parse_type
    stmt = sql.strip().rstrip(";").strip()

    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?({_QIDENT})\s*\((.*)\)\s*$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        tid = TableId.parse(_unquote(m.group(1)))
        cols, pks = [], []
        for item in _split_top_level(m.group(2)):
            pk = re.match(r"PRIMARY\s+KEY\s*\((.*)\)\s*$", item, re.IGNORECASE)
            if pk:
                pks = [_unquote(c) for c in _split_top_level(pk.group(1))]
                continue
            if re.match(r"(UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN)\b", item, re.IGNORECASE):
                continue
            # inline `<col> <type> ... PRIMARY KEY` (MySQL-style)
            inline_pk = re.search(r"\bPRIMARY\s+KEY\b", item, re.IGNORECASE)
            if inline_pk:
                item = item[: inline_pk.start()] + item[inline_pk.end():]
            col = _parse_column_def(item, type_parser)
            if col is not None:
                cols.append(col)
                if inline_pk:
                    pks.append(col.name)
        schema = Schema(columns=tuple(cols), primary_keys=tuple(pks)).ensure_pk_non_null()
        return CreateTableEvent(tid, schema)

    m = re.match(rf"TRUNCATE\s+TABLE\s+({_QIDENT})\s*$", stmt, re.IGNORECASE)
    if m:
        return TruncateTableEvent(TableId.parse(_unquote(m.group(1))))

    m = re.match(rf"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?({_QIDENT})\s*$", stmt, re.IGNORECASE)
    if m:
        return DropTableEvent(TableId.parse(_unquote(m.group(1))))

    m = re.match(rf"ALTER\s+TABLE\s+({_QIDENT})\s+(.*)$", stmt, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"unsupported DDL: {sql!r}")
    tid = TableId.parse(_unquote(m.group(1)))
    body = m.group(2).strip()

    m = re.match(
        rf"ADD\s+(?:COLUMN\s+)?(.+?)(?:\s+(FIRST)|\s+AFTER\s+{_IDENT})?\s*$",
        body,
        re.IGNORECASE,
    )
    if m and re.match(r"ADD\b", body, re.IGNORECASE):
        col = _parse_column_def(m.group(1), type_parser)
        if col is None:
            raise ValueError(f"bad column definition in {sql!r}")
        if m.group(2):
            cp = ColumnWithPosition(col, ColumnPosition.FIRST)
        elif m.group(3):
            cp = ColumnWithPosition(col, ColumnPosition.AFTER, _unquote(m.group(3)))
        else:
            cp = ColumnWithPosition(col, ColumnPosition.LAST)
        return AddColumnEvent(tid, (cp,))

    m = re.match(rf"DROP\s+(?:COLUMN\s+)?{_IDENT}\s*$", body, re.IGNORECASE)
    if m:
        return DropColumnEvent(tid, (_unquote(m.group(1)),))

    m = re.match(rf"RENAME\s+(?:COLUMN\s+)?{_IDENT}\s+TO\s+{_IDENT}\s*$", body, re.IGNORECASE)
    if m:
        return RenameColumnEvent(tid, ((_unquote(m.group(1)), _unquote(m.group(2))),))

    m = re.match(rf"CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.+?)\s*$", body, re.IGNORECASE)
    if m:
        old, new, type_str = _unquote(m.group(1)), _unquote(m.group(2)), m.group(3)
        if old == new:
            return AlterColumnTypeEvent(tid, ((old, tp(type_str)),))
        # MySQL CHANGE = rename (+ possible retype); emit the rename — the
        # reference maps this the same way (rename carries the new type)
        return RenameColumnEvent(tid, ((old, new),))

    m = re.match(rf"MODIFY\s+(?:COLUMN\s+)?{_IDENT}\s+(.+?)\s*$", body, re.IGNORECASE)
    if m:
        return AlterColumnTypeEvent(tid, ((_unquote(m.group(1)), tp(m.group(2))),))

    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?{_IDENT}\s+(?:SET\s+DATA\s+TYPE|TYPE)\s+(.+?)\s*$",
        body,
        re.IGNORECASE,
    )
    if m:
        return AlterColumnTypeEvent(tid, ((_unquote(m.group(1)), tp(m.group(2))),))

    raise ValueError(f"unsupported DDL: {sql!r}")


def parse_ddl_statements(sql_text: str) -> List[SchemaChangeEvent]:
    """Parse a ;-separated script, skipping unmappable statements (the
    reference parser's ignore-unknown behavior)."""
    events = []
    for stmt in _split_top_level(sql_text, ";"):
        try:
            events.append(parse_ddl(stmt))
        except ValueError:
            continue
    return events
