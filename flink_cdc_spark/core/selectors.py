"""Table selectors: comma-separated per-part regex patterns.

Port of the reference Selectors
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/schema/Selectors.java)
and its Predicates helpers (common/utils/Predicates.java): a selector string is
a comma-separated list of patterns; within each pattern the *unescaped* dot is
the TableId part separator and each part is a case-insensitive regex matched
with full-match semantics. Match results are memoised (the reference uses a
1h/1024-entry guava cache; SelectorsBenchmark.java:48-51 measures the cached
path at ~7.5x the uncached one).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .table_id import TableId

_DOT_PLACEHOLDER = "\x00DOT\x00"


def split_unescaped(s: str, sep: str) -> list:
    """Split on sep unless preceded by a backslash, then unescape '\\sep'
    within each part (reference Predicates.RegExSplitterByComma/Dot:
    the escaped separator becomes the literal regex metacharacter)."""
    parts = []
    cur = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            # escape sequence: skip separator-splitting for next char
            cur.append(ch)
            cur.append(s[i + 1])
            i += 2
            continue
        if ch == sep:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return [p.strip().replace("\\" + sep, sep) for p in parts]


class _Selector:
    __slots__ = ("namespace_re", "schema_re", "table_re")

    def __init__(self, namespace, schema_name, table_name):
        compile_ = lambda p: re.compile(p, re.IGNORECASE) if p is not None else None
        self.namespace_re = compile_(namespace)
        self.schema_re = compile_(schema_name)
        self.table_re = compile_(table_name)

    @staticmethod
    def _test(pattern, value) -> bool:
        if pattern is None:
            return False
        if value is None:
            return False
        return pattern.fullmatch(value) is not None

    def is_match(self, table_id: TableId) -> bool:
        ns, sc, tb = table_id.namespace, table_id.schema_name, table_id.table_name
        if not ns:
            if not sc:
                return self._test(self.table_re, tb)
            return self._test(self.schema_re, sc) and self._test(self.table_re, tb)
        return (
            self._test(self.namespace_re, ns)
            and self._test(self.schema_re, sc)
            and self._test(self.table_re, tb)
        )


class Selectors:
    def __init__(self, table_inclusions: str):
        if not table_inclusions:
            raise ValueError("Invalid table inclusion pattern cannot be null or empty")
        self._selectors = []
        for pattern in split_unescaped(table_inclusions, ","):
            pattern = pattern.strip()
            if not pattern:
                continue
            parts = split_unescaped(pattern, ".")
            if len(parts) == 1:
                self._selectors.append(_Selector(None, None, parts[0]))
            elif len(parts) == 2:
                self._selectors.append(_Selector(None, parts[0], parts[1]))
            elif len(parts) == 3:
                self._selectors.append(_Selector(parts[0], parts[1], parts[2]))
            else:
                raise ValueError(f"Invalid table inclusion pattern: {table_inclusions!r}")
        # memoised match (reference: guava cache, maximumSize=1024)
        self._cached_match = lru_cache(maxsize=1024)(self._compute_is_match)

    def _compute_is_match(self, table_id: TableId) -> bool:
        return any(s.is_match(table_id) for s in self._selectors)

    def is_match(self, table_id: TableId) -> bool:
        return self._cached_match(table_id)
