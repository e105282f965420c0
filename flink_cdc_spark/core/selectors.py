"""Table selectors: comma-separated per-part regex patterns.

Port of the reference Selectors
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/schema/Selectors.java)
and its Predicates helpers (common/utils/Predicates.java): a selector string is
a comma-separated list of patterns; within each pattern the *unescaped* dot is
the TableId part separator and each part is a case-insensitive regex matched
with full-match semantics. Match results are memoised (the reference uses a
1h/1024-entry guava cache; SelectorsBenchmark.java:48-51 measures the cached
path at ~7.5x the uncached one).

Performance notes (hot path — selector checks run once per event-table per
operator): the parse+compile of an inclusion string is cached process-wide
keyed by the string (building a Selectors twice costs one dict hit, matching
the reality that pipelines reuse a handful of selector strings); purely
literal patterns (no regex metacharacters) are matched via a lowercase
dict lookup instead of the regex engine; the per-instance match memo is a
plain dict with a precomputed TableId hash, not an lru_cache wrapper.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .table_id import TableId

_MISS = object()

# chars that make a per-part pattern non-literal under Java/Python regex
_REGEX_META = set(".^$*+?{}[]|()\\")


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


@lru_cache(maxsize=4096)
def _compile(pattern: str):
    return re.compile(pattern, re.IGNORECASE)


class _Selector:
    __slots__ = ("namespace_m", "schema_m", "table_m")

    def __init__(self, namespace, schema_name, table_name):
        # store bound fullmatch methods (None-safe): one attribute load +
        # call per part on the match path, no staticmethod indirection
        self.namespace_m = _compile(namespace).fullmatch if namespace is not None else None
        self.schema_m = _compile(schema_name).fullmatch if schema_name is not None else None
        self.table_m = _compile(table_name).fullmatch if table_name is not None else None

    def parts(self):
        return (self.namespace_m, self.schema_m, self.table_m)

    def is_match(self, table_id: TableId) -> bool:
        ns, sc, tb = table_id.namespace, table_id.schema_name, table_id.table_name
        tm = self.table_m
        if tm is None or tb is None or tm(tb) is None:
            return False
        if not ns:
            if not sc:
                return True
            sm = self.schema_m
            return sm is not None and sm(sc) is not None
        nm, sm = self.namespace_m, self.schema_m
        return (
            nm is not None
            and nm(ns) is not None
            and sm is not None
            and sc is not None
            and sm(sc) is not None
        )


def _is_literal(part) -> bool:
    return part is not None and not (_REGEX_META & set(part))


@lru_cache(maxsize=1024)
def _parse(table_inclusions: str):
    """Parse+compile an inclusion string once per process.

    Returns (regex_selectors, lit3, lit2, lit1): fully-literal patterns (no
    regex metacharacters in any part) are indexed by each id *shape* they
    can match — reference semantics test only the parts the id has (a
    table-only id tests just the table pattern, Selectors.java match()), so
    a 3-part literal contributes to all three shape sets. Mixed
    literal/regex patterns stay on the regex path, which implements the
    shape rules directly.
    """
    regex_selectors = []
    lit3, lit2, lit1 = set(), set(), set()
    memo: dict = {}  # shared (inclusions, table_id) match memo — see below
    for pattern in split_unescaped(table_inclusions, ","):
        pattern = pattern.strip()
        if not pattern:
            continue
        parts = split_unescaped(pattern, ".")
        if len(parts) == 1:
            triple = (None, None, parts[0])
        elif len(parts) == 2:
            triple = (None, parts[0], parts[1])
        elif len(parts) == 3:
            triple = (parts[0], parts[1], parts[2])
        else:
            raise ValueError(f"Invalid table inclusion pattern: {table_inclusions!r}")
        if all(p is None or _is_literal(p) for p in triple):
            ns, sc, tb = (p.lower() if p else None for p in triple)
            lit1.add(tb)
            if sc is not None:
                lit2.add((sc, tb))
            if ns is not None:
                lit3.add((ns, sc, tb))
        else:
            regex_selectors.append(_Selector(*triple))
    return (
        tuple(regex_selectors),
        frozenset(lit3),
        frozenset(lit2),
        frozenset(lit1),
        memo,
    )


class Selectors:
    __slots__ = ("_selectors", "_lit3", "_lit2", "_lit1", "_memo")

    def __init__(self, table_inclusions: str):
        if not table_inclusions:
            raise ValueError("Invalid table inclusion pattern cannot be null or empty")
        (
            self._selectors,
            self._lit3,
            self._lit2,
            self._lit1,
            self._memo,
        ) = _parse(table_inclusions)
        # The match memo lives WITH the process-wide parsed artifact, not
        # the instance: is_match is a pure function of (inclusion string,
        # table id), and real pipelines rebuild Selectors for the same few
        # strings on every discovery/routing pass (cdc_pipeline, router,
        # CLI) — sharing the memo makes a rebuilt selector as fast as a
        # held one. The reference memoises per instance (guava cache,
        # maximumSize=1024); same semantics, wider reuse.

    def _compute_is_match(self, table_id: TableId) -> bool:
        ns, sc, tb = table_id.namespace, table_id.schema_name, table_id.table_name
        # literal fast path, keyed by the id's shape (the parts it tests)
        if ns:
            if sc and (ns.lower(), sc.lower(), tb.lower()) in self._lit3:
                return True
        elif sc:
            if (sc.lower(), tb.lower()) in self._lit2:
                return True
        elif tb is not None and tb.lower() in self._lit1:
            return True
        for s in self._selectors:
            if s.is_match(table_id):
                return True
        return False

    def is_match(self, table_id: TableId) -> bool:
        memo = self._memo
        r = memo.get(table_id, _MISS)
        if r is _MISS:
            r = self._compute_is_match(table_id)
            if len(memo) >= 1024:
                memo.clear()
            memo[table_id] = r
        return r
