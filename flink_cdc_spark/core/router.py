"""Table routing: regex source-table -> sink-table mapping with 1->N fan-out
and N->1 merge.

Port of the reference TableIdRouter
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/route/TableIdRouter.java:64-167):
  * the source-table list uses `,` between alternatives (converted to regex `|`),
    unescaped `.` is the TableId part separator (quoted to `\\.`), and escaped
    `\\.` is the regex any-char metacharacter;
  * a rule optionally carries a replace-symbol: every occurrence in the
    sink-table string is replaced with the source table name (<> convention);
  * ALL_MATCH emits one target per matching rule (replication fan-out),
    FIRST_MATCH stops at the first matching rule;
  * a table matching no rule routes to itself.
Routing results are memoised per TableId (reference: 1-day guava cache).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

from .table_id import TableId

_DOT_PLACEHOLDER = "\x00DOT\x00"


def convert_table_list_to_regexp(tables: str) -> str:
    """CDC-style capture list -> standard regex
    (TableIdRouter.convertTableListToRegExpPattern, :64-111)."""
    joined = "|".join(p.strip() for p in tables.split(","))
    unescaped = joined.replace("\\.", _DOT_PLACEHOLDER)
    separated = unescaped.replace(".", "\\.")
    return separated.replace(_DOT_PLACEHOLDER, ".")


@dataclass(frozen=True)
class RouteRule:
    source_table: str
    sink_table: str
    replace_symbol: Optional[str] = None
    description: Optional[str] = None


def _java_replacement_to_python(repl: str) -> str:
    """Translate Java's $N group references to Python's \\N."""
    return re.sub(r"\$(\d+)", r"\\\1", repl.replace("\\", "\\\\"))


class TableIdRouter:
    ALL_MATCH = "ALL_MATCH"
    FIRST_MATCH = "FIRST_MATCH"

    def __init__(self, rules, route_mode: str = ALL_MATCH):
        self.route_mode = route_mode
        self._routes = []
        for rule in rules:
            try:
                pattern = re.compile(convert_table_list_to_regexp(rule.source_table))
            except re.error as e:
                raise ValueError(
                    f"Failed to parse regular expression in routing rule {rule}. "
                    "Notice that `.` is used to separate Table ID components. "
                    "To use it as a regex token, put a `\\` before to escape it."
                ) from e
            self._routes.append((pattern, rule.sink_table, rule.replace_symbol))
        self._cached_route = lru_cache(maxsize=4096)(self._calculate_route)

    def route(self, source_table_id: TableId) -> list:
        return list(self._cached_route(source_table_id))

    def _calculate_route(self, source_table_id: TableId) -> tuple:
        out = []
        for pattern, sink_table, replace_symbol in self._routes:
            if pattern.fullmatch(str(source_table_id)):
                out.append(self._resolve(source_table_id, pattern, sink_table, replace_symbol))
                if self.route_mode == self.FIRST_MATCH:
                    break
        if not out:
            out.append(source_table_id)
        return tuple(out)

    @staticmethod
    def _resolve(source: TableId, pattern, sink_table: str, replace_symbol) -> TableId:
        if replace_symbol is not None:
            return TableId.parse(sink_table.replace(replace_symbol, source.table_name))
        m = pattern.search(str(source))
        if m:
            return TableId.parse(pattern.sub(_java_replacement_to_python(sink_table), str(source)))
        return TableId.parse(sink_table)

    def group_source_tables_by_rule(self, table_ids) -> list:
        """Group tables per matching rule for N->1 schema merging
        (TableIdRouter.groupSourceTablesByRouteRule)."""
        if not self._routes:
            return []
        if self.route_mode == self.ALL_MATCH:
            return [
                {t for t in table_ids if pattern.fullmatch(str(t))}
                for pattern, _, _ in self._routes
            ]
        groups = [set() for _ in self._routes]
        for t in table_ids:
            for i, (pattern, _, _) in enumerate(self._routes):
                if pattern.fullmatch(str(t)):
                    groups[i].add(t)
                    break
        return groups
