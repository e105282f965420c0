"""MySQL GTID-set algebra, shared by the MySQL and Vitess sources.

A GTID set is ``{server_uuid: sorted disjoint [lo, hi] intervals}`` with
the MySQL56 text form ``uuid:1-5:7,uuid2:9`` (optionally prefixed
``MySQL56/``). Used for `scan.startup.specific-offset.gtid-set` startup
filtering (MySqlDataSourceOptions.java:147) and Vitess VGTID resume
tokens.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_INTERVAL_RE = re.compile(r"^(\d+)(?:-(\d+))?$")


class GtidSet:
    """MySQL56-style GTID set: {server_uuid: sorted disjoint [lo, hi]}."""

    def __init__(self, intervals: Optional[Dict[str, List[Tuple[int, int]]]] = None):
        self.intervals: Dict[str, List[Tuple[int, int]]] = intervals or {}

    @classmethod
    def parse(cls, text: str) -> "GtidSet":
        """Parse ``uuid:1-5:7,uuid2:9`` (optionally prefixed ``MySQL56/``)."""
        text = (text or "").strip()
        if "/" in text:
            text = text.split("/", 1)[1]
        out: Dict[str, List[Tuple[int, int]]] = {}
        if not text:
            return cls(out)
        for part in text.split(","):
            bits = part.strip().split(":")
            uuid, ranges = bits[0], bits[1:]
            if not uuid or not ranges:
                raise ValueError(f"bad GTID set fragment: {part!r}")
            ivs = out.setdefault(uuid, [])
            for r in ranges:
                m = _INTERVAL_RE.match(r)
                if not m:
                    raise ValueError(f"bad GTID interval: {r!r}")
                lo = int(m.group(1))
                hi = int(m.group(2) or lo)
                if hi < lo:
                    raise ValueError(f"inverted GTID interval: {r!r}")
                ivs.append((lo, hi))
        return cls({u: cls._normalize(ivs) for u, ivs in out.items()})

    @staticmethod
    def _normalize(ivs: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
        merged: List[Tuple[int, int]] = []
        for lo, hi in sorted(ivs):
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    def contains(self, uuid: str, txid: int) -> bool:
        return any(lo <= txid <= hi for lo, hi in self.intervals.get(uuid, ()))

    def union(self, other: "GtidSet") -> "GtidSet":
        out = {u: list(ivs) for u, ivs in self.intervals.items()}
        for u, ivs in other.intervals.items():
            out[u] = self._normalize(out.get(u, []) + list(ivs))
        return GtidSet(out)

    def is_superset_of(self, other: "GtidSet") -> bool:
        for u, ivs in other.intervals.items():
            for lo, hi in ivs:
                covered = any(
                    l2 <= lo and hi <= h2 for l2, h2 in self.intervals.get(u, ())
                )
                if not covered:
                    return False
        return True

    def format(self) -> str:
        parts = []
        for u in sorted(self.intervals):
            rs = ":".join(
                f"{lo}-{hi}" if hi > lo else str(lo)
                for lo, hi in self.intervals[u]
            )
            parts.append(f"{u}:{rs}")
        return ",".join(parts)

    def __eq__(self, other):
        return isinstance(other, GtidSet) and self.intervals == other.intervals
