"""Property test: the optimized Selectors (literal fast path + caches)
is extensionally identical to a direct transcription of the reference
semantics (Selectors.java match-by-id-shape, per-part IGNORECASE
fullmatch)."""

import re

from hypothesis import given, settings, strategies as st

from flink_cdc_spark.core.selectors import Selectors, split_unescaped
from flink_cdc_spark.core.table_id import TableId


def _naive_is_match(table_inclusions: str, tid: TableId) -> bool:
    """Straight port of the reference rules, no caching, no fast paths."""

    def test(pattern, value):
        if pattern is None or value is None:
            return False
        return re.fullmatch(pattern, value, re.IGNORECASE) is not None

    for pattern in split_unescaped(table_inclusions, ","):
        pattern = pattern.strip()
        if not pattern:
            continue
        parts = split_unescaped(pattern, ".")
        ns = sc = tb = None
        if len(parts) == 1:
            tb = parts[0]
        elif len(parts) == 2:
            sc, tb = parts
        else:
            ns, sc, tb = parts
        if not tid.namespace:
            if not tid.schema_name:
                ok = test(tb, tid.table_name)
            else:
                ok = test(sc, tid.schema_name) and test(tb, tid.table_name)
        else:
            ok = (
                test(ns, tid.namespace)
                and test(sc, tid.schema_name)
                and test(tb, tid.table_name)
            )
        if ok:
            return True
    return False


# dialect note: an UNESCAPED dot separates TableId parts, so regex-dot is
# written \. — a bare '.' inside a part would split it (and can produce an
# invalid per-part regex, which both implementations reject at build)
_part = st.one_of(
    st.sampled_from(["db1", "DB1", "orders", "t_1", "x"]),  # literals
    st.sampled_from([r"\.*", r"db\d+", r"or\.*s", r"[tx]\.*"]),  # regexes
)
_pattern = st.lists(_part, min_size=1, max_size=3).map(".".join)
_inclusions = st.lists(_pattern, min_size=1, max_size=4).map(", ".join)

_id_part = st.sampled_from(["db1", "db2", "orders", "t_1", "x", "Db1", "ORDERS"])
_table_id = st.lists(_id_part, min_size=1, max_size=3).map(
    lambda ps: TableId.parse(".".join(ps))
)


@settings(max_examples=300, deadline=None)
@given(_inclusions, _table_id)
def test_fast_path_matches_reference_semantics(inclusions, tid):
    assert Selectors(inclusions).is_match(tid) == _naive_is_match(inclusions, tid)


@settings(max_examples=100, deadline=None)
@given(_inclusions, st.lists(_table_id, min_size=1, max_size=8))
def test_memoised_results_stable(inclusions, tids):
    sel = Selectors(inclusions)
    first = [sel.is_match(t) for t in tids]
    second = [sel.is_match(t) for t in tids]
    assert first == second
