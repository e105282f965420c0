"""Priority-window invariants (the r8 verdict's rotation rule): the
driver's CORRECTNESS gate evaluates only the first 50 entries of
queries(), so

  * every query that has NEVER received a green driver row must sit
    inside the upcoming window — a brand-new operator with no oracle
    signal at all is the weakest possible state;
  * every _PRIORITY name must actually exist in the registry (a typo'd
    entry silently wastes a window slot).
"""

import glob
import json

import __spark_entry__ as entry
from flink_cdc_spark.contract import _PRIORITY

WINDOW = 50
MAX_SIGNAL_AGE = 2  # rounds — the r9 verdict's rotation invariant


def _latest_round_per_query():
    """name -> latest round a CORRECTNESS_r*.json artifact mentions it
    (mention = driver evaluated it that round), plus the next round
    number the planned window will run under."""
    latest = {}
    max_round = 0
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
            data = json.load(open(path))
        except Exception:
            continue
        results = data.get("results", data)
        if not isinstance(results, dict):
            continue
        max_round = max(max_round, rnd)
        for name in results:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round + 1


def _driver_green():
    seen = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        results = data.get("results", data)
        if not isinstance(results, dict):
            continue
        for name, row in results.items():
            if isinstance(row, dict) and (
                row.get("rows_match") or row.get("match") or row.get("ok")
            ):
                seen.add(name)
    return seen


def test_no_row_goes_three_rounds_unverified():
    """The r9 verdict's structural miss, pinned: under the PLANNED
    window, every registry row's latest driver signal must end the
    upcoming round at most MAX_SIGNAL_AGE rounds old — i.e. any row
    whose last signal is older than that must sit inside the head-50."""
    keys = list(entry.queries().keys())
    latest, next_round = _latest_round_per_query()
    window = set(keys[:WINDOW])
    stale = [
        (q, latest.get(q, 0))
        for q in keys
        if q not in window and next_round - latest.get(q, 0) > MAX_SIGNAL_AGE
    ]
    assert not stale, (
        f"rows outside the {WINDOW}-row window whose last driver signal "
        f"would be >{MAX_SIGNAL_AGE} rounds old after round {next_round}: "
        f"{stale} — rotate _PRIORITY"
    )


def test_never_verified_queries_lead_the_window():
    keys = list(entry.queries().keys())
    green = _driver_green()
    unseen = [q for q in keys if q not in green]
    window = set(keys[:WINDOW])
    missing = [q for q in unseen if q not in window]
    assert not missing, (
        f"{len(missing)} queries have no driver row and are OUTSIDE the "
        f"{WINDOW}-row window: {missing}"
    )


def test_priority_names_resolve():
    keys = set(entry.queries().keys())
    stale = [n for n in _PRIORITY if n not in keys]
    assert not stale, f"_PRIORITY entries not in the registry: {stale}"


def test_every_query_has_an_oracle():
    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert q == o, f"queries without oracle: {q - o}; orphan oracles: {o - q}"


def test_malformed_artifact_does_not_crash_ordering(tmp_path):
    """ADVICE r12: a CORRECTNESS_r*.json whose top level parses to a
    list/string must be skipped, not crash queries() via AttributeError."""
    from flink_cdc_spark.contract import _artifact_signal_rounds

    (tmp_path / "CORRECTNESS_r01.json").write_text('["not", "a", "dict"]')
    (tmp_path / "CORRECTNESS_r02.json").write_text('"just a string"')
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        '{"q_a": {"rows_match": true}, "q_b": {"rows_match": false}}'
    )
    latest = _artifact_signal_rounds(root=tmp_path)
    assert latest == {"q_a": 3, "q_b": 3}
