"""Registry-wide terminal-schema invariants (r9 verdict item 1).

The driver's correctness gate collects both the Spark result and the
DuckDB oracle result through pandas/Arrow before hashing; Decimal
columns are normalized ASYMMETRICALLY on the two sides (the classic
failure is one side's DECIMAL silently becoming float64), so a query
can be value-correct and still hash-red — exactly what happened to r9's
seven TPC-H/analytics rows. The repo rule is therefore: exact DECIMAL
arithmetic stays INTERNAL; every contract query's terminal schema
carries only driver-stable types (integral/float/string/bool/
date/time/binary/arrays thereof) — never decimal.
"""

import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entry


def test_no_decimal_dtype_in_any_contract_result_schema(spark):
    """Builds every queries() entry at the test SF and asserts no
    decimal (or other collector-unstable type) survives to the terminal
    schema. Slow (~2 min: the streaming rows execute eagerly) but this
    is the single invariant that kept 7 value-correct rows driver-red
    for a round."""
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        types = df.schema.simpleString()
        if "decimal" in types:
            offenders[name] = types
    assert not offenders, (
        "contract queries shipping decimal terminal columns (cast to "
        f"BIGINT where magnitude provably fits, else STRING): {offenders}"
    )
