"""Registry-capacity bound (r13 policy, documented next to
`_derived_order` in flink_cdc_spark/contract.py): a 50-row driver window
on a 3-round max-staleness cycle covers 150 signals, so the registry must
stay at or below 150 - SLACK rows, SLACK >= 8 reserved for new/changed
rows. Breaching this means a future round's rotation alarm fires on a
genuine overflow no ordering can fix — merge or retire per the policy
BEFORE registering the row that would breach it."""

import __spark_entry__ as entry

WINDOW = 50
CYCLE_ROUNDS = 3
SLACK = 8


def test_registry_within_capacity():
    n = len(entry.queries())
    bound = WINDOW * CYCLE_ROUNDS - SLACK
    assert n <= bound, (
        f"registry has {n} rows > capacity bound {bound} "
        f"({WINDOW}-row window x {CYCLE_ROUNDS}-round cycle - {SLACK} slack); "
        "apply the capacity policy in contract.py (merge/retire) before "
        "adding rows"
    )
