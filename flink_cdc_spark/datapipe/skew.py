"""Hot-key skew mitigation: salted replicated joins.

AQE's skew-join handling (enabled engine-wide) splits oversized
SORT-MERGE partitions at runtime, which covers most skew. The residual
case at 100 TB is a join key so hot that ONE key's rows exceed an
executor (a single user/domain with billions of rows) joined against a
side too large to broadcast: there, pre-salting is the standard fix —
replicate the small side N ways, scatter the big side's hot rows across
the N replicas, join on (key, salt).

The transformation is exactly output-equivalent to the plain join for
inner/left joins: each big-side row carries one deterministic salt and
meets precisely the one replica holding its salt. Salt comes from a
caller-named UNIQUE column (not rand() — retries/reruns must land rows
on the same replica for determinism and the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_by: str,
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join `big` (skewed side) to `small` (replicated side) on `key`,
    scattering big's rows across `n_salt` replicas by a deterministic
    hash of `salt_by` (a unique column of `big`). Output columns =
    big's ++ small's minus the duplicated key, same as a plain
    `big.join(small, key, how)`."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salt)).cast("int")
    )
    replicas = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_big.join(replicas, [key, "__salt"], how).drop("__salt")
