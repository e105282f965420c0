"""Custom stateful streaming operators (applyInPandasWithState).

The reference engine keeps no user-visible operator state (SURVEY.md §2.5
"what does NOT exist"), but a training-data pipeline at 100 TB needs at
least one: cross-micro-batch deduplication — emit a document the first
time its content fingerprint is seen, drop every later arrival, across
batches and restarts (state lives in the streaming checkpoint).

Shape: groupBy(fingerprint).applyInPandasWithState — state is partitioned
by the group key, so the operator scales horizontally exactly like the
dedup shuffle; each group's state is one boolean (seen) plus the keeper
id, a few bytes per distinct document.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("keeper", T.LongType()),
    ]
)


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("doc_id")
    if state.exists:
        (seen, keeper) = state.get
    else:
        seen, keeper = False, None
    if not seen and len(batch) > 0:
        first = batch.iloc[[0]]
        state.update((True, int(first["doc_id"].iloc[0])))
        yield first
    # all other rows (same batch or later batches) are duplicates: drop


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-seen-wins streaming dedup keyed by normalized-content md5.

    Input: a streaming DataFrame with (doc_id BIGINT, text STRING, ...).
    Output: the surviving (doc_id, fingerprint) per distinct content —
    join back to the payload downstream (foreachBatch) if rows are needed.
    """
    fp = F.md5(F.expr(f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"))
    keyed = docs.select(F.col("doc_id").cast("long").alias("doc_id"), fp.alias("fingerprint"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fingerprint", T.StringType()),
        ]
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=out_schema,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
