"""Sequence packing — grouping documents into fixed-token-budget training
sequences (the "pack short documents into one context window" step every
LLM pre-training pipeline runs between dedup/filter and tokenization).

Beyond-reference op (the reference has no analog); the contract is its
own DuckDB oracle.

Scale shape: packing is a running-sum-with-boundary problem, which is
sequential over a global order — so the global order is SHARDED first
(doc_id % n_shards) and packs never cross shards. Each shard's prefix
sum is one window over its own partition (one hash shuffle on the shard
key, state = one running sum per shard, embarrassingly parallel across
shards) — at 100 TB, shards ~ O(corpus/executor memory) and the plan is
a single exchange + window + hash aggregate. A document longer than the
budget occupies packs alone (its start offset decides its pack; the
boundary-straddling tail is the tokenizer's truncation concern, recorded
here as pack overflow).

Determinism: shard assignment and within-shard order are pure functions
of doc_id; token counts are the integer whitespace counts shared with
textstats.token_stats, so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_SHARDS = 16
MAX_TOKENS = 1024


def pack_sequences(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    max_tokens: int = MAX_TOKENS,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """-> (shard, pack_idx, n_docs, total_tokens, first_doc, last_doc,
    overflow): greedy start-offset packing per shard — a doc lands in the
    pack where its exclusive prefix sum falls; `overflow` flags packs
    whose total exceeds the budget (a straddling or oversized doc)."""
    toks = F.expr(f"size(split(trim({text}), '\\\\s+'))")
    base = df.select(
        F.col(key).alias("doc_id"),
        (F.col(key) % n_shards).alias("shard"),
        toks.alias("toks"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("toks").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    # integer division, not float floor: exact at any prefix-sum magnitude
    packed = base.withColumn("__cum_excl", cum_excl).withColumn(
        "pack_idx", F.expr(f"__cum_excl div {max_tokens}").cast("bigint")
    )
    return (
        packed.groupBy("shard", "pack_idx")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .withColumn(
            "overflow", (F.col("total_tokens") > F.lit(max_tokens)).cast("boolean")
        )
    )


def pack_sequences_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    text: str = "text",
    max_tokens: int = MAX_TOKENS,
    n_shards: int = N_SHARDS,
) -> str:
    toks = f"len(string_split_regex(trim({text}), '\\s+'))"
    return f"""
    WITH base AS (
      SELECT {key} AS doc_id, {key} % {n_shards} AS shard, {toks} AS toks
      FROM {table}
    ),
    placed AS (
      SELECT shard, doc_id, toks,
             CAST(COALESCE(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0)
                  // {max_tokens} AS BIGINT) AS pack_idx
      FROM base
    )
    SELECT shard, pack_idx,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           (CAST(sum(toks) AS BIGINT) > {max_tokens}) AS overflow
    FROM placed
    GROUP BY shard, pack_idx
    """
