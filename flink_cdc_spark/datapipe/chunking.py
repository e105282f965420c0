"""Document chunking, epoch shuffling and per-source caps — the
corpus-shaping steps between filtering/dedup and tokenization in an LLM
training-data pipeline.

Beyond-reference ops (the reference has no analog); each contract is its
own DuckDB oracle.

Scale shapes:
- chunking is MAP-ONLY (tokenize + explode a computed chunk count); no
  shuffle at any corpus size, the plan is a pruned scan + generator.
- epoch shuffle is SHARDED: the permutation is (shard, pos-in-shard)
  where shard = a seeded-hash prefix and pos = a window per shard — one
  hash exchange, never a global sort. Consumers read shards in order;
  that IS how epoch shuffles ship at scale (shard + intra-shard order),
  and it avoids the single-reducer trap of `row_number() OVER (ORDER BY
  hash)` with no partition.
- source caps are one exchange on the source key + a bounded window;
  a dominant source is bounded by its own row count (salt if one source
  is the whole corpus).

Determinism: token counts are the integer whitespace counts shared with
textstats.token_stats; shuffle keys are md5 hex strings (identical
lowercase-hex semantics in Spark and DuckDB); all tie-breaks end on the
primary key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHUNK_TOKENS = 96
CHUNK_STRIDE = 64
CAP_PER_SOURCE = 120


def chunk_documents(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """-> (doc_id, chunk_idx, start_tok, n_tok, chunk_hash): overlapping
    token windows (HuggingFace-style `stride` sliding), last window
    clipped to the document end; every document yields >= 1 chunk. The
    chunk text itself is gated by md5 so the verified result stays
    narrow."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError(f"need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}")
    toks = F.expr(f"split(trim({text}), '\\\\s+')")
    base = df.select(
        F.col(key).alias("doc_id"),
        toks.alias("toks"),
    ).withColumn("n", F.expr("size(toks)").cast("bigint"))
    counted = base.withColumn(
        "n_chunks",
        F.when(F.col("n") <= chunk_tokens, F.lit(1).cast("bigint")).otherwise(
            F.expr(f"1 + ((n - {chunk_tokens} + {stride} - 1) div {stride})")
        ),
    )
    exploded = counted.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.expr("sequence(0L, n_chunks - 1)")).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    n_tok = F.least(F.lit(chunk_tokens).cast("bigint"), F.col("n") - start)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        n_tok.cast("bigint").alias("n_tok"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), start + 1, n_tok), " ")
        ).alias("chunk_hash"),
    )


def chunk_documents_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    text: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> str:
    return f"""
    WITH base AS (
      SELECT {key} AS doc_id,
             regexp_split_to_array(trim({text}), '\\s+') AS toks,
             CAST(len(regexp_split_to_array(trim({text}), '\\s+')) AS BIGINT) AS n
      FROM {table}
    ),
    counted AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {chunk_tokens} THEN CAST(1 AS BIGINT)
                  ELSE 1 + (n - {chunk_tokens} + {stride} - 1) // {stride}
             END AS n_chunks
      FROM base
    ),
    exploded AS (
      -- select-list unnest: lateral-safe on DuckDB 1.0.0 (the sandbox
      -- version rejects `FROM counted, generate_series(...)` with column
      -- parameters as an unsupported lateral join)
      SELECT doc_id, toks, n,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM counted
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {stride} AS BIGINT) AS start_tok,
           CAST(least({chunk_tokens}, n - chunk_idx * {stride}) AS BIGINT) AS n_tok,
           md5(array_to_string(
                 toks[CAST(chunk_idx * {stride} + 1 AS BIGINT) :
                      CAST(chunk_idx * {stride}
                           + least({chunk_tokens}, n - chunk_idx * {stride}) AS BIGINT)],
                 ' ')) AS chunk_hash
    FROM exploded
    """


def epoch_shuffle(
    df: DataFrame,
    seed: int = 0,
    key: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, shard, pos): deterministic seeded epoch permutation.
    shard = first 2 hex chars of md5(key ':' seed) (256 shards), pos =
    rank within the shard by (full hash, key). Reading shards in
    lexicographic order and rows by pos yields the epoch order; a new
    seed is a brand-new permutation. One hash exchange on shard, a
    window per shard — no global sort, no single reducer."""
    h = F.md5(
        F.concat_ws(":", F.col(key).cast("string"), F.lit(str(seed)))
    )
    keyed = df.select(F.col(key).alias("doc_id"), h.alias("h"))
    shard = F.substring("h", 1, 2)
    w = Window.partitionBy(shard).orderBy(F.col("h"), F.col("doc_id"))
    return keyed.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def epoch_shuffle_oracle_sql(
    table: str = "documents", seed: int = 0, key: str = "doc_id"
) -> str:
    h = f"md5(CAST({key} AS VARCHAR) || ':' || '{seed}')"
    return f"""
    SELECT {key} AS doc_id,
           substring({h}, 1, 2) AS shard,
           CAST(row_number() OVER (
                  PARTITION BY substring({h}, 1, 2)
                  ORDER BY {h}, {key}) AS BIGINT) AS pos
    FROM {table}
    """


def source_cap(
    df: DataFrame,
    cap: int = CAP_PER_SOURCE,
    key: str = "doc_id",
    source: str = "source",
    quality: str = "n_chars",
) -> DataFrame:
    """-> (doc_id, source, n_chars, rk): keep the `cap` highest-quality
    documents per source (domain caps — the anti-boilerplate /
    anti-single-site-domination step). Quality here is the n_chars
    column; swap in any scored column. One exchange on source + a
    rank-bounded window."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        df.select(
            F.col(key).alias("doc_id"),
            F.col(source).alias("source"),
            F.col(quality).alias("n_chars"),
        )
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= cap)
    )


def source_cap_oracle_sql(
    table: str = "documents",
    cap: int = CAP_PER_SOURCE,
    key: str = "doc_id",
    source: str = "source",
    quality: str = "n_chars",
) -> str:
    return f"""
    SELECT doc_id, source, n_chars, rk FROM (
      SELECT {key} AS doc_id, {source} AS source, {quality} AS n_chars,
             CAST(row_number() OVER (
                    PARTITION BY {source}
                    ORDER BY {quality} DESC, {key} ASC) AS BIGINT) AS rk
      FROM {table}
    ) WHERE rk <= {cap}
    """
