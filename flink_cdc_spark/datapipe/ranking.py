"""Term-importance ranking (tf-idf top-k) over the document corpus —
the keyword-extraction / lexical-feature step of a training-data
pipeline (topic tagging, near-match retrieval keys, quality signals).

Beyond-reference op (the reference has no analog); the contract is its
own DuckDB oracle.

Scale shape: tokenize+explode (map-only) -> map-side-combined count to
(doc, term) -> term document-frequency from the tf relation (NOT from
the raw explode: df counts docs, and tf is already one row per
(doc, term)) -> join tf x df on term -> per-doc bounded window. Every
exchange keys on bounded-cardinality attributes (doc, term); the vocab
relation is corpus-sublinear but not small enough to assume broadcast,
so the term join is a shuffle join on term by design.

Determinism: ordering is the integer triple (tf DESC, df ASC, term ASC)
— tf-idf-flavored (common AND rare-in-corpus first) with zero floats, so
the oracle agrees bit-for-bit. The exact real-valued score is the pair
(tf, df) itself; consumers compute tf*log(N/df) downstream if they want
the classic weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOPK_TERMS = 5

_SPARK_WORDS = "split(lower(trim(regexp_replace({col}, '\\\\s+', ' '))), ' ')"
_DUCK_WORDS = "string_split(lower(trim(regexp_replace({col}, '\\s+', ' ', 'g'))), ' ')"


def tfidf_topk(
    df: DataFrame,
    k: int = TOPK_TERMS,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """-> (doc_id, term, tf, df, rk): the k most important terms per
    document by (tf DESC, df ASC, term ASC)."""
    words = df.select(
        F.col(key).alias("doc_id"),
        F.explode(F.expr(_SPARK_WORDS.format(col=text))).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "rk")
    )


def tfidf_topk_oracle_sql(
    table: str = "documents",
    k: int = TOPK_TERMS,
    key: str = "doc_id",
    text: str = "text",
) -> str:
    words = _DUCK_WORDS.format(col=text)
    return f"""
    WITH words AS (
      SELECT {key} AS doc_id, unnest({words}) AS term FROM {table}
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM words GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             CAST(row_number() OVER (
                    PARTITION BY tf.doc_id
                    ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC)
                  AS BIGINT) AS rk
      FROM tf JOIN dfreq USING (term)
    )
    SELECT doc_id, term, tf, df, rk FROM ranked WHERE rk <= {k}
    """
