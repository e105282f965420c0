"""Term-importance ranking (tf-idf top-k) over the document corpus —
the keyword-extraction / lexical-feature step of a training-data
pipeline (topic tagging, near-match retrieval keys, quality signals).

Beyond-reference op (the reference has no analog); the contract is its
own DuckDB oracle.

Scale shape: tokenize+explode (map-only) -> map-side-combined count to
(doc, term) -> term document-frequency as a WINDOW over the term
partition of the tf relation (NOT from the raw explode: df counts docs,
and tf is already one row per (doc, term); and not a groupBy + re-join,
which would shuffle tf twice) -> per-doc bounded window. Three
exchanges total, each keyed on bounded-cardinality attributes
(doc x term, term, doc); the vocab relation is corpus-sublinear but not
small enough to assume broadcast, so the term exchange is by design.

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
    # document frequency as a window over the term partition: tf is
    # already one row per (doc, term), so count(*) over term == number of
    # docs containing the term — one exchange on term instead of a
    # groupBy + re-join (two). Same r9 rewrite as the PPJoin prefix rank.
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("bigint")
        )
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
