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


# -- DSIR importance resampling ----------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., 2023, public): score
# each raw document by the log-likelihood ratio of its hashed n-gram features
# under a TARGET bag-of-ngrams distribution vs the RAW corpus distribution,
# then keep the top-scoring documents.  This is the standard pretraining-data
# selection step ("make the crawl look like the target domain").

DSIR_BUCKETS = 4096  # 3 hex chars of md5(feature) — string-keyed, portable
DSIR_TOPK = 200


def _spark_feats(df: DataFrame, key: str, text: str) -> DataFrame:
    """(doc_id, bucket) — one row per unigram+bigram occurrence, bucketed
    by the first 3 hex chars of md5(feature).  String buckets on purpose:
    md5 renders identical lowercase hex in Spark and DuckDB, so no
    integer-conversion portability risk."""
    toks = F.expr(
        "filter(" + _SPARK_WORDS.format(col=text) + ", t -> t <> '')"
    )
    base = df.select(F.col(key).alias("doc_id"), F.col("lang"), toks.alias("toks"))
    feats = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                # sequence(0, -1) is DESCENDING in Spark, so guard the
                # size<2 case to an empty bigram list explicitly
                "concat(toks, CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1])) "
                "ELSE array() END)"
            )
        ).alias("feat"),
    ).where(F.col("feat").isNotNull())
    return feats.select(
        "doc_id", "lang", F.substring(F.md5("feat"), 1, 3).alias("bucket")
    )


def dsir_importance(
    df: DataFrame,
    target_lang: str = "en",
    k: int = DSIR_TOPK,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """-> (doc_id, n_feat, score): the k documents whose hashed-ngram
    importance weight under the target (lang = target_lang) vs raw
    distribution is highest; score = mean per-feature log-ratio.

    Scale shape: ONE explode pass produces (doc, bucket) occurrences;
    the raw and target bucket histograms come out of a SINGLE groupBy on
    bucket (target counted as a conditional sum — not a second scan);
    the model is <= 4096 rows, broadcast back onto the occurrences; the
    per-doc aggregation is one exchange on doc_id; top-k is
    TakeOrderedAndProject (no global sort materialized).  Three
    exchanges total, none keyed on corpus-sized attributes except the
    bounded (doc x bucket) pair.

    Determinism: per-bucket log-ratios round to 6dp and aggregate
    through DECIMAL(38,6) so partial-agg order cannot change the result
    (the sampling.py logprob idiom); ties in the final top-k break on
    doc_id.
    """
    feats = _spark_feats(df, key, text)
    hist = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0)).alias("t"),
    )
    # corpus totals as a GLOBAL WINDOW over the <=4096-row histogram —
    # an agg + crossJoin(broadcast(...)) would recompute the histogram's
    # corpus pass a second time (plan-audit finding)
    w = Window.partitionBy(F.lit(1))
    b = F.lit(float(DSIR_BUCKETS))
    model = hist.select(
        "bucket",
        F.round(
            F.log((F.col("t") + F.lit(1.0)) / (F.sum("t").over(w) + b))
            - F.log((F.col("r") + F.lit(1.0)) / (F.sum("r").over(w) + b)),
            6,
        ).cast("decimal(18,6)").alias("lam"),
    )
    scored = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum("lam").cast("decimal(38,6)").alias("lam_sum"),
        )
        .select(
            "doc_id",
            "n_feat",
            F.round(F.col("lam_sum").cast("double") / F.col("n_feat"), 6).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def dsir_importance_oracle_sql(
    table: str = "documents",
    target_lang: str = "en",
    k: int = DSIR_TOPK,
    key: str = "doc_id",
    text: str = "text",
) -> str:
    words = _DUCK_WORDS.format(col=text)
    return f"""
    WITH docs AS (
      SELECT {key} AS doc_id, lang,
             list_filter({words}, t -> t <> '') AS toks
      FROM {table}
    ), feats AS (
      SELECT doc_id, lang,
             substr(md5(f), 1, 3) AS bucket
      FROM (
        SELECT doc_id, lang,
               unnest(list_concat(toks,
                 list_transform(range(len(toks) - 1),
                   i -> toks[i + 1] || ' ' || toks[i + 2]))) AS f
        FROM docs
      )
      WHERE f IS NOT NULL
    ), hist AS (
      SELECT bucket, COUNT(*) AS r,
             SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS t
      FROM feats GROUP BY bucket
    ), totals AS (
      SELECT SUM(r) AS rn, SUM(t) AS tn FROM hist
    ), model AS (
      SELECT bucket,
             CAST(round(ln((t + 1.0) / (tn + {DSIR_BUCKETS}.0))
                      - ln((r + 1.0) / (rn + {DSIR_BUCKETS}.0)), 6)
                  AS DECIMAL(18,6)) AS lam
      FROM hist, totals
    ), scored AS (
      SELECT f.doc_id, COUNT(*) AS n_feat,
             round(CAST(CAST(SUM(m.lam) AS DECIMAL(38,6)) AS DOUBLE)
                   / COUNT(*), 6) AS score
      FROM feats f JOIN model m USING (bucket)
      GROUP BY f.doc_id
    )
    SELECT doc_id, n_feat, score FROM scored
    ORDER BY score DESC, doc_id ASC LIMIT {k}
    """
