"""Data-mixing operators for training-corpus construction: deterministic
stratified hash sampling and corpus-level vocabulary statistics.

Scale shapes:
  * hash sampling is MAP-ONLY — the per-stratum keep/drop decision is a
    pure function of (key hash, stratum rate), so a 100-TB mixture pass
    touches each row once with zero shuffle, is reproducible across
    reruns/retries, and composes with partition pruning;
  * vocabulary counting is explode -> partial-aggregate -> final
    aggregate: Spark's hash aggregation does the map-side combine, so the
    shuffle carries one row per (partition, token), not per occurrence —
    the classic wordcount shape that survives a 1000-executor corpus.

Hash discipline: md5 on the stringified key, compared as an 8-hex-char
prefix against a threshold string. md5 renders identical lowercase hex in
Spark and DuckDB, making the oracle exact.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, Window, functions as F

# default mixture: downsample the dominant language, keep the rest
DEFAULT_RATES: Tuple[Tuple[str, float], ...] = (
    ("en", 0.5),
    ("zh", 0.8),
)
DEFAULT_RATE = 1.0


def _threshold_hex(rate: float) -> str:
    """rate in [0,1] -> 8-char threshold: keep iff md5-prefix < it.

    rate >= 1.0 must keep EVERY row, including prefixes of exactly
    'ffffffff': 'g' sorts after every hex digit, so the sentinel makes the
    strict < vacuously true in both Spark and the DuckDB oracle."""
    if rate >= 1.0:
        return "g0000000"
    return format(min(int(rate * 0x100000000), 0xFFFFFFFF), "08x")


def stratified_hash_sample(
    df: DataFrame,
    key: str = "doc_id",
    stratum: str = "lang",
    rates: Tuple[Tuple[str, float], ...] = DEFAULT_RATES,
    default_rate: float = DEFAULT_RATE,
) -> DataFrame:
    """Keep each row iff the md5 prefix of its key falls under its
    stratum's rate — deterministic mixture weighting with no RNG state."""
    prefix = F.substring(F.md5(F.col(key).cast("string")), 1, 8)
    thresh = F.lit(_threshold_hex(default_rate))
    for value, rate in rates:
        thresh = F.when(
            F.col(stratum) == value, F.lit(_threshold_hex(rate))
        ).otherwise(thresh)
    return df.where(prefix < thresh)


def hash_sample_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    stratum: str = "lang",
    rates: Tuple[Tuple[str, float], ...] = DEFAULT_RATES,
    default_rate: float = DEFAULT_RATE,
) -> str:
    cases = " ".join(
        f"WHEN {stratum} = '{v}' THEN '{_threshold_hex(r)}'" for v, r in rates
    )
    thresh = f"CASE {cases} ELSE '{_threshold_hex(default_rate)}' END"
    return f"""
    SELECT {key}, {stratum}, source, n_chars
    FROM {table}
    WHERE substr(md5(CAST({key} AS VARCHAR)), 1, 8) < {thresh}
    """


SPLIT_VAL_RATE = 0.01
SPLIT_TEST_RATE = 0.01


def _split_bounds(val_rate: float, test_rate: float) -> Tuple[str, str]:
    """Hex-prefix bounds: [0, val) -> val, [val, val+test) -> test,
    rest -> train. Same 8-hex-char md5-prefix discipline as sampling."""
    val_b = int(val_rate * 0x100000000)
    test_b = val_b + int(test_rate * 0x100000000)
    return format(val_b, "08x"), format(test_b, "08x")


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    val_rate: float = SPLIT_VAL_RATE,
    test_rate: float = SPLIT_TEST_RATE,
) -> DataFrame:
    """-> (key, split): deterministic train/val/test assignment from the
    md5 prefix of the key — map-only, reproducible across reruns, and
    STABLE under corpus growth (a document's split never changes when
    other documents are added/removed, unlike modulo-of-row-number
    schemes). The standard held-out-split op for training corpora."""
    val_b, test_b = _split_bounds(val_rate, test_rate)
    prefix = F.substring(F.md5(F.col(key).cast("string")), 1, 8)
    return df.select(
        F.col(key),
        F.when(prefix < val_b, F.lit("val"))
        .when(prefix < test_b, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def hash_split_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    val_rate: float = SPLIT_VAL_RATE,
    test_rate: float = SPLIT_TEST_RATE,
) -> str:
    val_b, test_b = _split_bounds(val_rate, test_rate)
    prefix = f"substr(md5(CAST({key} AS VARCHAR)), 1, 8)"
    return f"""
    SELECT {key},
           CASE WHEN {prefix} < '{val_b}' THEN 'val'
                WHEN {prefix} < '{test_b}' THEN 'test'
                ELSE 'train' END AS split
    FROM {table}
    """


TMIX_TARGET_ROWS = 200


def temperature_mix(
    df: DataFrame,
    target_rows: int = TMIX_TARGET_ROWS,
    key: str = "doc_id",
    source: str = "source",
) -> DataFrame:
    """alpha=0.5 temperature-balanced source mixing (the multilingual
    pretraining sampler of XLM-R/mT5: sample source s with probability
    proportional to n_s^alpha, flattening head sources and boosting tail
    sources), materialized as a deterministic hash sample whose expected
    size is target_rows.

    Unlike stratified_hash_sample the per-source rates are computed FROM
    THE DATA (rate_s = target * n_s^alpha / (n_s * sum_t n_t^alpha)), so
    the op is one tiny groupBy on source (map-side combined, |sources|
    rows) + a broadcast join + a map-only filter — the same 100-TB shape
    as the static sampler, one exchange total.

    Determinism across engines, with no float-summation hazard: alpha is
    fixed at 0.5 so n^alpha is sqrt (IEEE correctly-rounded in BOTH
    engines, unlike pow), each sqrt is floored to integer micro-units
    BEFORE the cross-source sum (integer sum — immune to partial-agg
    order), and the final rate is two exact-operand divisions and one
    multiply, each correctly rounded identically. The rate becomes an
    8-hex-char threshold compared against the salted md5 prefix of the
    key ('g0000000' sentinel keeps everything when rate >= 1)."""
    counts = df.groupBy(source).agg(F.count(F.lit(1)).alias("n"))
    mix = counts.select(
        source,
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * F.lit(1000000.0))
        .cast("bigint")
        .alias("s_int"),
    )
    # corpus total via a GLOBAL WINDOW over the |sources|-row relation —
    # an agg + crossJoin would recompute the source-count corpus pass
    rates = mix.select(
        source,
        (
            (
                F.lit(float(target_rows))
                / F.sum("s_int").over(Window.partitionBy(F.lit(1))).cast("double")
            )
            * (F.col("s_int").cast("double") / F.col("n").cast("double"))
        ).alias("rate"),
    )
    thresh = F.when(F.col("rate") >= 1.0, F.lit("g0000000")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("rate") * F.lit(4294967296.0)).cast("bigint"))),
            8,
            "0",
        )
    )
    prefix = F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(":tmix"))), 1, 8
    )
    return (
        df.join(F.broadcast(rates.select(source, thresh.alias("thresh"))), source)
        .where(prefix < F.col("thresh"))
        .select(key, source, "lang", "n_chars")
    )


def temperature_mix_oracle_sql(
    table: str = "documents",
    target_rows: int = TMIX_TARGET_ROWS,
    key: str = "doc_id",
    source: str = "source",
) -> str:
    return f"""
    WITH counts AS (
      SELECT {source}, COUNT(*) AS n FROM {table} GROUP BY {source}
    ), mix AS (
      SELECT {source}, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_int
      FROM counts
    ), tot AS (
      SELECT SUM(s_int) AS s_tot FROM mix
    ), rates AS (
      SELECT {source},
             (({target_rows}.0 / CAST(s_tot AS DOUBLE))
              * (CAST(s_int AS DOUBLE) / CAST(n AS DOUBLE))) AS rate
      FROM mix, tot
    ), thresholds AS (
      SELECT {source},
             CASE WHEN rate >= 1.0 THEN 'g0000000'
                  ELSE printf('%08x',
                         CAST(floor(rate * 4294967296.0) AS BIGINT)) END AS thresh
      FROM rates
    )
    SELECT t.{key}, t.{source}, t.lang, t.n_chars
    FROM {table} t JOIN thresholds th USING ({source})
    WHERE substr(md5(CAST(t.{key} AS VARCHAR) || ':tmix'), 1, 8) < th.thresh
    """


def vocab_topk(
    df: DataFrame, text: str = "text", k: int = 50
) -> DataFrame:
    """Corpus-level token statistics: occurrence count and document
    frequency per whitespace token, top-k by count (token breaks ties).
    The tokenizer-training precursor at corpus scale."""
    tokens = df.select(
        F.col("doc_id"),
        F.explode(F.split(F.col(text), " ")).alias("token"),
    ).where(F.col("token") != "")
    agg = tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return (
        agg.orderBy(F.col("occurrences").desc(), F.col("token"))
        .limit(k)
    )


def vocab_topk_oracle_sql(table: str = "documents", text: str = "text", k: int = 50) -> str:
    return f"""
    SELECT token, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
        SELECT doc_id, unnest(string_split({text}, ' ')) AS token
        FROM {table}
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY occurrences DESC, token
    LIMIT {k}
    """


# -- PII scrubbing -----------------------------------------------------------
# Patterns restricted to the Java-regex / RE2 dialect intersection so the
# DuckDB oracle replays them exactly. Order matters: emails before the
# phone pattern (an email's digit runs must not half-match as a phone).
PII_PATTERNS: Tuple[Tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_scrub(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses and count the hits
    per kind — map-only regexp expressions, the pre-training privacy
    scrub pass. Returns (key, scrubbed text, per-kind hit counts)."""
    scrubbed = F.col(text)
    cols: List = [F.col(key)]
    for kind, pat, token in PII_PATTERNS:
        cols.append(
            F.expr(f"regexp_count({text}, '{pat}')".replace("\\", "\\\\")).alias(
                f"n_{kind}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    cols.insert(1, scrubbed.alias("text"))
    return df.select(*cols)


def pii_scrub_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    scrub = text
    counts = []
    for kind, pat, token in PII_PATTERNS:
        esc = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({text}, '{esc}')) AS n_{kind}"
        )
        scrub = f"regexp_replace({scrub}, '{esc}', '{token}', 'g')"
    return f"""
    SELECT {key}, {scrub} AS text, {', '.join(counts)}
    FROM {table}
    """


def salt_pii(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Salt deterministic PII into every third document (the synthetic
    corpus has none): an email, a phone and an IPv4 derived from the key,
    so the scrub gate redacts real occurrences."""
    k = F.col(key)
    salted = F.concat(
        F.col(text),
        F.lit(" contact user"), k.cast("string"),
        F.lit("@example.com or +1-555-01"), (k % 90 + 10).cast("string"),
        F.lit("-22"), (k % 90 + 10).cast("string"),
        F.lit(" ip 10.0.0."), (k % 200).cast("string"),
    )
    return df.withColumn(text, F.when(k % 3 == 0, salted).otherwise(F.col(text)))


PII_SALTED_ORACLE_CTE = """(
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
                  || '-22' || CAST(doc_id % 90 + 10 AS VARCHAR)
                  || ' ip 10.0.0.' || CAST(doc_id % 200 AS VARCHAR)
           ELSE text END AS text
    FROM documents
)"""


# -- corpus-model quality scoring (CCNet-style) ------------------------------


def unigram_logprob(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document mean unigram negative log-probability under the
    corpus's own add-one-smoothed unigram model — the CCNet-style
    perplexity proxy used to bucket training data by "typicality".

    Two passes at scale: (1) token counts via map-side-combined hash
    aggregation (vocabulary ≪ corpus, so the model table is small);
    (2) per-doc scoring as an explode → token-key join → per-doc
    aggregate. Per-token logprobs round to 6dp and aggregate through
    DECIMAL so partial-aggregation order cannot change the result, and
    the last-ulp ln() differences between engines vanish."""
    tokens = df.select(
        F.col(key), F.explode(F.split(F.col(text), " ")).alias("token")
    ).where(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            -F.log((F.col("cnt") + 1) / (F.col("n_tokens") + F.col("vocab"))), 6
        ).cast("decimal(18,6)").alias("nll"),
    )
    scored = (
        tokens.join(model, "token")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("nll").alias("nll_sum"),
        )
    )
    return scored.select(
        F.col(key),
        F.col("n_scored"),
        F.round(F.col("nll_sum").cast("double") / F.col("n_scored"), 6).alias(
            "mean_nll"
        ),
    )


def unigram_logprob_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    return f"""
    WITH tokens AS (
      SELECT {key}, unnest(string_split({text}, ' ')) AS token
      FROM {table}
    ), toks AS (
      SELECT * FROM tokens WHERE token <> ''
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), totals AS (
      SELECT SUM(cnt) AS n_tokens, COUNT(*) AS vocab FROM counts
    ), model AS (
      SELECT token,
             CAST(round(-ln((cnt + 1.0) / (n_tokens + vocab)), 6)
                  AS DECIMAL(18,6)) AS nll
      FROM counts, totals
    )
    SELECT t.{key}, COUNT(*) AS n_scored,
           round(CAST(SUM(m.nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
    FROM toks t JOIN model m ON m.token = t.token
    GROUP BY t.{key}
    """


def bigram_logprob(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document mean bigram negative log-probability under the
    corpus's own add-one-smoothed conditional model P(w2|w1) =
    (cnt(w1 w2) + 1) / (cnt(w1) + V) — the next step up from the unigram
    typicality score (a KenLM-lite without backoff).

    Same scale shape as unigram_logprob: model tables are
    vocabulary-sized (bigram types ≪ corpus tokens after hash agg),
    scoring is one explode → model join → per-doc aggregate, and
    per-bigram logprobs round to 6dp then aggregate through DECIMAL so
    partial-aggregation order cannot change the result."""
    arr = F.expr(f"filter(split({text}, ' '), t -> t <> '')")
    base = df.select(F.col(key), arr.alias("toks")).where(F.size("toks") >= 2)
    bigrams = base.select(
        F.col(key),
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select(F.col(key), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = df.select(
        F.explode(F.expr(f"filter(split({text}, ' '), t -> t <> '')")).alias("t")
    ).agg(F.countDistinct("t").alias("v"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    model = (
        bi.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2",
            F.round(
                -F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))), 6
            ).cast("decimal(18,6)").alias("nll"),
        )
    )
    scored = (
        bigrams.join(model, ["w1", "w2"])
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("nll").alias("nll_sum"),
        )
    )
    return scored.select(
        F.col(key),
        F.col("n_scored"),
        F.round(F.col("nll_sum").cast("double") / F.col("n_scored"), 6).alias(
            "mean_nll"
        ),
    )


def bigram_logprob_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    return f"""
    WITH docs AS (
      SELECT {key}, list_filter(string_split({text}, ' '), t -> t <> '') AS toks
      FROM {table}
    ), eligible AS (
      SELECT * FROM docs WHERE len(toks) >= 2
    ), bigrams AS (
      SELECT {key}, bg['w1'] AS w1, bg['w2'] AS w2
      FROM (
        SELECT {key},
               unnest(list_transform(range(len(toks) - 1),
                 i -> {{'w1': toks[i + 1], 'w2': toks[i + 2]}})) AS bg
        FROM eligible
      )
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1
    ), vocab AS (
      SELECT COUNT(DISTINCT t) AS v FROM (
        SELECT unnest(list_filter(string_split({text}, ' '), x -> x <> '')) AS t
        FROM {table}
      )
    ), bi AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ), model AS (
      SELECT bi.w1, bi.w2,
             CAST(round(-ln((c12 + 1.0) / (c1 + v)), 6) AS DECIMAL(18,6)) AS nll
      FROM bi JOIN uni ON uni.w1 = bi.w1, vocab
    )
    SELECT b.{key}, COUNT(*) AS n_scored,
           round(CAST(SUM(m.nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
    FROM bigrams b JOIN model m ON m.w1 = b.w1 AND m.w2 = b.w2
    GROUP BY b.{key}
    """


BPE_PAIRS_TOPK = 50


def bpe_pair_counts(
    df: DataFrame, text: str = "text", k: int = BPE_PAIRS_TOPK
) -> DataFrame:
    """-> (pair, occurrences, rk): the top-k adjacent character pairs
    across the corpus, weighted by word occurrences — the statistic the
    FIRST merge step of BPE tokenizer training maximizes (Sennrich et
    al. 2016 start from character sequences; subsequent rounds re-count
    after each merge, each round this same wordcount shape).

    Scale shape: tokenize + per-word pair explode are MAP-ONLY array
    expressions (no UDF); the count is a map-side-combined hash
    aggregation shuffling one row per (partition, pair) — pair
    cardinality is alphabet², tiny. Ordering is (count DESC, pair ASC),
    fully deterministic."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text))), r"\s+")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    # global rank over the aggregated pair relation: cardinality is
    # alphabet-squared (hundreds of rows), so the single-partition window
    # is a post-aggregation formality, same shape as vocab_topk's sort
    w = Window.orderBy(F.col("occurrences").desc(), F.col("pair").asc())
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occurrences"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
    )


def bpe_pair_counts_oracle_sql(
    table: str = "documents", text: str = "text", k: int = BPE_PAIRS_TOPK
) -> str:
    return f"""
    WITH words AS (
      SELECT unnest(string_split_regex(lower(trim({text})), '\\s+')) AS w
      FROM {table}
    ),
    pairs AS (
      SELECT substring(w, CAST(i AS INTEGER), 2) AS pair
      FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
            FROM words WHERE length(w) >= 2)
    ),
    counted AS (
      SELECT pair, CAST(count(*) AS BIGINT) AS occurrences
      FROM pairs GROUP BY pair
    )
    SELECT pair, occurrences,
           CAST(row_number() OVER (ORDER BY occurrences DESC, pair ASC)
                AS BIGINT) AS rk
    FROM counted
    QUALIFY rk <= {k}
    """


# --------------------------------------------------------------------------
# exact per-stratum take (deterministic reservoir replacement)
# --------------------------------------------------------------------------

EXACT_TAKE_K = 40


#: hex-prefix length for the rank-threshold pre-filter: 16^4 = 65536
#: buckets — a billion-row stratum leaves ~k + n/65536 survivors for the
#: exact window's single per-stratum task.
_TAKE_BUCKET_HEX = 4


def _take_bucket_threshold(base: DataFrame, k: int) -> DataFrame:
    """-> (stratum, __bmax): per stratum, the EXACT smallest md5-prefix
    bucket whose cumulative count reaches k. md5 hex is lowercase in
    both engines, so prefix order agrees with full-string order — every
    row in a bucket < __bmax ranks before every row in a later bucket,
    hence the k-th ranked row sits in a bucket <= __bmax and dropping
    later buckets cannot change the top-k. Strata with fewer than k rows
    never reach the threshold and get no row here (caller keeps them
    whole). The histogram is map-side combined to <= 65536 x |strata|
    rows; the cumulative window partitions by stratum over that bounded
    aggregate, never over data."""
    from pyspark.sql import Window

    hist = (
        base.select("stratum", F.substring("__h", 1, _TAKE_BUCKET_HEX).alias("__b"))
        .groupBy("stratum", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wcum = (
        Window.partitionBy("stratum")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hist.withColumn("__cum", F.sum("__c").over(wcum))
        .where(F.col("__cum") >= k)
        .groupBy("stratum")
        .agg(F.min("__b").alias("__bmax"))
    )


def exact_stratified_take(
    df: DataFrame,
    k: int = EXACT_TAKE_K,
    key: str = "doc_id",
    stratum: str = "source",
    prefilter: bool = True,
) -> DataFrame:
    """-> (stratum, key, pick_rank): EXACTLY min(k, |stratum|) rows per
    stratum, chosen by md5-rank of the key — the deterministic stand-in
    for reservoir sampling when a pipeline needs "exactly k examples per
    source" (eval-set carving, balanced probes). Rate-based hash
    sampling (stratified_hash_sample) only hits k in expectation; this
    guarantees the count, is stable under corpus growth ONLY for the
    rows whose hash-rank stays under k (documented trade: exactness vs
    hash_split's growth stability).

    Scale shape: the exact rank window is single-task per stratum, so a
    skewed billion-row stratum would sort in one task — the ``prefilter``
    path (default) first computes the exact per-stratum md5-prefix
    bucket containing the k-th rank from a bounded histogram and drops
    every later bucket map-side (broadcast threshold join; one row per
    stratum, dimension-sized). The window then sorts only
    ~k + n/65536 survivors per stratum. Output is bit-identical with
    and without the pre-filter (the dropped rows provably rank > k)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(stratum).alias("stratum"),
        F.col(key),
        F.md5(F.col(key).cast("string")).alias("__h"),
    )
    if prefilter:
        thresh = _take_bucket_threshold(base, k)
        base = base.join(F.broadcast(thresh), "stratum", "left").where(
            F.col("__bmax").isNull()  # stratum smaller than k: keep whole
            | (F.substring("__h", 1, _TAKE_BUCKET_HEX) <= F.col("__bmax"))
        )
    w = Window.partitionBy("stratum").orderBy(F.col("__h").asc(), F.col(key).asc())
    return (
        base.withColumn("pick_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("pick_rank") <= k)
        .select("stratum", key, "pick_rank")
    )


def exact_stratified_take_oracle_sql(
    table: str = "documents",
    k: int = EXACT_TAKE_K,
    key: str = "doc_id",
    stratum: str = "source",
) -> str:
    return f"""
    SELECT stratum, {key}, pick_rank FROM (
      SELECT {stratum} AS stratum, {key},
             CAST(row_number() OVER (
                    PARTITION BY {stratum}
                    ORDER BY md5(CAST({key} AS VARCHAR)) ASC, {key} ASC)
                  AS BIGINT) AS pick_rank
      FROM {table}
    ) WHERE pick_rank <= {k}
    """
