"""Text-analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All pure built-in expressions (whole-stage codegen, no shuffle at all —
these are map-only and scale embarrassingly). Regex patterns restricted
to the dialect intersection of Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# stopword alternations per language for the n-gram language heuristic;
# deterministic precedence order breaks ties
LANG_STOPWORDS = (
    ("en", "(the|and|of|to|in)"),
    ("de", "(der|die|und|das|ist)"),
    ("fr", "(le|la|les|et|est)"),
    ("es", "(el|los|las|una|es)"),
)
_CJK_CLASS = "[一-鿿]"

BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
STOPWORD_PATTERN = r"\b(the|a|of|and|to)\b"
FINGERPRINT_HEX_CHARS = 15  # 60 bits fits signed BIGINT


def _lang_score_exprs_spark(text: str):
    scores = [
        (lang, F.expr(f"regexp_count(lower({text}), '\\\\b{pat}\\\\b')"))
        for lang, pat in LANG_STOPWORDS
    ]
    cjk = F.expr(f"regexp_count({text}, '{_CJK_CLASS}')")
    return scores, cjk


def language_id(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic language ID: CJK-char presence wins, else argmax of
    per-language stopword hit counts (declaration order breaks ties)."""
    scores, cjk = _lang_score_exprs_spark(text)
    best = F.greatest(*[e for _, e in scores])
    pred = F.lit("es")
    for lang, expr in reversed([s for s in scores][:-1]):
        pred = F.when(expr == best, F.lit(lang)).otherwise(pred)
    pred = F.when(cjk > 0, F.lit("zh")).otherwise(
        F.when(best <= 0, F.lit("und")).otherwise(pred)
    )
    cols = [F.col(key), pred.alias("predicted_lang")]
    for lang, expr in scores:
        cols.append(expr.alias(f"score_{lang}"))
    return df.select(*cols)


def language_id_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    score_sql = {
        lang: f"len(regexp_extract_all(lower({text}), '\\b{pat}\\b'))"
        for lang, pat in LANG_STOPWORDS
    }
    cjk = f"len(regexp_extract_all({text}, '{_CJK_CLASS}'))"
    langs = [lang for lang, _ in LANG_STOPWORDS]
    best = "greatest(" + ", ".join(score_sql[lang] for lang in langs) + ")"
    cases = [f"WHEN {cjk} > 0 THEN 'zh'", f"WHEN {best} <= 0 THEN 'und'"]
    for lang in langs[:-1]:
        cases.append(f"WHEN {score_sql[lang]} = {best} THEN '{lang}'")
    case_expr = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    score_cols = ", ".join(f"{score_sql[lang]} AS score_{lang}" for lang in langs)
    return f"SELECT {key}, {case_expr} AS predicted_lang, {score_cols} FROM {table}"


def token_stats(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts + quality signals.

    quality = 0.4*stopword_ratio + 0.3*min(ws_tokens/100, 1) - 0.3*punct_ratio,
    all ratios over deterministic integer counts (portable rounding).
    """
    ws = F.expr(f"size(split(trim({text}), '\\\\s+'))")
    bpe = F.expr(f"regexp_count({text}, '{BPE_ISH_PATTERN}')")
    punct = F.expr(f"regexp_count({text}, '[^A-Za-z0-9 ]')")
    stop = F.expr(f"regexp_count(lower({text}), '{STOPWORD_PATTERN}')".replace("\\b", "\\\\b"))
    nchars = F.length(text)
    punct_ratio = F.round(punct.cast("double") / nchars, 4)
    stop_ratio = F.round(stop.cast("double") / ws, 4)
    quality = F.round(
        0.4 * stop.cast("double") / ws
        + 0.3 * F.least(ws.cast("double") / 100, F.lit(1.0))
        - 0.3 * punct.cast("double") / nchars,
        4,
    )
    return df.select(
        F.col(key),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        nchars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_stats_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    ws = f"len(string_split_regex(trim({text}), '\\s+'))"
    bpe = f"len(regexp_extract_all({text}, '{BPE_ISH_PATTERN}'))"
    punct = f"len(regexp_extract_all({text}, '[^A-Za-z0-9 ]'))"
    stop = f"len(regexp_extract_all(lower({text}), '{STOPWORD_PATTERN}'))"
    return f"""
    SELECT {key},
           {ws} AS ws_tokens,
           {bpe} AS bpe_tokens,
           length({text}) AS n_chars,
           round({punct}::DOUBLE / length({text}), 4) AS punct_ratio,
           round({stop}::DOUBLE / {ws}, 4) AS stopword_ratio,
           round(0.4 * {stop}::DOUBLE / {ws}
                 + 0.3 * least({ws}::DOUBLE / 100, 1.0)
                 - 0.3 * {punct}::DOUBLE / length({text}), 4) AS quality
    FROM {table}
    """


def fingerprint(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text,
    plus a 60-bit integer fingerprint (hex prefix) for compact storage /
    bucketing at scale."""
    norm = f"lower(trim(regexp_replace({text}, '\\\\s+', ' ')))"
    md5 = F.expr(f"md5({norm})")
    fp64 = F.expr(
        f"cast(conv(substring(md5({norm}), 1, {FINGERPRINT_HEX_CHARS}), 16, 10) AS bigint)"
    )
    return df.select(F.col(key), md5.alias("fp_md5"), fp64.alias("fp64"))


def fingerprint_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    norm = f"lower(trim(regexp_replace({text}, '\\s+', ' ', 'g')))"
    return f"""
    SELECT {key},
           md5({norm}) AS fp_md5,
           ('0x' || substr(md5({norm}), 1, {FINGERPRINT_HEX_CHARS}))::BIGINT AS fp64
    FROM {table}
    """


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality filters) + decontamination
# ---------------------------------------------------------------------------

_WORDS = "split(lower(trim(regexp_replace({col}, '\\\\s+', ' '))), ' ')"


def _ngram_expr(words: str, n: int) -> str:
    """Word n-grams as an array expression (empty when the doc is shorter
    than n). Built-ins only — stays in whole-stage codegen."""
    if n == 1:
        return words
    return (
        f"CASE WHEN size({words}) >= {n} THEN "
        f"transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> array_join(slice({words}, i, {n}), ' ')) "
        f"ELSE array()::array<string> END"
    )


def repetition_stats(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document repetition signals (the Gopher quality-filter family:
    duplicate word/n-gram fractions, most-common-word share). Map-only
    built-in array expressions; ratios rounded to 6dp so the DuckDB oracle
    hash-matches float-exactly."""
    w = _WORDS.format(col=text)
    g2, g3 = _ngram_expr(w, 2), _ngram_expr(w, 3)

    def dup_frac(arr: str) -> str:
        return (
            f"round(CASE WHEN size({arr}) > 0 THEN "
            f"1.0 - size(array_distinct({arr})) / cast(size({arr}) AS double) "
            f"ELSE 0.0 END, 6)"
        )

    top_word = (
        f"round(CASE WHEN size({w}) > 0 THEN "
        f"array_max(transform(array_distinct({w}), "
        f"x -> size(filter({w}, y -> y = x)))) / cast(size({w}) AS double) "
        f"ELSE 0.0 END, 6)"
    )
    return df.selectExpr(
        key,
        f"size({w}) AS n_words",
        f"{dup_frac(w)} AS dup_word_frac",
        f"{top_word} AS top_word_frac",
        f"{dup_frac(g2)} AS dup_2gram_frac",
        f"{dup_frac(g3)} AS dup_3gram_frac",
    )


def repetition_stats_oracle_sql(
    table: str = "documents", key: str = "doc_id", text: str = "text"
) -> str:
    w = (
        f"string_split(lower(trim(regexp_replace({text}, '\\s+', ' ', 'g'))), ' ')"
    )

    def grams(n: int) -> str:
        if n == 1:
            return "w"
        joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
        return (
            f"CASE WHEN len(w) >= {n} THEN "
            f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined}) "
            f"ELSE [] END"
        )

    def dup_frac(arr: str) -> str:
        return (
            f"round(CASE WHEN len({arr}) > 0 THEN "
            f"1.0 - len(list_distinct({arr})) / CAST(len({arr}) AS DOUBLE) "
            f"ELSE 0.0 END, 6)"
        )

    top_word = (
        "round(CASE WHEN len(w) > 0 THEN "
        "list_max(list_transform(list_distinct(w), "
        "x -> len(list_filter(w, y -> y = x)))) / CAST(len(w) AS DOUBLE) "
        "ELSE 0.0 END, 6)"
    )
    return f"""
    WITH words AS (SELECT {key}, {w} AS w FROM {table})
    SELECT {key},
           len(w) AS n_words,
           {dup_frac('w')} AS dup_word_frac,
           {top_word} AS top_word_frac,
           {dup_frac(grams(2))} AS dup_2gram_frac,
           {dup_frac(grams(3))} AS dup_3gram_frac
    FROM words
    """


DECONTAMINATE_NGRAM = 3
DECONTAMINATE_BENCH_MOD = 97  # doc_id % 97 == 0 plays the benchmark set


def decontaminate(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = DECONTAMINATE_NGRAM,
    bench_mod: int = DECONTAMINATE_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination: drop corpus documents sharing any word
    n-gram with the benchmark set (the standard pre-training hygiene step
    against test-set leakage).

    Scale shape: the benchmark n-gram set is tiny relative to the corpus —
    distinct grams of the benchmark docs broadcast into a hash semi-join
    against the corpus' exploded grams; contaminated ids then LEFT
    ANTI-join back. The corpus explode is map-side; the only wide ops are
    keyed by gram (broadcast) and by id (anti join)."""
    w = _WORDS.format(col=text)
    grams = _ngram_expr(w, n)
    bench = (
        df.where(f"{key} % {bench_mod} = 0")
        .selectExpr(f"explode({grams}) AS gram")
        .distinct()
    )
    corpus = df.where(f"{key} % {bench_mod} <> 0")
    corpus_grams = corpus.selectExpr(key, f"explode({grams}) AS gram")
    contaminated = (
        corpus_grams.join(F.broadcast(bench), "gram", "left_semi")
        .select(key)
        .distinct()
    )
    return corpus.join(contaminated, key, "left_anti").select(
        key, "lang", "source", "n_chars"
    )


def decontaminate_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    text: str = "text",
    n: int = DECONTAMINATE_NGRAM,
    bench_mod: int = DECONTAMINATE_BENCH_MOD,
) -> str:
    w = f"string_split(lower(trim(regexp_replace({text}, '\\s+', ' ', 'g'))), ' ')"
    joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    grams = (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined}) "
        f"ELSE [] END"
    )
    return f"""
    WITH words AS (SELECT {key}, {grams} AS g
                   FROM (SELECT {key}, {w} AS w FROM {table})),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM words WHERE {key} % {bench_mod} = 0),
    corpus_grams AS (SELECT {key}, unnest(g) AS gram FROM words WHERE {key} % {bench_mod} <> 0),
    contaminated AS (SELECT DISTINCT c.{key} FROM corpus_grams c JOIN bench b ON c.gram = b.gram)
    SELECT d.{key}, d.lang, d.source, d.n_chars
    FROM {table} d
    WHERE d.{key} % {bench_mod} <> 0
      AND d.{key} NOT IN (SELECT {key} FROM contaminated)
    """


# -- Gopher quality rules (Rae et al. 2021, public) ---------------------------

GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3  # mean word length bounds (integer cross-multiplied)
GOPHER_MAX_MWL = 10
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_FRAC = (4, 5)  # >= 4/5 of words contain a letter


def gopher_rules(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """-> (doc_id, n_words, wc_ok, mwl_ok, alpha_ok, stop_ok, keep): the
    Gopher rule-based document filter — word-count bounds, mean word
    length in [3, 10], >= 80% of words containing an alphabetic char,
    and >= 2 distinct stop words present.

    Map-only (array expressions over the token list; no explode, no
    shuffle, no UDF) — the cheapest possible 100-TB quality pass.
    Determinism: every ratio threshold is an integer cross-multiplication
    (3*nw <= chars <= 10*nw, 5*alpha >= 4*nw), so there is no float
    rounding to diverge between engines; distinct-stopword presence is a
    sum of array_contains indicators (list-intersection semantics differ
    on duplicates across engines — indicators don't).
    """
    toks = F.expr(
        f"filter(split(lower(trim(regexp_replace({text}, '\\\\s+', ' '))), ' '),"
        " t -> t <> '')"
    )
    base = df.select(
        F.col(key),
        toks.alias("toks"),
    ).select(
        F.col(key),
        F.size("toks").cast("bigint").alias("n_words"),
        F.expr("aggregate(toks, 0L, (acc, w) -> acc + length(w))").alias("wchars"),
        F.expr("size(filter(toks, w -> w rlike '[a-z]'))").cast("bigint").alias("alpha_words"),
        sum(
            F.expr(f"CASE WHEN array_contains(toks, '{s}') THEN 1 ELSE 0 END")
            for s in GOPHER_STOPWORDS
        ).cast("bigint").alias("n_stop"),
    )
    an, ad = GOPHER_MIN_ALPHA_FRAC
    wc_ok = (F.col("n_words") >= GOPHER_MIN_WORDS) & (F.col("n_words") <= GOPHER_MAX_WORDS)
    mwl_ok = (F.col("wchars") >= GOPHER_MIN_MWL * F.col("n_words")) & (
        F.col("wchars") <= GOPHER_MAX_MWL * F.col("n_words")
    )
    alpha_ok = F.lit(ad) * F.col("alpha_words") >= F.lit(an) * F.col("n_words")
    stop_ok = F.col("n_stop") >= GOPHER_MIN_STOPWORDS
    return base.select(
        F.col(key),
        "n_words",
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (wc_ok & mwl_ok & alpha_ok & stop_ok).alias("keep"),
    )


def gopher_rules_oracle_sql(table: str = "documents", key: str = "doc_id", text: str = "text") -> str:
    toks = (
        f"list_filter(string_split(lower(trim(regexp_replace({text}, '\\s+', ' ', 'g'))), ' '),"
        " t -> t <> '')"
    )
    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(toks, '{s}') THEN 1 ELSE 0 END)"
        for s in GOPHER_STOPWORDS
    )
    an, ad = GOPHER_MIN_ALPHA_FRAC
    return f"""
    WITH base AS (
      SELECT {key},
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS wchars,
             CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
             CAST({stop_sum} AS BIGINT) AS n_stop
      FROM (SELECT {key}, {toks} AS toks FROM {table})
    )
    SELECT {key}, n_words,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS wc_ok,
           (wchars >= {GOPHER_MIN_MWL} * n_words AND wchars <= {GOPHER_MAX_MWL} * n_words) AS mwl_ok,
           ({ad} * alpha_words >= {an} * n_words) AS alpha_ok,
           (n_stop >= {GOPHER_MIN_STOPWORDS}) AS stop_ok,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND wchars >= {GOPHER_MIN_MWL} * n_words AND wchars <= {GOPHER_MAX_MWL} * n_words
            AND {ad} * alpha_words >= {an} * n_words
            AND n_stop >= {GOPHER_MIN_STOPWORDS}) AS keep
    FROM base
    """


# -- cross-document n-gram duplication (C4-style boilerplate signal) ----------

XDOC_NGRAM = 3


def crossdoc_ngram_overlap(
    df: DataFrame, key: str = "doc_id", text: str = "text", n: int = XDOC_NGRAM
) -> DataFrame:
    """-> (doc_id, n_grams, n_dup, dup_frac): per document, the fraction
    of its DISTINCT word n-grams that also appear in at least one OTHER
    document — the cross-corpus boilerplate signal (repetition_stats is
    intra-doc; decontaminate is benchmark-set overlap; this is
    corpus-burstiness, the C4 cleanup heuristic).

    Scale shape: distinct (doc, gram) pairs first (one exchange, shrinks
    the relation before anything global), gram document-frequency as a
    WINDOW over the gram partition of that same relation (not a
    groupBy + re-join), then a per-doc aggregate. Two exchanges on
    (doc x gram) and gram, one on doc — all corpus-sublinear after the
    distinct. Ratio rounds at 4dp from integer counts (portable)."""
    words = _WORDS.format(col=text)
    grams = (
        df.select(
            F.col(key),
            F.explode(F.expr(_ngram_expr(words, n))).alias("gram"),
        )
        .where(F.col("gram") != "")
        .distinct()
    )
    from pyspark.sql import Window

    dfreq = grams.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    return (
        dfreq.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
        .select(
            F.col(key),
            "n_grams",
            "n_dup",
            F.round(F.col("n_dup").cast("double") / F.col("n_grams"), 4).alias(
                "dup_frac"
            ),
        )
    )


def crossdoc_ngram_overlap_oracle_sql(
    table: str = "documents", key: str = "doc_id", text: str = "text", n: int = XDOC_NGRAM
) -> str:
    w = f"list_filter(string_split(lower(trim(regexp_replace({text}, '\\s+', ' ', 'g'))), ' '), t -> t <> '')"
    joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    grams = (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined}) "
        f"ELSE [] END"
    )
    return f"""
    WITH grams AS (
      SELECT DISTINCT {key}, gram FROM (
        SELECT {key}, unnest({grams}) AS gram
        FROM (SELECT {key}, {w} AS w FROM {table})
      ) WHERE gram <> ''
    ),
    dfreq AS (
      SELECT {key}, gram,
             COUNT(*) OVER (PARTITION BY gram) AS df
      FROM grams
    )
    SELECT {key},
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
             AS dup_frac
    FROM dfreq GROUP BY {key}
    """


# ---------------------------------------------------------------------------
# corpus-wide line dedup (C4/RefinedWeb boilerplate removal)
# ---------------------------------------------------------------------------

LINE_DEDUP_MIN_DOCS = 3


def line_dedup(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    min_docs: int = LINE_DEDUP_MIN_DOCS,
) -> DataFrame:
    """-> (doc_id, kept_lines, removed_lines, content_fp): per document,
    drop every normalized line that occurs in >= ``min_docs`` DISTINCT
    documents corpus-wide — the C4/RefinedWeb web-cleaning rule that
    strips navigation chrome, cookie banners and footers
    (repetition_stats is within-doc; this is the cross-doc line rule).
    ``content_fp`` = md5 of the kept normalized lines joined in original
    order, so the cleaned text is verifiable without shipping it.

    Scale shape: explode to (doc, pos, line) with TINY columns only;
    document frequency over the DISTINCT (doc, line) relation (one
    exchange on the line hash, corpus-sublinear after the distinct);
    the boilerplate set joins back by line key WITHOUT a hard broadcast
    hint — it is data-derived and unbounded, AQE broadcasts it while it
    fits. One final exchange on the doc key."""
    from pyspark.sql import Window

    lines = (
        df.select(
            F.col(key),
            F.posexplode(F.split(F.col(text), "\n")).alias("pos", "line"),
        )
        .select(key, "pos", F.lower(F.trim(F.col("line"))).alias("norm"))
        .where(F.col("norm") != "")
    )
    pairs = lines.select(key, "norm").distinct()
    boiler = (
        pairs.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("norm")))
        .where(F.col("df") >= min_docs)
        .select("norm")
        .distinct()
    )
    marked = lines.join(boiler.withColumn("__bad", F.lit(1)), "norm", "left")
    kept_sorted = F.transform(
        F.filter(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        F.when(F.col("__bad").isNull(), F.col("norm")).alias("n"),
                    )
                )
            ),
            lambda x: x["n"].isNotNull(),
        ),
        lambda x: x["n"],
    )
    return marked.groupBy(key).agg(
        F.sum(F.when(F.col("__bad").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("kept_lines"),
        F.sum(F.when(F.col("__bad").isNull(), 0).otherwise(1))
        .cast("bigint")
        .alias("removed_lines"),
        F.md5(F.array_join(kept_sorted, "\n")).alias("content_fp"),
    )


def line_dedup_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    text: str = "text",
    min_docs: int = LINE_DEDUP_MIN_DOCS,
) -> str:
    return f"""
    WITH lines AS (
      SELECT {key}, e.pos AS pos, lower(trim(e.line)) AS norm
      FROM (
        SELECT {key},
               unnest(list_transform(generate_series(1, len(l)),
                                     i -> {{'pos': i, 'line': l[i]}})) AS e
        FROM (SELECT {key}, string_split({text}, chr(10)) AS l FROM {table})
      )
      WHERE lower(trim(e.line)) <> ''
    ),
    boiler AS (
      SELECT norm, 1 AS bad FROM (SELECT DISTINCT {key}, norm FROM lines)
      GROUP BY norm HAVING count(*) >= {min_docs}
    )
    SELECT {key},
           CAST(sum(CASE WHEN bad IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
           CAST(sum(CASE WHEN bad IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS removed_lines,
           md5(coalesce(string_agg(norm, chr(10) ORDER BY pos)
                          FILTER (WHERE bad IS NULL), '')) AS content_fp
    FROM lines LEFT JOIN boiler USING (norm)
    GROUP BY {key}
    """


# ---------------------------------------------------------------------------
# linear quality classifier (fastText/CCNet-style vocab->weight scoring)
# ---------------------------------------------------------------------------

QC_VOCAB_K = 2048


def hash_weight_model(
    df: DataFrame, key: str = "doc_id", text: str = "text", k: int = QC_VOCAB_K
) -> DataFrame:
    """-> (term, w_micro): a deterministic synthetic linear model over
    the corpus's top-``k`` alphanumeric terms — the stand-in for an
    imported fastText/CCNet quality classifier's (vocab -> weight)
    table when no trained artifact is available. Weights derive only
    from the term string (ascii of first char + length, mixed by small
    primes, centered on 0), so both engines and any rerun agree exactly.

    Scale shape: one token aggregate (map-side combined) + a top-k heap
    (TakeOrdered — distributed, no global window)."""
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text))), "\\s+")).alias("tok")
    ).where(F.col("tok").rlike("^[a-z0-9]+$"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(k)
    )
    w = (
        (F.ascii(F.substring("tok", 1, 1)) * 131 + F.length("tok") * 7919) % 2001
        - 1000
    )
    return vocab.select(F.col("tok").alias("term"), w.cast("bigint").alias("w_micro"))


def linear_quality_score(
    df: DataFrame,
    model: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    threshold_micro: int = 0,
) -> DataFrame:
    """-> (doc_id, n_tokens, n_scored, score_micros, label): score every
    document against a linear (term -> weight) model — the production
    quality-classifier pass CCNet/fastText pipelines run after
    perplexity filtering (unigram_logprob is the LM half of that pair).
    score = sum of w_micro over token OCCURRENCES (missing terms 0);
    label = keep iff score_micros >= threshold_micro * n_tokens (the
    mean-score test cross-multiplied to integers — no float division).

    Scale shape: map-only — the model is vocabulary-top-k BOUNDED
    (<= {QC_VOCAB_K} rows), so the hard broadcast is size-safe; one
    exchange on the doc key for the final aggregate. Zero UDFs."""
    toks = df.select(
        F.col(key),
        F.explode(F.split(F.lower(F.trim(F.col(text))), "\\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    score = F.sum(F.coalesce(F.col("w_micro"), F.lit(0))).cast("bigint")
    n_tokens = F.count(F.lit(1)).cast("bigint")
    return (
        toks.join(F.broadcast(model), toks.tok == model.term, "left")
        .groupBy(key)
        .agg(
            n_tokens.alias("n_tokens"),
            F.count("term").cast("bigint").alias("n_scored"),
            score.alias("score_micros"),
        )
        .select(
            key,
            "n_tokens",
            "n_scored",
            "score_micros",
            F.when(
                F.col("score_micros")
                >= F.lit(threshold_micro) * F.col("n_tokens"),
                F.lit("keep"),
            )
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def linear_quality_score_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    text: str = "text",
    k: int = QC_VOCAB_K,
    threshold_micro: int = 0,
) -> str:
    toks = f"list_filter(string_split_regex(lower(trim({text})), '\\s+'), t -> t <> '')"
    return f"""
    WITH toks AS (
      SELECT {key}, unnest({toks}) AS tok FROM {table}
    ),
    vocab AS (
      SELECT tok AS term, count(*) AS c FROM toks
      WHERE regexp_matches(tok, '^[a-z0-9]+$')
      GROUP BY tok ORDER BY c DESC, term ASC LIMIT {k}
    ),
    model AS (
      SELECT term,
             CAST((ascii(substr(term, 1, 1)) * 131 + length(term) * 7919) % 2001
                  - 1000 AS BIGINT) AS w_micro
      FROM vocab
    )
    SELECT {key},
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(w_micro) AS BIGINT) AS n_scored,
           CAST(sum(coalesce(w_micro, 0)) AS BIGINT) AS score_micros,
           CASE WHEN sum(coalesce(w_micro, 0)) >= {threshold_micro} * count(*)
                THEN 'keep' ELSE 'drop' END AS label
    FROM toks LEFT JOIN model ON tok = term
    GROUP BY {key}
    """
