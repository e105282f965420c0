"""Randomized cross-engine differential for the MAP-ONLY text operators:
random documents (not the synthetic corpus) run through the Spark
implementation AND the DuckDB oracle SQL, outputs compared row-for-row.

The contract sweep proves oracle parity on the fixed corpus; this suite
probes the input space around it — empty-ish docs, repeated separators,
punctuation runs, digit soup, long words — where regex/array-function
semantics between engines most plausibly diverge. (Unicode is kept out:
the operators' regex classes are ASCII by construction, and engine
unicode-class semantics are a known, documented non-goal.)
"""

import random
import string

import duckdb
import pytest

from flink_cdc_spark.datapipe import textstats

WORD_ALPHA = string.ascii_lowercase
PUNCT = "!?.,;:#()[]-"


def _random_doc(rng):
    parts = []
    for _ in range(rng.randint(0, 40)):
        choice = rng.random()
        if choice < 0.6:
            parts.append("".join(rng.choice(WORD_ALPHA)
                                 for _ in range(rng.randint(1, 12))))
        elif choice < 0.7:
            parts.append(rng.choice(["the", "a", "of", "and", "to"]))
        elif choice < 0.8:
            parts.append(str(rng.randint(0, 99999)))
        elif choice < 0.9:
            parts.append("".join(rng.choice(PUNCT)
                                 for _ in range(rng.randint(1, 5))))
        else:
            parts.append("x" * rng.randint(20, 60))
    sep = rng.choice([" ", "  ", " \t ", "   "])
    return sep.join(parts) if parts else rng.choice(["", " ", "a"])


@pytest.fixture(scope="module")
def random_docs(spark):
    rng = random.Random(0x5EED)
    rows = [(i, _random_doc(rng)) for i in range(150)]
    # the ops expect the documents-table shape
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )


def _duck(df, sql):
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    return con.execute(sql).fetchall()


def _norm(v):
    if isinstance(v, float):
        return round(v, 4)
    return v


def _compare(spark_df, duck_rows):
    cols = spark_df.columns
    s = sorted(tuple(_norm(x) for x in (getattr(r, c) for c in cols))
               for r in spark_df.collect())
    d = sorted(tuple(_norm(x) for x in row) for row in duck_rows)
    assert s == d, f"first diff: {next(((a, b) for a, b in zip(s, d) if a != b), (len(s), len(d)))}"


def test_gopher_rules_differential(random_docs):
    _compare(
        textstats.gopher_rules(random_docs),
        _duck(random_docs, textstats.gopher_rules_oracle_sql()),
    )


def test_token_stats_differential(random_docs):
    # token_stats divides by counts: drop empty-text docs the same way on
    # both sides (the corpus row never sees them; division semantics on
    # zero differ)
    nonempty = random_docs.where("length(trim(text)) > 0")
    _compare(
        textstats.token_stats(nonempty),
        _duck(nonempty,
              textstats.token_stats_oracle_sql(table="documents")
              ),
    )


def test_fingerprint_differential(random_docs):
    _compare(
        textstats.fingerprint(random_docs),
        _duck(random_docs, textstats.fingerprint_oracle_sql()),
    )


def test_language_id_differential(random_docs):
    _compare(
        textstats.language_id(random_docs),
        _duck(random_docs, textstats.language_id_oracle_sql()),
    )
