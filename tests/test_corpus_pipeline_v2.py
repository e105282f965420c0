"""Named pin for the RETIRED registry row `corpus_training_pipeline_v2`
(r13 capacity policy, VERDICT r12 item 2): the exact-dedup -> chunk ->
epoch-shuffle -> split COMPOSITION still gates against its composite
DuckDB oracle here, so retiring the registry row loses no coverage.
"""

import os

import duckdb
import pytest

from tests.conftest import SF_DIR


def _norm(v):
    import math
    from datetime import date, datetime
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash(columns, rows):
    import hashlib

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def test_corpus_pipeline_v2_composition_matches_oracle(spark):
    from flink_cdc_spark.datapipe.contract_ext import (
        _corpus_pipeline_oracle,
        corpus_training_pipeline_v2,
    )

    result = corpus_training_pipeline_v2(spark, SF_DIR)
    cols = result.columns
    spark_rows = [tuple(r) for r in result.collect()]

    con = duckdb.connect()
    for t in ("documents",):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(_corpus_pipeline_oracle())
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert len(spark_rows) == len(duck_rows) > 0
    assert sorted(c.lower() for c in cols) == sorted(c.lower() for c in duck_cols)
    assert _hash(cols, spark_rows) == _hash(duck_cols, duck_rows)
