"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001.
queries()      — named (spark, sf_dir) -> DataFrame callables, one per
                 implemented operator (SURVEY.md §2); registry lives in
                 flink_cdc_spark/contract.py.
oracle_sql()   — equivalent DuckDB SQL per query name.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_cdc_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transform pipeline (projection+filter+changelog materialize)
    over the sf0.001 customer table."""
    return contract.QUERIES["transform_project_filter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
