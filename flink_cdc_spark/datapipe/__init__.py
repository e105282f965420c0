"""Training-data pipeline operators (SURVEY.md §7 phase 6).

The reference engine (apache/flink-cdc) ships no dedup / similarity /
text-analysis operators; these extend the rebuilt engine for large-scale
LLM-training-data workloads. Design rules:

- Everything is built from built-in ``pyspark.sql.functions`` (JVM-side,
  whole-stage codegen); no Python row-at-a-time UDFs in any hot path.
- Every content hash is md5 (identical across engines) so a DuckDB oracle
  can reproduce results bit-for-bit.
- Pairwise ops ship two plans: the *scale path* (inverted-index /
  banded-LSH joins that shuffle on content keys and never cross-join)
  used by the Spark implementation, and the naive quadratic equivalent
  used only by the correctness oracle. Both produce identical rows.
"""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
