"""flink_cdc_spark — a PySpark-native changelog data-integration engine.

A ground-up rebuild of the capabilities of apache/flink-cdc (the reference
engine at /root/reference) on top of Apache Spark: DataFrame/SQL for the
data plane, Structured Streaming + foreachBatch for the streaming plane,
driver-side pure-Python logic for schema evolution and routing.

Layout:
    core/         event model, type system, schema kernel, selectors, router
    expressions/  Flink-CDC SQL dialect -> Spark SQL expression compiler
    operators/    transform (projection/filter over changelogs), partitioning
    sources/      parquet/values changelog sources, JDBC chunked snapshot
    sinks/        materializing sink (ValuesDatabase analog), kafka-json, parquet
    pipeline/     YAML pipeline definition -> composed Spark jobs
    streaming/    Structured Streaming runner with schema-evolution barriers
    functions/    scalar-function parity layer + UDF/model registry
    datapipe/     large-scale training-data ops: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"
