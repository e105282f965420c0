"""Command-line frontend: ``python -m flink_cdc_spark run pipeline.yaml``.

The Spark rendition of the reference CLI
(flink-cdc-cli/src/main/java/org/apache/flink/cdc/cli/CliFrontend.java and
CliExecutor.java: parse YAML -> compose -> execute), with ``flink-cdc.sh``'s
role played by ``python -m flink_cdc_spark``. The YAML surface is the
reference's (`source, sink, route, transform, pipeline` — parsed by
pipeline/yaml_parser.py); connector `type` strings resolve against the
connectors this engine ships:

sources
  ``parquet``       `path` + `tables` (comma list) read as insert-only
                    changelogs; optional `primary-key.<table>` keys.
  ``values``        canned event suites (values_source.py), `suite:` one of
                    single-split-single-table / single-split-multi-tables /
                    multi-splits-single-table / with-schema-evolution.
  ``wire``          directory of wire-format JSON changelog files
                    (streaming/wire.py) — the streaming entry.
  ``jdbc``          live JDBC endpoint (sources/jdbc_live.py): snapshot
                    chunks + changelog tail through the LW/HW protocol.

sinks
  ``parquet``       materialized current state written per sink table under
                    `path`.
  ``console``       .show() to stdout.
  ``values``        in-memory result only (tests/dry runs).

Batch mode runs the composers; STREAMING + a `wire` source runs the
StructuredStreaming runner with the sink path as its state root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import dataclass, field

from pyspark.sql import SparkSession, functions as F

from .pipeline.definition import PipelineDef
from .pipeline.yaml_parser import parse_pipeline_yaml


@dataclass
class RunSummary:
    mode: str
    tables: dict = field(default_factory=dict)  # sink table -> row count
    sink_paths: dict = field(default_factory=dict)  # sink table -> output path
    result: object = None  # PipelineResult for programmatic callers


def _split_tables(raw) -> list:
    if isinstance(raw, (list, tuple)):
        return [str(t).strip() for t in raw]
    return [t.strip() for t in str(raw).split(",") if t.strip()]


def _parquet_streams(spark: SparkSession, pipeline: PipelineDef):
    from .core.schema import Schema
    from .pipeline.composer import TableStream
    from .core.table_id import TableId
    from .sources.parquet_source import ParquetTableSource

    cfg = pipeline.source.config
    path = cfg.get("path")
    if not path:
        raise SystemExit("source.type=parquet requires 'path'")
    tables = _split_tables(cfg.get("tables", ""))
    if not tables:
        raise SystemExit("source.type=parquet requires 'tables'")
    database = cfg.get("database", "default")
    src = ParquetTableSource(spark, path)
    for table in tables:
        df = src.changelog(table, table_id=f"{database}.{table}")
        pks = _split_tables(cfg.get(f"primary-key.{table}", ""))
        payload = df.schema["after"].dataType
        yield TableStream(
            table_id=TableId.parse(f"{database}.{table}"),
            df=df,
            schema=Schema.from_spark_struct(payload, primary_keys=pks),
            insert_only=True,
        )


_VALUES_SUITES = {
    "single-split-single-table": "single_split_single_table",
    "single-split-multi-tables": "single_split_multi_tables",
    "multi-splits-single-table": "multi_splits_single_table",
    "with-schema-evolution": "suite_with_schema_evolution",
}


def _values_events(pipeline: PipelineDef):
    from .sources import values_source

    suite = str(pipeline.source.config.get("suite", "single-split-single-table"))
    key = suite.lower().replace("_", "-").replace(".", "-")
    if key not in _VALUES_SUITES:
        raise SystemExit(
            f"unknown values suite {suite!r}; one of {sorted(_VALUES_SUITES)}"
        )
    return getattr(values_source, _VALUES_SUITES[key])()


def _write_sink(spark, pipeline: PipelineDef, result, summary: RunSummary) -> None:
    sink_type = pipeline.sink.type.lower()
    for table, df in result.tables.items():
        if sink_type == "parquet":
            root = pipeline.sink.config.get("path")
            if not root:
                raise SystemExit("sink.type=parquet requires 'path'")
            out = os.path.join(root, table.replace("/", "_"))
            df.write.mode("overwrite").parquet(out)
            # row count from what was actually written, not the plan
            summary.tables[table] = spark.read.parquet(out).count()
            summary.sink_paths[table] = out
        elif sink_type == "console":
            print(f"== {table} ==")
            df.show(int(pipeline.sink.config.get("num-rows", 20)), truncate=False)
            summary.tables[table] = df.count()
        elif sink_type == "values":
            summary.tables[table] = df.count()
        elif sink_type in ("jdbc", "oceanbase"):
            from .core.events import CreateTableEvent
            from .core.table_id import TableId
            from .sinks.jdbc_sink import JdbcWarehouseSink

            if sink_type == "oceanbase":
                # MySQL-dialect factory option surface; the write path is
                # the shared warehouse-sink contract (sinks/oceanbase_sink.py)
                from .sinks.oceanbase_sink import (
                    jdbc_url,
                    validate_oceanbase_options,
                )

                try:
                    ob = validate_oceanbase_options(pipeline.sink.config)
                except ValueError as e:
                    raise SystemExit(str(e))
                url = jdbc_url(ob)
            else:
                url = pipeline.sink.config.get("url")
                if not url:
                    raise SystemExit("sink.type=jdbc requires 'url'")
            sink = JdbcWarehouseSink(spark, url)
            tid = TableId.parse(table)
            schema = result.schemas[table].ensure_pk_non_null()
            sink.apply_schema_change(CreateTableEvent(tid, schema))
            sink.write_batch(tid, result.changelogs[table], schema)
            summary.tables[table] = sink.read_table(tid).count()
            summary.sink_paths[table] = url
        elif sink_type in ("doris", "starrocks"):
            # Stream-load sinks: validate the factory option surface, then
            # spool the exact stream-load bodies (no FE/BE is reachable in
            # this environment; 'spool-dir' stands in for the load endpoint).
            cfg = {
                k: v
                for k, v in pipeline.sink.config.items()
                if k != "spool-dir"  # harness-local, not a factory option
            }
            if sink_type == "doris":
                from .sinks.doris_sink import encode_doris, validate_doris_options

                try:
                    opts = validate_doris_options(cfg)
                except ValueError as e:
                    raise SystemExit(str(e))
                encode = lambda env: encode_doris(  # noqa: E731
                    env, label_prefix=opts.label_prefix
                )
            else:
                from .sinks.starrocks_sink import (
                    encode_starrocks,
                    validate_starrocks_options,
                )

                try:
                    validate_starrocks_options(cfg)
                except ValueError as e:
                    raise SystemExit(str(e))
                encode = encode_starrocks
            spool = pipeline.sink.config.get("spool-dir")
            if not spool:
                raise SystemExit(
                    f"sink.type={sink_type}: no FE endpoint is reachable in "
                    "this environment; set 'spool-dir' to write the "
                    "stream-load request bodies"
                )
            records = encode(result.changelogs[table])
            out = os.path.join(spool, table.replace("/", "_"))
            (
                records.orderBy("__seq")
                .select("row")
                .write.mode("overwrite")
                .text(out)
            )
            summary.tables[table] = spark.read.text(out).count()
            summary.sink_paths[table] = out
        elif sink_type == "kafka":
            # Producer-record assembly (topic routing / partitioning /
            # keys / headers / include-schema); no broker is reachable in
            # this environment, so 'spool-dir' stands in for the cluster
            # and records spool as JSON lines per topic.
            from .sinks.kafka_sink import (
                KafkaSinkConfig,
                debezium_connect_schema,
                kafka_producer_records,
            )

            try:
                kcfg = KafkaSinkConfig.from_dict(
                    {k: v for k, v in pipeline.sink.config.items()
                     if k != "spool-dir"}
                )
            except ValueError as e:
                raise SystemExit(str(e))
            spool = pipeline.sink.config.get("spool-dir")
            if not spool:
                raise SystemExit(
                    "sink.type=kafka: no broker is reachable in this "
                    "environment; set 'spool-dir' to write producer records"
                )
            schema = result.schemas[table].ensure_pk_non_null()
            block = (
                debezium_connect_schema(schema)
                if kcfg.include_schema
                else None
            )
            records = kafka_producer_records(
                result.changelogs[table], kcfg, table,
                list(schema.primary_keys), connect_schema_json=block,
            )
            out = os.path.join(spool, table.replace("/", "_"))
            (
                records.orderBy("__offset")
                .select(F.to_json(F.struct("*")).alias("value"))
                .write.mode("overwrite")
                .text(out)
            )
            summary.tables[table] = spark.read.text(out).count()
            summary.sink_paths[table] = out
        elif sink_type == "iceberg":
            # hadoop-catalog convention: catalog.properties.warehouse is
            # the table root (IcebergDataSinkOptions prefix surface)
            from .sinks.iceberg_store import IcebergTableStore

            warehouse = pipeline.sink.config.get(
                "catalog.properties.warehouse"
            ) or pipeline.sink.config.get("path")
            if not warehouse:
                raise SystemExit(
                    "sink.type=iceberg requires 'catalog.properties.warehouse'"
                )
            store = IcebergTableStore(spark, warehouse)
            schema = result.schemas[table].ensure_pk_non_null()
            # partition.key (IcebergDataSinkOptions, same per-table syntax
            # as paimon: 'db.t1:col1,col2;db.t2:col'); a plain comma list
            # with no table prefix applies to every sink table
            from .sinks.lsm_store import parse_partition_keys

            raw_pk = str(pipeline.sink.config.get("partition.key", "") or "")
            if ":" in raw_pk:
                pkeys = tuple(parse_partition_keys(raw_pk).get(table, ()))
            else:
                pkeys = tuple(
                    p.strip() for p in raw_pk.split(",") if p.strip()
                )
            # table.properties. prefix (IcebergDataSinkOptions): stored
            # verbatim in the v2 metadata properties map
            tprops = {
                k[len("table.properties."):]: str(v)
                for k, v in pipeline.sink.config.items()
                if k.startswith("table.properties.")
            }
            store.create_table(
                table,
                schema.to_spark_struct(),
                list(schema.primary_keys),
                partition_keys=pkeys,
                properties=tprops,
            )
            store.commit(table, result.changelogs[table], schema.to_spark_struct())
            # sink.compaction.enabled (IcebergDataSinkOptions): binpack
            # rewrite after the commit; commit.interval applies per
            # streaming commit — the batch CLI has one commit per run
            if str(
                pipeline.sink.config.get("sink.compaction.enabled", "false")
            ).lower() == "true":
                store.compact(table)
            summary.tables[table] = store.read(table).count()
            summary.sink_paths[table] = warehouse
        elif sink_type == "hudi":
            from .sinks.hudi_sink import (
                HudiTableConfig,
                HudiTableStore,
                validate_hudi_options,
            )

            try:
                opts = validate_hudi_options(pipeline.sink.config)
            except ValueError as e:
                raise SystemExit(str(e))
            store = HudiTableStore(spark, opts.path)
            schema = result.schemas[table].ensure_pk_non_null()
            store.create_table(
                table,
                schema.to_spark_struct(),
                HudiTableConfig(
                    list(schema.primary_keys),
                    table_type=opts.table_type,
                    num_buckets=opts.num_buckets,
                    ordering_field=opts.ordering_fields,
                    properties=opts.table_properties,
                ),
            )
            store.upsert(
                table, result.changelogs[table], schema.to_spark_struct()
            )
            summary.tables[table] = store.read(table).count()
            summary.sink_paths[table] = opts.path
        elif sink_type == "paimon":
            # PaimonDataSinkFactory.java:47 (IDENTIFIER = "paimon"): the
            # engine is the LSM merge-on-read store — Paimon's table format
            # IS an LSM tree, so `sink: paimon` binds the factory option
            # surface (PaimonDataSinkOptions.java) onto sinks/lsm_store.py.
            from .sinks.lsm_store import LsmStateStore, validate_paimon_options

            try:
                popts = validate_paimon_options(pipeline.sink.config)
            except ValueError as e:
                raise SystemExit(str(e))
            if not popts["warehouse"]:
                raise SystemExit(
                    "sink.type=paimon: no hive metastore is reachable in this "
                    "environment; set catalog.properties.warehouse (filesystem)"
                )
            store = LsmStateStore(spark, popts["warehouse"])
            schema = result.schemas[table].ensure_pk_non_null()
            store.merge(
                table,
                result.changelogs[table],
                schema.to_spark_struct(),
                list(schema.primary_keys),
                partition_keys=popts["partition_keys"].get(table, ()),
            )
            merged = store.read(table)
            summary.tables[table] = merged.count() if merged is not None else 0
            summary.sink_paths[table] = popts["warehouse"]
        elif sink_type == "elasticsearch":
            # ElasticsearchDataSinkFactory surface; no ES server in this
            # environment, so the exact `_bulk` NDJSON bodies spool to
            # 'spool-dir' (the same stand-in as doris/starrocks/kafka).
            from .sinks.elasticsearch_sink import (
                encode_es_bulk,
                validate_elasticsearch_options,
            )

            cfg = {k: v for k, v in pipeline.sink.config.items() if k != "spool-dir"}
            try:
                eopts = validate_elasticsearch_options(cfg)
            except ValueError as e:
                raise SystemExit(str(e))
            spool = pipeline.sink.config.get("spool-dir")
            if not spool:
                raise SystemExit(
                    "sink.type=elasticsearch: no cluster is reachable in this "
                    "environment; set 'spool-dir' to write the _bulk bodies"
                )
            schema = result.schemas[table].ensure_pk_non_null()
            records = encode_es_bulk(
                result.changelogs[table],
                list(schema.primary_keys),
                sharding_key=eopts["sharding_suffix_keys"].get(table),
                sharding_separator=eopts["sharding_suffix_separator"],
            )
            out = os.path.join(spool, table.replace("/", "_"))
            records.orderBy("__seq").select("bulk").write.mode("overwrite").text(out)
            summary.tables[table] = spark.read.text(out).count()
            summary.sink_paths[table] = out
        elif sink_type == "fluss":
            # FlussDataSinkFactory surface; bucketed log records spool as
            # JSON lines (no Fluss cluster in this environment).
            from .sinks.fluss_sink import encode_fluss, validate_fluss_options

            cfg = {k: v for k, v in pipeline.sink.config.items() if k != "spool-dir"}
            try:
                fopts = validate_fluss_options(cfg)
            except ValueError as e:
                raise SystemExit(str(e))
            spool = pipeline.sink.config.get("spool-dir")
            if not spool:
                raise SystemExit(
                    "sink.type=fluss: no cluster is reachable in this "
                    "environment; set 'spool-dir' to write the log records"
                )
            schema = result.schemas[table].ensure_pk_non_null()
            records = encode_fluss(
                result.changelogs[table],
                list(schema.primary_keys),
                bucket_keys=fopts["bucket_keys"].get(table),
                bucket_num=fopts["bucket_nums"].get(table, 3),
            )
            out = os.path.join(spool, table.replace("/", "_"))
            (
                records.orderBy("__seq")
                .select(F.to_json(F.struct("*")).alias("value"))
                .write.mode("overwrite")
                .text(out)
            )
            summary.tables[table] = spark.read.text(out).count()
            summary.sink_paths[table] = out
        elif sink_type == "maxcompute":
            # MaxComputeDataSinkFactory surface; tunnel-session records
            # spool as JSON lines (no MaxCompute endpoint reachable).
            from .sinks.maxcompute_sink import (
                encode_maxcompute,
                validate_maxcompute_options,
            )

            cfg = {k: v for k, v in pipeline.sink.config.items() if k != "spool-dir"}
            try:
                mopts = validate_maxcompute_options(cfg)
            except ValueError as e:
                raise SystemExit(str(e))
            spool = pipeline.sink.config.get("spool-dir")
            if not spool:
                raise SystemExit(
                    "sink.type=maxcompute: no endpoint is reachable in this "
                    "environment; set 'spool-dir' to write tunnel records"
                )
            schema = result.schemas[table].ensure_pk_non_null()
            records = encode_maxcompute(
                result.changelogs[table],
                list(schema.primary_keys),
                bucket_num=mopts["buckets_num"],
            )
            out = os.path.join(spool, table.replace("/", "_"))
            (
                records.orderBy("__seq")
                .select(F.to_json(F.struct("*")).alias("value"))
                .write.mode("overwrite")
                .text(out)
            )
            summary.tables[table] = spark.read.text(out).count()
            summary.sink_paths[table] = out
        else:
            raise SystemExit(f"unknown sink type {pipeline.sink.type!r}")


def run_pipeline(spark: SparkSession, pipeline: PipelineDef) -> RunSummary:
    """Compose and execute a parsed pipeline definition."""
    from .functions.registry import register_pipeline_udfs

    udf_names = register_pipeline_udfs(spark, pipeline.udfs)
    mode = pipeline.config.runtime_mode
    source_type = pipeline.source.type.lower()

    if mode == "STREAMING" and source_type == "jdbc":
        from .pipeline.cdc_pipeline import MultiTableCdcPipeline

        cfg = pipeline.source.config
        url = cfg.get("url")
        if not url:
            raise SystemExit("source.type=jdbc requires 'url'")
        state_root = pipeline.sink.config.get("path")
        if not state_root:
            raise SystemExit("streaming mode requires sink 'path' (state root)")
        loop = MultiTableCdcPipeline(
            spark,
            url,
            state_root,
            pipeline_def=pipeline,
            tables_selector=cfg.get("tables", r"app.\.*"),
            chunk_size=int(cfg.get("chunk-size", 8096)),
            udf_names=udf_names,
        )
        loop.bootstrap()
        loop.run(
            polls=int(cfg.get("polls", 1)),
            interval_s=float(cfg.get("poll-interval", 0)),
            rescan_new_tables=str(
                cfg.get("scan.newly-added-table.enabled", "false")
            ).lower() == "true",
        )
        summary = RunSummary(mode="STREAMING")
        for target in loop.sink_tables():
            df = loop.current_state(target)
            if df is not None:
                summary.tables[target] = df.count()
                summary.sink_paths[target] = state_root
        return summary

    if mode == "STREAMING" and source_type == "wire":
        from .streaming.runner import StreamingPipelineRunner

        cfg = pipeline.source.config
        src_dir = cfg.get("path")
        if not src_dir:
            raise SystemExit("source.type=wire requires 'path'")
        state_root = pipeline.sink.config.get("path")
        if not state_root:
            raise SystemExit("streaming mode requires sink 'path' (state root)")
        checkpoint = pipeline.sink.config.get(
            "checkpoint", os.path.join(state_root, "_checkpoint")
        )
        runner = StreamingPipelineRunner(
            spark, pipeline, state_root, checkpoint, udf_names=udf_names
        )
        runner.run_available(src_dir, timeout=int(cfg.get("timeout", 300)))
        summary = RunSummary(mode="STREAMING")
        for target in runner.coordinator.evolved_schemas:
            df = runner.state.read(str(target))
            if df is not None:
                summary.tables[str(target)] = df.count()
                summary.sink_paths[str(target)] = runner.state._dir(str(target))
        return summary

    # batch path
    if source_type == "values":
        from .pipeline.composer import EventPipelineComposer

        composer = EventPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.run(_values_events(pipeline))
    elif source_type == "parquet":
        from .pipeline.composer import BatchPipelineComposer

        composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.compose(_parquet_streams(spark, pipeline))
    elif source_type == "jdbc":
        from .sources.jdbc_live import jdbc_streams

        from .pipeline.composer import BatchPipelineComposer

        composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.compose(jdbc_streams(spark, pipeline.source.config))
    elif source_type == "postgres":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.postgres_cdc import postgres_streams

        composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.compose(postgres_streams(spark, pipeline.source.config))
    elif source_type in ("mysql", "oceanbase-cdc"):
        # OceanBaseMySqlTableSourceFactory is an identifier-only subclass
        # of the MySQL factory (OceanBase Binlog Service speaks the MySQL
        # binlog protocol), so `oceanbase-cdc` routes through the MySQL
        # source surface unchanged.
        from .pipeline.composer import BatchPipelineComposer
        from .sources.mysql_source import mysql_streams

        composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.compose(mysql_streams(spark, pipeline.source.config))
    elif source_type == "kafka":
        # consumer-side counterpart of the kafka sink: RecordBatch v2
        # segment logs with debezium/canal JSON replay through the shared
        # codecs (no broker in this environment; topic-dir stands in)
        from .pipeline.composer import BatchPipelineComposer
        from .sources.kafka_source import kafka_streams

        composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
        result = composer.compose(kafka_streams(spark, pipeline.source.config))
    elif source_type == "sqlserver":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.sqlserver_source import sqlserver_streams

        if pipeline.source.config.get("ct-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(
                sqlserver_streams(spark, pipeline.source.config)
            )
        else:
            sqlserver_streams(spark, pipeline.source.config)  # raises
    elif source_type == "oracle":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.oracle_source import oracle_streams

        if pipeline.source.config.get("redo-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(
                oracle_streams(spark, pipeline.source.config)
            )
        else:
            oracle_streams(spark, pipeline.source.config)  # raises
    elif source_type == "mongodb":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.mongodb_source import mongodb_streams

        if pipeline.source.config.get("changestream-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(
                mongodb_streams(spark, pipeline.source.config)
            )
        else:
            list(mongodb_streams(spark, pipeline.source.config))  # raises
    elif source_type == "db2":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.db2_source import db2_streams

        if pipeline.source.config.get("cd-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(db2_streams(spark, pipeline.source.config))
        else:
            db2_streams(spark, pipeline.source.config)  # raises
    elif source_type == "tidb":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.tidb_source import tidb_streams

        if pipeline.source.config.get("kv-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(tidb_streams(spark, pipeline.source.config))
        else:
            tidb_streams(spark, pipeline.source.config)  # raises
    elif source_type == "vitess":
        from .pipeline.composer import BatchPipelineComposer
        from .sources.vitess_source import vitess_streams

        if pipeline.source.config.get("vstream-file"):
            composer = BatchPipelineComposer(spark, pipeline, udf_names=udf_names)
            result = composer.compose(
                vitess_streams(spark, pipeline.source.config)
            )
        else:
            vitess_streams(spark, pipeline.source.config)  # raises
    else:
        raise SystemExit(f"unknown source type {pipeline.source.type!r}")

    summary = RunSummary(mode="BATCH", result=result)
    _write_sink(spark, pipeline, result, summary)
    return summary


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m flink_cdc_spark",
        description="PySpark CDC pipeline runner (flink-cdc YAML surface)",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    run_p = sub.add_parser("run", help="run a pipeline YAML")
    run_p.add_argument("yaml_file")
    run_p.add_argument("--mode", choices=["batch", "streaming"], default=None,
                       help="override pipeline.execution.runtime-mode")
    run_p.add_argument("--json", action="store_true", help="print summary as JSON")
    # CliFrontendOptions surface (flink-cdc-cli/.../CliFrontendOptions.java)
    run_p.add_argument("--global-config", default=None,
                       help="YAML of pipeline-block defaults layered under "
                            "the definition (conf/flink-cdc.yaml analog)")
    run_p.add_argument("-D", dest="defines", action="append", default=[],
                       metavar="key=value",
                       help="Spark session conf override (the reference's "
                            "generic Flink -D options)")
    run_p.add_argument("-s", "--from-savepoint", default=None,
                       help="state root to resume a STREAMING run from "
                            "(overrides the sink state path)")
    run_p.add_argument("--claim-mode", default="NO_CLAIM",
                       choices=["CLAIM", "NO_CLAIM"],
                       help="savepoint ownership on restore; state dirs "
                            "are never deleted here, i.e. NO_CLAIM "
                            "semantics either way")
    run_p.add_argument("--allow-nonRestored-state", action="store_true",
                       help="tolerate state for tables the pipeline no "
                            "longer captures (extra state dirs are "
                            "ignored by construction)")
    val_p = sub.add_parser("validate", help="parse a pipeline YAML and print the plan")
    val_p.add_argument("yaml_file")
    args = parser.parse_args(argv)

    global_defaults = None
    if getattr(args, "global_config", None):
        import yaml as _yaml

        with open(args.global_config) as f:
            loaded = _yaml.safe_load(f) or {}
        # accept either a bare mapping or a {pipeline: {...}} document
        global_defaults = loaded.get("pipeline", loaded)
        if not isinstance(global_defaults, dict):
            raise SystemExit("--global-config must contain a YAML mapping")

    with open(args.yaml_file) as f:
        try:
            pipeline = parse_pipeline_yaml(f.read(), global_config=global_defaults)
        except ValueError as e:
            # definition errors print as the reference CliFrontend does —
            # the message, not a traceback
            raise SystemExit(str(e))

    if args.command == "validate":
        print(f"pipeline: {pipeline.config.name}")
        print(f"  mode: {pipeline.config.runtime_mode}")
        print(f"  source: {pipeline.source.type} {pipeline.source.config}")
        print(f"  sink: {pipeline.sink.type}")
        print(f"  routes: {len(pipeline.routes)}  transforms: {len(pipeline.transforms)}"
              f"  udfs: {len(pipeline.udfs)}")
        return 0

    if args.mode:
        pipeline.config.runtime_mode = args.mode.upper()
    if getattr(args, "from_savepoint", None):
        # resume: the state root IS the savepoint (LSM state + offsets)
        pipeline.sink.config["path"] = args.from_savepoint

    from .session import get_spark

    spark = get_spark(pipeline.config.name or "flink-cdc-spark")
    for define in getattr(args, "defines", []):
        if "=" not in define:
            raise SystemExit(f"-D expects key=value, got {define!r}")
        k, v = define.split("=", 1)
        spark.conf.set(k.strip(), v.strip())
    summary = run_pipeline(spark, pipeline)
    if args.json:
        print(json.dumps({"mode": summary.mode, "tables": summary.tables,
                          "paths": summary.sink_paths}))
    else:
        print(f"[{summary.mode}] pipeline {pipeline.config.name!r} finished:")
        for table, n in sorted(summary.tables.items()):
            loc = summary.sink_paths.get(table, "(in-memory)")
            print(f"  {table}: {n} rows -> {loc}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
