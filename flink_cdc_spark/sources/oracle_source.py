"""Oracle pipeline source surface: dialect, options, LogMiner-shape decode.

The Spark rendition of the reference's Oracle connector
(pipeline-connector-oracle/.../OracleDataSource.java,
OracleDataSourceOptions.java, OracleEventDeserializer.java,
OracleTypeUtils.java). No Oracle server (or driver) ships here; the live
branch adapts onto the generic incremental-snapshot machinery and fails
fast, the dialect pieces are real:

  * ``oracle_type`` — OracleTypeUtils.fromDbzColumn analog, including the
    NUMBER(p, s) resolution rules Debezium applies (scale 0 narrows by
    precision; negative scale rounds into integers).
  * ``decode_logminer_records`` — the reference's deserializer consumes
    Debezium SourceRecords built from V$LOGMNR_CONTENTS; the wire shape of
    those records IS debezium-json, which this engine already decodes
    (sources/kafka_json.decode_debezium_json). This wrapper stamps
    SCN-derived sequence ordering on top.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core import types as ct
from .jdbc_snapshot import DEFAULT_CHUNK_SIZE, StartupMode

ORACLE_DRIVER = "oracle.jdbc.OracleDriver"

_ORACLE_TYPE_MAP = {
    "char": ct.string,
    "nchar": ct.string,
    "varchar": ct.string,
    "varchar2": ct.string,
    "nvarchar2": ct.string,
    "clob": ct.string,
    "nclob": ct.string,
    "long": ct.string,
    "xmltype": ct.string,
    "blob": ct.bytes_,
    "raw": ct.bytes_,
    "long raw": ct.bytes_,
    "binary_float": ct.float_,
    "binary_double": ct.double,
    "float": ct.double,
    "date": ct.timestamp,  # Oracle DATE carries time-of-day
    "boolean": ct.boolean,
}


def oracle_type(
    type_name: str,
    precision: Optional[int] = None,
    scale: Optional[int] = None,
    nullable: bool = True,
):
    """Oracle type -> CDC type (OracleTypeUtils.fromDbzColumn analog).
    NUMBER resolution follows Debezium's OracleValueConverters: explicit
    scale > 0 -> DECIMAL(p, s); scale 0 (or negative, which Oracle rounds
    into integer digits) narrows by precision to INT/BIGINT/DECIMAL."""
    name = (type_name or "").strip().lower().split("(", 1)[0]
    if name in ("number", "numeric", "decimal"):
        p = precision if precision and precision > 0 else 38
        s = scale if scale is not None else 0
        if s > 0:
            t = ct.decimal(p, s)
        else:
            digits = p - s  # negative scale adds integer digits
            if digits < 10:
                t = ct.int_()
            elif digits < 19:
                t = ct.bigint()
            else:
                t = ct.decimal(min(digits, 38), 0)
    elif name.startswith("timestamp"):
        t = ct.timestamp()
    elif name.startswith("interval"):
        t = ct.string()  # intervals surface as strings on Spark
    else:
        factory = _ORACLE_TYPE_MAP.get(name)
        t = factory() if factory else ct.string()
    return t if nullable else t.not_null()


@dataclass
class OracleSourceConfig:
    """`type: oracle` options (OracleDataSourceOptions key names)."""

    hostname: str = ""
    port: int = 1521
    username: str = ""
    password: str = ""
    database: str = ""
    tables: str = r".*.\.*"
    jdbc_url_override: Optional[str] = None  # jdbc.url
    server_time_zone: str = "UTC"
    chunk_size: int = DEFAULT_CHUNK_SIZE
    connection_pool_size: int = 20
    startup_mode: StartupMode = StartupMode.INITIAL

    @classmethod
    def from_dict(cls, config: dict) -> "OracleSourceConfig":
        return cls(
            hostname=config.get("hostname", ""),
            port=int(config.get("port", 1521)),
            username=config.get("username", ""),
            password=config.get("password", ""),
            database=config.get("database", ""),
            tables=config.get("tables", r".*.\.*"),
            jdbc_url_override=config.get("jdbc.url"),
            server_time_zone=config.get("server-time-zone", "UTC"),
            chunk_size=int(
                config.get("scan.incremental.snapshot.chunk.size", DEFAULT_CHUNK_SIZE)
            ),
            connection_pool_size=int(config.get("connection.pool.size", 20)),
            startup_mode=StartupMode(str(config.get("scan.startup.mode", "initial"))),
        )

    def jdbc_url(self) -> str:
        if self.jdbc_url_override:
            return self.jdbc_url_override
        return f"jdbc:oracle:thin:@{self.hostname}:{self.port}:{self.database}"

    def to_live_config(self, schema: str, table: str, key_column: str):
        from .jdbc_live import JdbcLiveSourceConfig

        return JdbcLiveSourceConfig(
            url=self.jdbc_url(),
            table=table,
            key_column=key_column,
            table_id=f"{schema}.{table}",
            chunk_size=self.chunk_size,
            snapshot_pool=self.connection_pool_size,
            startup_mode=self.startup_mode,
        )


def decode_logminer_records(
    records: DataFrame, payload: T.StructType
) -> DataFrame:
    """Debezium-json records (the LogMiner event wire shape) -> envelope,
    ordered by SCN from the debezium source block. ``records`` needs a
    `value` JSON string column whose payload carries source.scn."""
    from .kafka_json import decode_debezium_json

    scn = F.get_json_object(F.col("value"), "$.source.scn").cast("long")
    recs = records.withColumn("__scn_seq", scn)
    return decode_debezium_json(recs, payload, offset_col="__scn_seq")


def oracle_streams(spark: SparkSession, config: dict):
    """CLI resolver for `type: oracle`. `redo-file` (text, one
    LogMiner-shape debezium-json record per line) runs the offline
    replay — the payload schema is inferred from the records' after/
    before images; live mode needs the Oracle JDBC driver and a
    reachable listener, neither of which ships here."""
    cfg = OracleSourceConfig.from_dict(config)
    redo_file = config.get("redo-file")
    if redo_file:
        from ..core.schema import Schema
        from ..core.table_id import TableId
        from ..pipeline.composer import TableStream

        raw = spark.read.text(redo_file).withColumnRenamed("value", "value")
        # .rdd = the PySpark spelling of the Dataset[String] JSON-
        # inference API — a one-off control-plane schema pass, not a
        # data-plane RDD op
        inferred = spark.read.json(raw.rdd.map(lambda r: r["value"]))
        after_t = dict(
            (f.name, f.dataType) for f in inferred.schema.fields
        ).get("after")
        if after_t is None:
            raise SystemExit(
                "redo-file records carry no 'after' images to infer from"
            )
        payload = T.StructType(sorted(after_t.fields, key=lambda f: f.name))
        table_id = config.get("table-id", "ORCL.TABLE")
        pks = tuple(
            k.strip() for k in str(config.get("primary-key", "")).split(",")
            if k.strip()
        )
        env = decode_logminer_records(raw, payload)
        schema = Schema.from_spark_struct(payload, primary_keys=pks)
        return [TableStream(
            table_id=TableId.parse(table_id), df=env, schema=schema,
            insert_only=False,
        )]
    if not cfg.hostname and not cfg.jdbc_url_override:
        raise SystemExit(
            "source.type=oracle requires 'hostname'/'jdbc.url' (live) or "
            "'redo-file' (offline replay)"
        )
    raise SystemExit(
        "source.type=oracle live mode needs the Oracle JDBC driver "
        f"({ORACLE_DRIVER}) on the Spark classpath and a reachable listener "
        f"at {cfg.jdbc_url()}; neither ships in this environment. The "
        "LogMiner-shape decoder (decode_logminer_records) is available for "
        "offline use."
    )
