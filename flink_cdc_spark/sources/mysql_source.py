"""MySQL pipeline source surface: dialect, factory options, binlog decode.

The Spark rendition of the reference's flagship connector
(pipeline-connector-mysql/.../MySqlDataSource.java, MySqlDataSourceFactory
.java, MySqlEventDeserializer.java:57-106). No MySQL server (or JDBC
driver) ships in this environment, so the surface splits the way the
reference itself does:

  * **dialect + options** — `MySqlSourceConfig` mirrors the factory's
    option keys (hostname/port/username/password/tables/server-id/
    scan.incremental.snapshot.chunk.size/connection.pool.size/...,
    MySqlDataSourceOptions.java) and adapts onto the engine's generic
    live-JDBC machinery (`to_live_config`): backtick quoting, mysql JDBC
    URL, chunked snapshot waves sized by connection.pool.size. Against a
    reachable server this is the full incremental-snapshot path.
  * **type mapping** — `mysql_type` is the MySqlTypeUtils.fromDbzColumn
    analog keyed by MySQL type names, including the `tinyInt1isBit`
    convention (TINYINT(1) -> BOOLEAN).
  * **binlog event decode** — `MySqlBinlogDecoder` replays a canned
    binlog (JSONL of events in the mysql-binlog-connector shape:
    TABLE_MAP / EXT_WRITE_ROWS / EXT_UPDATE_ROWS / EXT_DELETE_ROWS /
    QUERY / XID, each with its binlog position) into the changelog
    envelope + SchemaChangeEvents — the MySqlEventDeserializer contract:
    row images resolved through the current TABLE_MAP epoch, DDL routed
    through the SQL parser (sources/ddl_parser.py, the
    CustomMySqlAntlrDdlParser analog). Row payloads are parsed
    executor-side in ``mapInPandas``; the driver's control pass only
    inspects TABLE_MAP/QUERY metadata lines (the work Debezium's single
    connector thread does), never row data.

Ordering: binlog position is the total order; the envelope's ``__seq`` is
``(pos << 20) + row_index`` so multi-row events stay ordered and the
distributed file read cannot reorder commits; an event with >= 2^20 rows
fails loudly rather than bleeding into the next position's band.
"""

from __future__ import annotations

import json
import re
from bisect import bisect_right
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core import types as ct
from ..core.table_id import TableId
from .envelope import ENVELOPE_SEQ, OP_DELETE, OP_INSERT, OP_UPDATE
from .jdbc_snapshot import DEFAULT_CHUNK_SIZE, StartupMode

MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"

# row-event kinds (mysql-binlog-connector EventType names)
_WRITE = {"WRITE_ROWS", "EXT_WRITE_ROWS"}
_UPDATE = {"UPDATE_ROWS", "EXT_UPDATE_ROWS"}
_DELETE = {"DELETE_ROWS", "EXT_DELETE_ROWS"}
_CONTROL = ("TABLE_MAP", "QUERY", "ROTATE", "FORMAT_DESCRIPTION")
_ROW_KINDS = _WRITE | _UPDATE | _DELETE

# Rows-within-event band of the __seq total order: a single rows-event may
# carry at most 2^20 rows; beyond that we fail loudly instead of silently
# overflowing into the next binlog position's band.
_SEQ_SHIFT = 20
_SEQ_BAND = 1 << _SEQ_SHIFT


def quote_identifier(name: str) -> str:
    """MySQL quotes identifiers with backticks, escaping embedded ones."""
    return "`" + str(name).replace("`", "``") + "`"


_TYPE_RE = re.compile(r"^\s*([A-Za-z]+)(?:\s+PRECISION)?\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?", re.I)

_MYSQL_TYPE_MAP = {
    "TINYINT": ct.tinyint,
    "SMALLINT": ct.smallint,
    "MEDIUMINT": ct.int_,
    "INT": ct.int_,
    "INTEGER": ct.int_,
    "BIGINT": ct.bigint,
    "FLOAT": ct.float_,
    "DOUBLE": ct.double,
    "REAL": ct.double,
    "BOOLEAN": ct.boolean,
    "BOOL": ct.boolean,
    "DATE": ct.date,
    "TIME": ct.time,
    "DATETIME": ct.timestamp,
    "TIMESTAMP": ct.timestamp,  # MySQL TIMESTAMP is UTC-normalized (_ltz)
    "YEAR": ct.int_,
    "CHAR": ct.string,
    "VARCHAR": ct.string,
    "TINYTEXT": ct.string,
    "TEXT": ct.string,
    "MEDIUMTEXT": ct.string,
    "LONGTEXT": ct.string,
    "ENUM": ct.string,
    "SET": ct.string,
    "JSON": ct.string,
    "BINARY": ct.bytes_,
    "VARBINARY": ct.bytes_,
    "TINYBLOB": ct.bytes_,
    "BLOB": ct.bytes_,
    "MEDIUMBLOB": ct.bytes_,
    "LONGBLOB": ct.bytes_,
    "BIT": ct.boolean,
}


def mysql_type(type_name: str, nullable: bool = True, tinyint1_is_bit: bool = True):
    """MySQL column type/definition text -> CDC type
    (MySqlTypeUtils.fromDbzColumn analog, utils/MySqlTypeUtils.java):
    handles (p[,s]) args, UNSIGNED widening, the TINYINT(1)->BOOLEAN
    convention, and trailing column attributes (NOT NULL,
    AUTO_INCREMENT, ...) as a DDL-parser type hook."""
    m = _TYPE_RE.match(type_name or "")
    if not m:
        t = ct.string()
        return t if nullable else t.not_null()
    base = m.group(1).strip().upper()
    p = int(m.group(2)) if m.group(2) else None
    s = int(m.group(3)) if m.group(3) else 0
    attrs = (type_name or "")[m.end():]
    unsigned = re.search(r"\bUNSIGNED\b", attrs, re.I) is not None
    if re.search(r"\bNOT\s+NULL\b", attrs, re.I):
        nullable = False
    if base in ("DECIMAL", "NUMERIC", "DEC", "FIXED"):
        t = ct.decimal(p or 10, s)
    elif base == "TINYINT" and p == 1 and tinyint1_is_bit and not unsigned:
        t = ct.boolean()
    elif unsigned and base in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER"):
        # unsigned widens one tier (UNSIGNED BIGINT -> DECIMAL(20,0))
        widen = {"TINYINT": ct.smallint, "SMALLINT": ct.int_,
                 "MEDIUMINT": ct.int_, "INT": ct.bigint, "INTEGER": ct.bigint}
        t = widen[base]()
    elif unsigned and base == "BIGINT":
        t = ct.decimal(20, 0)
    else:
        factory = _MYSQL_TYPE_MAP.get(base)
        t = factory() if factory else ct.string()
    return t if nullable else t.not_null()


@dataclass
class MySqlSourceConfig:
    """`type: mysql` options — key names mirror MySqlDataSourceOptions."""

    hostname: str = ""
    port: int = 3306
    username: str = ""
    password: str = ""
    tables: str = r".*.\.*"
    server_id: Optional[str] = None
    server_time_zone: str = "UTC"
    chunk_size: int = DEFAULT_CHUNK_SIZE  # scan.incremental.snapshot.chunk.size
    connection_pool_size: int = 20  # connection.pool.size (default, :125-127)
    startup_mode: StartupMode = StartupMode.INITIAL  # scan.startup.mode
    tinyint1_is_bit: bool = True  # treat-tinyint1-as-boolean.enabled
    include_schema_changes: bool = True
    binlog_file: Optional[str] = None  # offline replay (no server needed)
    # scan.startup.specific-offset.* (MySqlDataSourceOptions.java:135-160)
    specific_offset_file: Optional[str] = None
    specific_offset_pos: Optional[int] = None
    specific_offset_gtid_set: Optional[str] = None
    # metadata.list (MySqlDataSourceOptions METADATA_LIST): connector
    # metadata exposed to transform expressions via the envelope meta map
    metadata_list: tuple = ()

    @classmethod
    def from_dict(cls, config: dict) -> "MySqlSourceConfig":
        return cls(
            hostname=config.get("hostname", ""),
            port=int(config.get("port", 3306)),
            username=config.get("username", ""),
            password=config.get("password", ""),
            tables=config.get("tables", r".*.\.*"),
            server_id=config.get("server-id"),
            server_time_zone=config.get("server-time-zone", "UTC"),
            chunk_size=int(
                config.get("scan.incremental.snapshot.chunk.size", DEFAULT_CHUNK_SIZE)
            ),
            connection_pool_size=int(config.get("connection.pool.size", 20)),
            startup_mode=StartupMode(str(config.get("scan.startup.mode", "initial"))),
            tinyint1_is_bit=str(
                config.get("treat-tinyint1-as-boolean.enabled", "true")
            ).lower() != "false",
            metadata_list=tuple(
                k.strip()
                for k in str(config.get("metadata.list", "") or "").split(",")
                if k.strip()
            ),
            include_schema_changes=str(
                config.get("include-schema-changes", "true")
            ).lower() != "false",
            binlog_file=config.get("binlog-file"),
            specific_offset_file=config.get("scan.startup.specific-offset.file"),
            specific_offset_pos=(
                int(config["scan.startup.specific-offset.pos"])
                if config.get("scan.startup.specific-offset.pos") is not None
                else None
            ),
            specific_offset_gtid_set=config.get(
                "scan.startup.specific-offset.gtid-set"
            ),
        )

    def jdbc_url(self, database: str = "") -> str:
        tz = self.server_time_zone
        return (
            f"jdbc:mysql://{self.hostname}:{self.port}/{database}"
            f"?connectionTimeZone={tz}&useSSL=false"
        )

    def to_live_config(self, database: str, table: str, key_column: str):
        """Adapter onto the generic live-JDBC source: the incremental
        snapshot machinery (chunk waves = connection pool, LW/HW
        bracketing, startup modes) is dialect-independent."""
        from .jdbc_live import JdbcLiveSourceConfig

        return JdbcLiveSourceConfig(
            url=self.jdbc_url(database),
            table=table,
            key_column=key_column,
            table_id=f"{database}.{table}",
            chunk_size=self.chunk_size,
            snapshot_pool=self.connection_pool_size,
            startup_mode=self.startup_mode,
        )


# ---------------------------------------------------------------------------
# binlog replay decode (MySqlEventDeserializer.java:57-106 contract)
# ---------------------------------------------------------------------------


@dataclass
class _TableMapEpoch:
    pos: int
    # binlog table id -> (table_id str, column names, column types)
    tables: Dict[int, Tuple[str, Tuple[str, ...], Tuple[str, ...]]]


class MySqlBinlogDecoder:
    """Replays a canned binlog (JSONL, one event per line, each with its
    binlog `pos`) into SchemaChangeEvents + a changelog envelope."""

    def __init__(
        self,
        spark: SparkSession,
        tinyint1_is_bit: bool = True,
        include_schema_changes: bool = True,
    ):
        self.spark = spark
        self.tinyint1_is_bit = tinyint1_is_bit
        self.include_schema_changes = include_schema_changes

    # -- control pass (driver: metadata lines only, like the connector thread)
    def scan_control(self, path: str):
        """Returns (epochs, ddl_events, schemas): TABLE_MAP epochs keyed by
        position, parsed DDL events, and per-table schemas built from
        CREATE/ALTER DDL in the stream. Row-event lines are skipped by a
        cheap substring test — their payloads are never parsed here."""
        from ..core.schema_evolution import apply_schema_change_event
        from .ddl_parser import parse_ddl

        epochs: List[_TableMapEpoch] = []
        current: Dict[int, Tuple[str, Tuple[str, ...], Tuple[str, ...]]] = {}
        ddl_events = []
        schemas: Dict[str, object] = {}
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                if not any(f'"{t}"' in line for t in _CONTROL):
                    continue  # row event: decoded executor-side
                ev = json.loads(line)
                kind = ev.get("type")
                if kind == "TABLE_MAP":
                    tid = f"{ev['database']}.{ev['table']}"
                    cols = tuple(c["name"] for c in ev["columns"])
                    types = tuple(c.get("type", "TEXT") for c in ev["columns"])
                    current = dict(current)
                    current[int(ev["table_id"])] = (tid, cols, types)
                    epochs.append(_TableMapEpoch(int(ev["pos"]), current))
                elif kind == "QUERY" and self.include_schema_changes:
                    sql = ev.get("sql", "")
                    if not sql or sql.upper().startswith(("BEGIN", "COMMIT")):
                        continue
                    event = parse_ddl(
                        sql,
                        type_parser=lambda t: mysql_type(
                            t, tinyint1_is_bit=self.tinyint1_is_bit
                        ),
                    )
                    if event.table_id.schema_name is None and ev.get("database"):
                        # binlog QUERY events scope unqualified DDL by the
                        # event's database (Debezium's currentDatabase)
                        import dataclasses

                        event = dataclasses.replace(
                            event,
                            table_id=TableId(
                                None, ev["database"], event.table_id.table_name
                            ),
                        )
                    ddl_events.append((int(ev["pos"]), event))
                    key = str(event.table_id)
                    schemas[key] = apply_schema_change_event(
                        schemas.get(key), event
                    )
        return epochs, ddl_events, schemas

    # -- data pass (executors) --------------------------------------------
    def read_envelope(
        self, path: str, table_id: str, payload: T.StructType
    ) -> DataFrame:
        """Row events for one table decoded into the envelope. The file
        scan, JSON parse, TABLE_MAP resolution and image decode all run in
        executors (mapInPandas over spark.read.text); binlog position
        keeps the total order."""
        from ..session import ensure_package_on_executors

        ensure_package_on_executors(self.spark)
        epochs, _, _ = self.scan_control(path)
        epoch_pos = [e.pos for e in epochs]
        epoch_tables = [e.tables for e in epochs]
        names = [f.name for f in payload.fields]
        want = table_id

        def decode(batches):
            import pandas as pd

            def resolve(pos, tbl_id):
                i = bisect_right(epoch_pos, pos) - 1
                if i < 0:
                    return None
                return epoch_tables[i].get(tbl_id)

            for pdf in batches:
                out = []
                for line in pdf["value"]:
                    # Control-vs-row is decided from the parsed event type, not
                    # a substring test: a row payload containing e.g. "QUERY"
                    # would otherwise be silently dropped.
                    ev = json.loads(line)
                    kind = ev.get("type")
                    if kind not in _ROW_KINDS:
                        continue
                    pos = int(ev["pos"])
                    mapped = resolve(pos, int(ev.get("table_id", -1)))
                    if mapped is None or mapped[0] != want:
                        continue
                    _, cols, _types = mapped

                    def obj(values):
                        return json.dumps(dict(zip(cols, values)), default=str)

                    if len(ev["rows"]) >= _SEQ_BAND:
                        raise ValueError(
                            f"rows-event at pos {pos} carries "
                            f"{len(ev['rows'])} rows (>= {_SEQ_BAND}); "
                            "__seq band would overflow"
                        )
                    base = pos << _SEQ_SHIFT
                    ts_s = int(ev.get("ts", 0))
                    if kind in _WRITE:
                        for i, row in enumerate(ev["rows"]):
                            out.append((base + i, OP_INSERT, None, obj(row), ts_s))
                    elif kind in _DELETE:
                        for i, row in enumerate(ev["rows"]):
                            out.append((base + i, OP_DELETE, obj(row), None, ts_s))
                    else:
                        for i, pair in enumerate(ev["rows"]):
                            out.append(
                                (
                                    base + i,
                                    OP_UPDATE,
                                    obj(pair["before"]),
                                    obj(pair["after"]),
                                    ts_s,
                                )
                            )
                yield pd.DataFrame(
                    out, columns=["seq", "op", "before_json", "after_json", "ts_sec"]
                )

        raw = self.spark.read.text(path)
        dec = raw.mapInPandas(
            decode,
            schema="seq LONG, op STRING, before_json STRING, after_json STRING, ts_sec LONG",
        )
        str_payload = T.StructType(
            [T.StructField(n, T.StringType(), True) for n in names]
        )
        parsed = dec.withColumn(
            "__b", F.from_json("before_json", str_payload)
        ).withColumn("__a", F.from_json("after_json", str_payload))
        cast_struct = lambda side: F.when(
            F.col(side).isNotNull(),
            F.struct(
                *[
                    F.col(f"{side}.{f.name}").cast(f.dataType).alias(f.name)
                    for f in payload.fields
                ]
            ),
        )
        return parsed.select(
            F.lit(table_id).alias("__table_id"),
            F.col("op").alias("__op"),
            cast_struct("__b").alias("before"),
            cast_struct("__a").alias("after"),
            F.create_map(
                F.lit("op_ts"), (F.col("ts_sec") * 1000).cast("string")
            ).alias("__meta"),
            F.col("seq").alias("__seq"),
        )


class MySqlBinaryBinlogDecoder:
    """Decoder over REAL v4 binlog wire bytes (mysql_binlog_wire.py):
    same control/data split as the JSONL decoder — control events parse
    driver-side (the connector-thread analog), row events decode
    executor-side with one task per binlog segment FILE (how MySQL itself
    shards the log: segments rotate at max_binlog_size, so a day of
    changes is many files and per-file parallelism is the natural unit)."""

    def __init__(
        self,
        spark: SparkSession,
        tinyint1_is_bit: bool = True,
        include_schema_changes: bool = True,
    ):
        self.spark = spark
        self.tinyint1_is_bit = tinyint1_is_bit
        self.include_schema_changes = include_schema_changes

    @staticmethod
    def _segment_files(path: str):
        import glob as _glob

        files = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
        if len(files) >= 1 << 13:
            raise ValueError(
                f"{len(files)} binlog segments exceed the ordinal band"
            )
        return files

    def _parse_control(self, path: str):
        from .mysql_binlog_wire import parse_binlog_bytes, resolve_table_maps

        events = []
        for idx, f in enumerate(self._segment_files(path)):
            with open(f, "rb") as fh:
                # segment ordinal << 30 globalizes positions (a segment is
                # capped at 1 GiB, MySQL's max_binlog_size ceiling)
                events.extend(parse_binlog_bytes(fh.read(), base_pos=idx << 30))
        resolved, schemas = resolve_table_maps(events)
        return resolved, schemas

    def scan_control(self, path: str):
        """(epochs, ddl_events, schemas) — TABLE_MAP epochs with
        DDL-resolved column names, exactly the JSONL decoder's shape."""
        from ..core.schema_evolution import apply_schema_change_event
        from .ddl_parser import parse_ddl

        resolved, _ = self._parse_control(path)
        epochs: List[_TableMapEpoch] = []
        current: Dict[int, Tuple[str, Tuple[str, ...], Tuple[str, ...]]] = {}
        ddl_events = []
        schemas: Dict[str, object] = {}
        for ev in resolved:
            kind = ev.get("type")
            if kind == "TABLE_MAP":
                tid = f"{ev['database']}.{ev['table']}"
                cols = tuple(c["name"] for c in ev["columns"])
                types = tuple(c.get("type", "TEXT") for c in ev["columns"])
                current = dict(current)
                current[int(ev["table_id"])] = (tid, cols, types)
                epochs.append(_TableMapEpoch(int(ev["pos"]), current))
            elif kind == "QUERY" and self.include_schema_changes:
                sql = ev.get("sql", "")
                if not sql or sql.upper().startswith(("BEGIN", "COMMIT")):
                    continue
                event = parse_ddl(
                    sql,
                    type_parser=lambda t: mysql_type(
                        t, tinyint1_is_bit=self.tinyint1_is_bit
                    ),
                )
                if event.table_id.schema_name is None and ev.get("database"):
                    import dataclasses

                    event = dataclasses.replace(
                        event,
                        table_id=TableId(
                            None, ev["database"], event.table_id.table_name
                        ),
                    )
                ddl_events.append((int(ev["pos"]), event))
                key = str(event.table_id)
                schemas[key] = apply_schema_change_event(schemas.get(key), event)
        return epochs, ddl_events, schemas

    def read_envelope(
        self, path: str, table_id: str, payload: T.StructType,
        start_gtid_set: Optional[str] = None,
    ) -> DataFrame:
        """Row events for one table decoded into the envelope: binaryFile
        scan (one partition per segment file) -> mapInPandas parsing the
        wire bytes in executors -> typed envelope. __seq = (event end
        position << 20) + row index, the same total order the JSONL
        decoder uses.

        ``start_gtid_set`` implements `scan.startup.specific-offset.
        gtid-set` (MySqlDataSourceOptions.java:147): transactions whose
        GTID_LOG_EVENT the set already contains are skipped whole. The
        per-file sequential parse carries the current-transaction flag —
        sound because MySQL rotates segments only at transaction
        boundaries, so a transaction never straddles files."""
        from ..session import ensure_package_on_executors

        import os as _os

        ensure_package_on_executors(self.spark)
        gtid_filter = start_gtid_set
        epochs, _, _ = self.scan_control(path)
        epoch_pos = [e.pos for e in epochs]
        epoch_tables = [e.tables for e in epochs]
        names = [f.name for f in payload.fields]
        want = table_id
        # basename -> globalized base position (same ordinals as scan)
        base_by_name = {
            _os.path.basename(f): idx << 30
            for idx, f in enumerate(self._segment_files(path))
        }

        def decode(batches):
            import os
            import pandas as pd

            from flink_cdc_spark.sources.gtid import GtidSet
            from flink_cdc_spark.sources.mysql_binlog_wire import (
                parse_binlog_bytes,
            )

            skip_set = GtidSet.parse(gtid_filter) if gtid_filter else None

            def resolve(pos, tbl_id):
                i = bisect_right(epoch_pos, pos) - 1
                if i < 0:
                    return None
                return epoch_tables[i].get(tbl_id)

            for pdf in batches:
                out = []
                for fpath, content in zip(pdf["path"], pdf["content"]):
                    base = base_by_name[os.path.basename(str(fpath))]
                    skipping_txn = False
                    for ev in parse_binlog_bytes(bytes(content), base_pos=base):
                        kind = ev.get("type")
                        if kind == "GTID" and skip_set is not None:
                            skipping_txn = skip_set.contains(
                                ev["sid"], int(ev["gno"])
                            )
                            continue
                        if kind not in _ROW_KINDS:
                            continue
                        if skipping_txn:
                            continue
                        pos = int(ev["pos"])
                        mapped = resolve(pos, int(ev.get("table_id", -1)))
                        if mapped is None or mapped[0] != want:
                            continue
                        _, cols, _types = mapped

                        def obj(values):
                            return json.dumps(dict(zip(cols, values)), default=str)

                        if len(ev["rows"]) >= _SEQ_BAND:
                            raise ValueError(
                                f"rows-event at pos {pos} carries "
                                f"{len(ev['rows'])} rows (>= {_SEQ_BAND}); "
                                "__seq band would overflow"
                            )
                        base = pos << _SEQ_SHIFT
                        ts_s = int(ev.get("ts", 0))
                        if kind in _WRITE:
                            for i, row in enumerate(ev["rows"]):
                                out.append((base + i, OP_INSERT, None, obj(row), ts_s))
                        elif kind in _DELETE:
                            for i, row in enumerate(ev["rows"]):
                                out.append((base + i, OP_DELETE, obj(row), None, ts_s))
                        else:
                            for i, pair in enumerate(ev["rows"]):
                                out.append(
                                    (
                                        base + i,
                                        OP_UPDATE,
                                        obj(pair["before"]),
                                        obj(pair["after"]),
                                        ts_s,
                                    )
                                )
                yield pd.DataFrame(
                    out, columns=["seq", "op", "before_json", "after_json", "ts_sec"]
                )

        raw = self.spark.read.format("binaryFile").load(path).select("path", "content")
        dec = raw.mapInPandas(
            decode,
            schema="seq LONG, op STRING, before_json STRING, after_json STRING, ts_sec LONG",
        )
        str_payload = T.StructType(
            [T.StructField(n, T.StringType(), True) for n in names]
        )
        parsed = dec.withColumn(
            "__b", F.from_json("before_json", str_payload)
        ).withColumn("__a", F.from_json("after_json", str_payload))
        cast_struct = lambda side: F.when(
            F.col(side).isNotNull(),
            F.struct(
                *[
                    F.col(f"{side}.{f.name}").cast(f.dataType).alias(f.name)
                    for f in payload.fields
                ]
            ),
        )
        return parsed.select(
            F.lit(table_id).alias("__table_id"),
            F.col("op").alias("__op"),
            cast_struct("__b").alias("before"),
            cast_struct("__a").alias("after"),
            F.create_map(
                F.lit("op_ts"), (F.col("ts_sec") * 1000).cast("string")
            ).alias("__meta"),
            F.col("seq").alias("__seq"),
        )


# ---------------------------------------------------------------------------
# CLI integration: source.type=mysql
# ---------------------------------------------------------------------------


def mysql_streams(spark: SparkSession, config: dict):
    """CLI resolver. `binlog-file` runs the offline replay (schemas from
    in-stream CREATE TABLE DDL); `hostname` adapts onto the live JDBC
    incremental-snapshot machinery — which needs the MySQL JDBC driver on
    the Spark classpath and a reachable server, neither of which exists in
    this sandbox, so that branch fails fast with a clear message."""
    from ..core.selectors import Selectors
    from ..pipeline.composer import TableStream

    cfg = MySqlSourceConfig.from_dict(config)
    unsupported_meta = [k for k in cfg.metadata_list if k != "op_ts"]
    if unsupported_meta:
        raise SystemExit(
            f"source.type=mysql: metadata.list keys {unsupported_meta} not "
            "supported; available: op_ts (binlog header timestamp, millis)"
        )
    if cfg.binlog_file:
        # auto-detect the wire format: real v4 binary segments start with
        # the \xfebin magic; otherwise the JSONL replay shape
        probe = cfg.binlog_file
        if any(ch in probe for ch in "*?["):
            import glob as _glob

            matches = sorted(_glob.glob(probe))
            probe = matches[0] if matches else probe
        is_binary = False
        try:
            with open(probe, "rb") as fh:
                is_binary = fh.read(4) == b"\xfebin"
        except OSError:
            pass
        decoder_cls = MySqlBinaryBinlogDecoder if is_binary else MySqlBinlogDecoder
        decoder = decoder_cls(
            spark,
            tinyint1_is_bit=cfg.tinyint1_is_bit,
            include_schema_changes=cfg.include_schema_changes,
        )
        _, _, schemas = decoder.scan_control(cfg.binlog_file)
        sel = Selectors(cfg.tables)
        gtid_set = None
        start_seq = None
        if (
            cfg.startup_mode == StartupMode.SPECIFIC_OFFSETS
            and cfg.specific_offset_gtid_set
        ):
            if not is_binary:
                raise SystemExit(
                    "scan.startup.specific-offset.gtid-set needs binary "
                    "binlog segments (GTID_LOG_EVENTs); the JSONL replay "
                    "shape carries no GTIDs"
                )
            gtid_set = cfg.specific_offset_gtid_set
        elif cfg.startup_mode == StartupMode.SPECIFIC_OFFSETS and (
            cfg.specific_offset_file is not None
            or cfg.specific_offset_pos is not None
        ):
            # scan.startup.specific-offset.file/.pos
            # (MySqlDataSourceOptions.java:135-146): resume AT the offset —
            # events that END at or before it were already delivered, so
            # only events ending past it replay. Positions are globalized
            # per segment ordinal (idx << 30 + in-file pos), the same
            # coordinates read_envelope assigns, so the filter honors
            # segment order across a rotated chain.
            pos = cfg.specific_offset_pos or 0
            if is_binary:
                import os as _os

                segs = [
                    _os.path.basename(f)
                    for f in decoder._segment_files(cfg.binlog_file)
                ]
                if cfg.specific_offset_file is None:
                    raise SystemExit(
                        "scan.startup.specific-offset.pos needs "
                        "scan.startup.specific-offset.file"
                    )
                if cfg.specific_offset_file not in segs:
                    raise SystemExit(
                        f"scan.startup.specific-offset.file "
                        f"{cfg.specific_offset_file!r} is not a segment of "
                        f"{cfg.binlog_file!r} (have: {', '.join(segs)})"
                    )
                global_pos = (segs.index(cfg.specific_offset_file) << 30) + pos
            else:
                import os as _os

                if cfg.specific_offset_file is not None and (
                    cfg.specific_offset_file != _os.path.basename(cfg.binlog_file)
                ):
                    raise SystemExit(
                        f"scan.startup.specific-offset.file "
                        f"{cfg.specific_offset_file!r} does not match the "
                        f"replay file {cfg.binlog_file!r}"
                    )
                global_pos = pos
            start_seq = (global_pos + 1) << _SEQ_SHIFT
        for tid_str, schema in sorted(schemas.items()):
            tid = TableId.parse(tid_str)
            if not sel.is_match(tid):
                continue
            if gtid_set is not None:
                env = decoder.read_envelope(
                    cfg.binlog_file, tid_str, schema.to_spark_struct(),
                    start_gtid_set=gtid_set,
                )
            else:
                env = decoder.read_envelope(
                    cfg.binlog_file, tid_str, schema.to_spark_struct()
                )
            if start_seq is not None:
                env = env.where(F.col(ENVELOPE_SEQ) >= start_seq)
            yield TableStream(
                table_id=tid, df=env, schema=schema, insert_only=False
            )
        return
    if not cfg.hostname:
        raise SystemExit(
            "source.type=mysql requires 'hostname' (live) or 'binlog-file' (replay)"
        )
    raise SystemExit(
        "source.type=mysql live mode needs the MySQL JDBC driver "
        f"({MYSQL_DRIVER}) on the Spark classpath and a reachable server at "
        f"{cfg.jdbc_url()}; neither ships in this environment. "
        "Use 'binlog-file' for offline replay."
    )
