"""Live JDBC database source, end-to-end: schema discovery, trigger-based
changelog capture, chunked-parallel snapshot reads, LW/HW hybrid handoff.

The Spark rendition of the reference's database pipeline source
(pipeline-connector-mysql/.../MySqlDataSource.java): what MySQL+binlog+
Debezium provide there is provided here by any JDBC database with triggers —
the test/reference endpoint is Apache Derby embedded, whose JDBC driver
ships inside Spark's own jars (derby-*.jar, pulled in for the Hive
metastore), so the engine talks to a *real* SQL database with zero extra
dependencies:

  * **schema discovery** — JDBC ``DatabaseMetaData.getColumns`` /
    ``getPrimaryKeys`` -> CDC ``Schema`` + ``CreateTableEvent``; the
    analog of MySqlSchemaUtils.getTableSchema
    (pipeline-connector-mysql/.../MySqlSchemaUtils.java) with
    ``java.sql.Types`` codes standing in for MySQL type names
    (utils/MySqlTypeUtils.java).
  * **table discovery** — ``DatabaseMetaData.getTables`` filtered by the
    engine's Selectors; the analog of JdbcTableDiscoverer
    (common/source/discover/JdbcTableDiscoverer.java).
  * **changelog capture** — per-table AFTER INSERT/UPDATE/DELETE row
    triggers appending (op, before-image, after-image) to a
    ``<table>__CDCLOG`` table with a monotone IDENTITY sequence: the
    binlog analog, readable by offset exactly like
    MySqlEventDeserializer.java:57-106 reads binlog events. Trigger-based
    capture is a standard CDC technique for engines without a readable
    log.
  * **snapshot** — chunk boundaries from jdbc_snapshot.plan_chunks (the
    JdbcSourceChunkSplitter math) fed to ``spark.read.jdbc(predicates=...)``
    — one real parallel JDBC partition per chunk.
  * **handoff** — per-chunk LW/HW watermarks from the log sequence, chunk
    materialized *between* the two reads, then
    snapshot_backfill.snapshot_with_tail merges chunks + filtered tail
    (AbstractScanFetchTask.java:55-116 protocol).
  * **startup modes** — StartupMode drives which of snapshot/tail runs and
    the tail's starting offset (flink-connector-mysql-cdc StartupMode.java
    -> assigner selection).

Scale: the driver-side JDBC work is control-plane only (metadata, MIN/MAX/
COUNT probes, watermark reads); all row data moves through executor-side
``spark.read.jdbc`` partitions. Chunk count grows with table size, so a
1000-executor cluster reads 1000 chunks concurrently — the database, not
Spark, is the bottleneck, exactly as with the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core import types as ct
from ..core.schema import Column, Schema
from ..core.selectors import Selectors
from ..core.table_id import TableId
from ..core.events import CreateTableEvent
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
)
from .jdbc_snapshot import (
    DEFAULT_CHUNK_SIZE,
    StartupMode,
    chunk_predicates,
    plan_chunks,
)
from .snapshot_backfill import ChunkWatermarks, snapshot_with_tail

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
LOG_SUFFIX = "__CDCLOG"

# java.sql.Types codes -> CDC types (JDBC spec constants; the stand-in for
# MySqlTypeUtils.fromDbzColumn's name-keyed mapping)
_JDBC_TYPE_MAP = {
    -7: ct.boolean,  # BIT
    16: ct.boolean,  # BOOLEAN
    -6: ct.tinyint,  # TINYINT
    5: ct.smallint,  # SMALLINT
    4: ct.int_,  # INTEGER
    -5: ct.bigint,  # BIGINT
    6: ct.float_,  # FLOAT
    7: ct.float_,  # REAL
    8: ct.double,  # DOUBLE
    91: ct.date,  # DATE
    92: ct.time,  # TIME
    93: ct.timestamp,  # TIMESTAMP
    2004: ct.bytes_,  # BLOB
    -2: ct.bytes_,  # BINARY
    -3: ct.bytes_,  # VARBINARY
}


def _cdc_type(jdbc_code: int, precision: int, scale: int, nullable: bool):
    if jdbc_code in (2, 3):  # NUMERIC, DECIMAL
        t = ct.decimal(precision or 10, scale or 0)
    elif jdbc_code in (1, 12, 2005, -1, -9, -15, -16):  # CHAR/VARCHAR/CLOB/...
        t = ct.string()
    else:
        factory = _JDBC_TYPE_MAP.get(jdbc_code)
        t = factory() if factory else ct.string()
    return t if nullable else t.not_null()


class JdbcEndpoint:
    """Control-plane JDBC access through the Spark JVM (py4j) — metadata,
    DDL/DML execution, small probe queries. Row data never flows through
    here; that is spark.read.jdbc's job."""

    def __init__(self, spark: SparkSession, url: str):
        self.spark = spark
        self.url = url
        jvm = spark.sparkContext._jvm
        # keep Derby's log out of the repo cwd
        jvm.java.lang.System.setProperty(
            "derby.stream.error.file", "/tmp/derby_spark.log"
        )
        self._jvm = jvm
        self._conn = jvm.java.sql.DriverManager.getConnection(url)

    # -- DDL/DML -----------------------------------------------------------
    def execute(self, sql: str) -> None:
        st = self._conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def execute_update(self, sql: str) -> int:
        st = self._conn.createStatement()
        try:
            return st.executeUpdate(sql)
        finally:
            st.close()

    def insert_rows(self, table: str, columns: Sequence[str], rows) -> int:
        """Batched PreparedStatement insert (control-plane fixture loading)."""
        placeholders = ", ".join("?" for _ in columns)
        ps = self._conn.prepareStatement(
            f"INSERT INTO {table} ({', '.join(columns)}) VALUES ({placeholders})"
        )
        n = 0
        try:
            for row in rows:
                for i, v in enumerate(row, start=1):
                    if v is None:
                        ps.setNull(i, 12)
                    elif isinstance(v, bool):
                        ps.setBoolean(i, v)
                    elif isinstance(v, int):
                        ps.setLong(i, v)
                    elif isinstance(v, float):
                        ps.setDouble(i, v)
                    else:
                        ps.setString(i, str(v))
                ps.addBatch()
                n += 1
                if n % 1000 == 0:
                    ps.executeBatch()
            ps.executeBatch()
        finally:
            ps.close()
        return n

    def transaction(self, sqls: Sequence[str]) -> None:
        """Execute several statements in ONE database transaction (used by
        the warehouse sink to make MERGE + commit-ledger atomic)."""
        self._conn.setAutoCommit(False)
        try:
            st = self._conn.createStatement()
            try:
                for sql in sqls:
                    st.execute(sql)
            finally:
                st.close()
            self._conn.commit()
        except Exception:
            self._conn.rollback()
            raise
        finally:
            self._conn.setAutoCommit(True)

    def query(self, sql: str) -> List[tuple]:
        """Small control-plane SELECTs (probes, watermarks) -> Python rows."""
        st = self._conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            ncols = rs.getMetaData().getColumnCount()
            out = []
            while rs.next():
                row = []
                for i in range(1, ncols + 1):
                    v = rs.getObject(i)
                    if v is not None and not isinstance(v, (int, float, str, bool)):
                        v = str(v)
                    row.append(v)
                out.append(tuple(row))
            return out
        finally:
            st.close()

    def close(self) -> None:
        self._conn.close()

    # -- discovery ---------------------------------------------------------
    def discover_tables(
        self, schema_pattern: Optional[str] = None, selectors: Optional[str] = None
    ) -> List[TableId]:
        """DatabaseMetaData.getTables + selector filter
        (JdbcTableDiscoverer.java semantics: enumerate, then match)."""
        md = self._conn.getMetaData()
        rs = md.getTables(None, schema_pattern, None, None)
        found = []
        while rs.next():
            ttype = rs.getString("TABLE_TYPE")
            if ttype != "TABLE":
                continue
            sc, tb = rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")
            if tb.endswith(LOG_SUFFIX) or tb.endswith("__STG") or tb == "CDC_COMMITS":
                continue  # capture/sink plumbing is not a user table
            found.append(TableId(None, sc.lower(), tb.lower()))
        if selectors:
            sel = Selectors(selectors)
            found = [t for t in found if sel.is_match(t)]
        return sorted(found, key=lambda t: (t.schema_name, t.table_name))

    def discover_schema(self, table: str, schema: Optional[str] = None) -> Schema:
        """DatabaseMetaData.getColumns/getPrimaryKeys -> CDC Schema
        (MySqlSchemaUtils.getTableSchema analog)."""
        md = self._conn.getMetaData()
        rs = md.getColumns(None, schema, table.upper(), None)
        cols = []
        while rs.next():
            name = rs.getString("COLUMN_NAME").lower()
            code = rs.getInt("DATA_TYPE")
            precision = rs.getInt("COLUMN_SIZE")
            scale = rs.getInt("DECIMAL_DIGITS")
            nullable = rs.getInt("NULLABLE") != 0
            cols.append(Column(name, _cdc_type(code, precision, scale, nullable)))
        if not cols:
            raise ValueError(f"table not found via metadata: {table}")
        pk_rs = md.getPrimaryKeys(None, schema, table.upper())
        pks = []
        while pk_rs.next():
            pks.append((pk_rs.getInt("KEY_SEQ"), pk_rs.getString("COLUMN_NAME").lower()))
        return Schema(
            columns=tuple(cols),
            primary_keys=tuple(c for _, c in sorted(pks)),
        )

    def create_table_event(
        self, table: str, table_id: Optional[str] = None
    ) -> CreateTableEvent:
        tid = TableId.parse(table_id) if table_id else TableId(None, "app", table.lower())
        return CreateTableEvent(tid, self.discover_schema(table))


def derby_url(db_path: str, create: bool = True) -> str:
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


# ---------------------------------------------------------------------------
# trigger-based changelog capture
# ---------------------------------------------------------------------------


def _capture_triggers_sql(t: str, log: str, cols) -> list:
    a_cols = ", ".join(f"A_{c}" for c in cols)
    b_cols = ", ".join(f"B_{c}" for c in cols)
    n_vals = ", ".join(f"N.{c}" for c in cols)
    o_vals = ", ".join(f"O.{c}" for c in cols)
    return [
        f"CREATE TRIGGER {t}_CDC_I AFTER INSERT ON {t} REFERENCING NEW AS N "
        f"FOR EACH ROW INSERT INTO {log} (OP, {a_cols}) VALUES ('I', {n_vals})",
        f"CREATE TRIGGER {t}_CDC_U AFTER UPDATE ON {t} "
        f"REFERENCING OLD AS O NEW AS N FOR EACH ROW "
        f"INSERT INTO {log} (OP, {b_cols}, {a_cols}) VALUES ('U', {o_vals}, {n_vals})",
        f"CREATE TRIGGER {t}_CDC_D AFTER DELETE ON {t} REFERENCING OLD AS O "
        f"FOR EACH ROW INSERT INTO {log} (OP, {b_cols}) VALUES ('D', {o_vals})",
    ]


def refresh_capture(ep: JdbcEndpoint, table: str) -> list:
    """Re-align the capture channel after source-side DDL: add any missing
    B_*/A_* image columns to the log table and recreate the row triggers
    with the current column list. The analog of the binlog transparently
    carrying post-DDL row images. Returns the current column names."""
    t = table.upper()
    log = t + LOG_SUFFIX
    schema = ep.discover_schema(table)
    cols = [c.name.upper() for c in schema.columns]
    log_schema = ep.discover_schema(t + LOG_SUFFIX)
    have = {c.name.upper() for c in log_schema.columns}
    type_sql = _image_column_types(schema)
    for c in cols:
        for img in ("B_", "A_"):
            if f"{img}{c}" not in have:
                ep.execute(f"ALTER TABLE {log} ADD COLUMN {img}{c} {type_sql[c]}")
    for trg in ("I", "U", "D"):
        try:
            ep.execute(f"DROP TRIGGER {t}_CDC_{trg}")
        except Exception:
            pass
    for sql in _capture_triggers_sql(t, log, cols):
        ep.execute(sql)
    return [c.name for c in schema.columns]


def _image_column_types(md_schema) -> dict:
    rs_types = {
        "BIGINT": "BIGINT", "INT": "INTEGER", "SMALLINT": "SMALLINT",
        "TINYINT": "SMALLINT", "DOUBLE": "DOUBLE", "FLOAT": "REAL",
        "BOOLEAN": "BOOLEAN", "DATE": "DATE", "TIME": "TIME",
        "TIMESTAMP": "TIMESTAMP",
    }
    out = {}
    for c in md_schema.columns:
        root = c.type.root
        if root == "DECIMAL":
            out[c.name.upper()] = f"DECIMAL({c.type.precision},{c.type.scale})"
        else:
            out[c.name.upper()] = rs_types.get(root, "VARCHAR(4000)")
    return out


def install_capture(ep: JdbcEndpoint, table: str, columns: Sequence[str]) -> None:
    """Create <table>__CDCLOG + AFTER I/U/D row triggers. The log row holds
    both images (B_*/A_*) so UPDATEs carry before+after like the binlog."""
    t = table.upper()
    log = t + LOG_SUFFIX
    # mirror source column types into both image column sets
    md_schema = ep.discover_schema(table)
    type_sql = _image_column_types(md_schema)
    cols = [c.upper() for c in columns]
    img_cols = ", ".join(
        [f"B_{c} {type_sql[c]}" for c in cols] + [f"A_{c} {type_sql[c]}" for c in cols]
    )
    ep.execute(
        f"CREATE TABLE {log} ("
        f"SEQ BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, "
        f"OP CHAR(1) NOT NULL, TS TIMESTAMP DEFAULT CURRENT_TIMESTAMP, {img_cols})"
    )
    for sql in _capture_triggers_sql(t, log, cols):
        ep.execute(sql)


# ---------------------------------------------------------------------------
# the live source
# ---------------------------------------------------------------------------


@dataclass
class JdbcLiveSourceConfig:
    url: str
    table: str
    key_column: str
    table_id: Optional[str] = None
    chunk_size: int = DEFAULT_CHUNK_SIZE
    # chunks read concurrently per wave (the reference's
    # connection.pool.size, MySqlSourceOptions.java:125-127)
    snapshot_pool: int = 8
    startup_mode: StartupMode = StartupMode.INITIAL
    startup_offset: int = 0  # SPECIFIC_OFFSETS
    startup_timestamp: Optional[str] = None  # TIMESTAMP mode ('yyyy-mm-dd hh:mm:ss')


class JdbcLiveSource:
    """Hybrid snapshot+tail reader against a live JDBC endpoint."""

    def __init__(self, spark: SparkSession, cfg: JdbcLiveSourceConfig):
        self.spark = spark
        self.cfg = cfg
        self.ep = JdbcEndpoint(spark, cfg.url)
        self.table_id = cfg.table_id or f"app.{cfg.table.lower()}"
        self._props = {"driver": DERBY_DRIVER}
        self._cached_chunks: List[DataFrame] = []

    def release_caches(self) -> None:
        """Unpersist snapshot-wave caches. The cache is load-bearing while
        the hybrid read is alive (it freezes each wave at its LW/HW-bracketed
        scan point — a JDBC re-read would see later data), so callers
        release only after the snapshot result is fully materialized."""
        for df in self._cached_chunks:
            try:
                df.unpersist()
            except Exception:
                pass
        self._cached_chunks = []

    # -- control plane -----------------------------------------------------
    def current_offset(self) -> int:
        [(mx,)] = self.ep.query(
            f"SELECT COALESCE(MAX(SEQ), 0) FROM {self.cfg.table.upper()}{LOG_SUFFIX}"
        )
        return int(mx)

    def _probe(self):
        k = self.cfg.key_column.upper()
        [(mn, mx, cnt)] = self.ep.query(
            f"SELECT MIN({k}), MAX({k}), COUNT(*) FROM {self.cfg.table.upper()}"
        )
        return (int(mn), int(mx), int(cnt)) if cnt else (0, 0, 0)

    # -- data plane --------------------------------------------------------
    def read_log_envelope(self, from_seq: int = 0) -> DataFrame:
        """The binlog-reader analog: the capture log decoded to the
        changelog envelope (MySqlEventDeserializer.java:57-106 shape),
        read through executor-side JDBC."""
        log_table = f"{self.cfg.table.upper()}{LOG_SUFFIX}"
        raw = self.spark.read.jdbc(
            self.cfg.url,
            log_table,
            predicates=[f"SEQ > {from_seq}"],
            properties=self._props,
        )
        cols = [c[2:].lower() for c in raw.columns if c.startswith("B_")]
        before = F.struct(*[F.col(f"B_{c.upper()}").alias(c) for c in cols])
        after = F.struct(*[F.col(f"A_{c.upper()}").alias(c) for c in cols])
        op = (
            F.when(F.col("OP") == "I", F.lit(OP_INSERT))
            .when(F.col("OP") == "U", F.lit(OP_UPDATE))
            .otherwise(F.lit(OP_DELETE))
        )
        has_after = F.col("OP").isin("I", "U")
        has_before = F.col("OP").isin("U", "D")
        return raw.select(
            F.lit(self.table_id).alias(ENVELOPE_TABLE_ID),
            op.alias(ENVELOPE_OP),
            F.when(has_before, before).otherwise(F.lit(None)).alias("before"),
            F.when(has_after, after).otherwise(F.lit(None)).alias("after"),
            F.create_map(F.lit("source"), F.lit("jdbc-log")).alias(ENVELOPE_META),
            F.col("SEQ").cast("long").alias(ENVELOPE_SEQ),
        )

    def snapshot_chunks(self, mid_scan_hook=None):
        """Chunked snapshot read in parallel WAVES with real LW/HW
        bracketing. Each wave is ONE ``spark.read.jdbc`` call whose
        predicates are the wave's chunks — one JDBC partition per chunk,
        scanned concurrently by Spark's scheduler, the Spark rendition of
        the reference's pooled parallel readers
        (SnapshotSplitAssigner.java:70; connection.pool.size=20,
        MySqlSourceOptions.java:125-127). The wave is materialized
        (cache+count) between its two watermark reads, so the recorded
        LW/HW interval genuinely brackets every chunk in it; because
        plan_chunks emits contiguous half-open ranges, a wave's combined
        key range is (first.lo, last.hi] and backfill applies per-wave.
        Snapshot wall-time is Σ(waves) ≈ Σ(chunks)/pool, not Σ(chunks).

        ``mid_scan_hook`` (tests/contract) runs once between two waves —
        concurrent writes landing mid-snapshot, the case the LW/HW
        protocol exists for (requires >= 2 waves to fire mid-scan)."""
        mn, mx, cnt = self._probe()
        ranges = plan_chunks(mn, mx, cnt, self.cfg.chunk_size)
        preds = chunk_predicates(ranges, self.cfg.key_column.upper())
        pool = max(1, self.cfg.snapshot_pool)
        wave_idx = [
            list(range(i, min(i + pool, len(ranges))))
            for i in range(0, len(ranges), pool)
        ]
        chunks, wms = [], []
        for wi, idxs in enumerate(wave_idx):
            if mid_scan_hook is not None and wi == max(1, (len(wave_idx) + 1) // 2):
                mid_scan_hook()
            lw = self.current_offset()
            df = self.spark.read.jdbc(
                self.cfg.url,
                self.cfg.table.upper(),
                predicates=[preds[i] for i in idxs],
                properties=self._props,
            )
            df = df.toDF(*[c.lower() for c in df.columns]).cache()
            self._cached_chunks.append(df)
            df.count()  # force the parallel scan NOW, between LW and HW
            hw = self.current_offset()
            chunks.append(df)
            wms.append(
                ChunkWatermarks(ranges[idxs[0]].lo, ranges[idxs[-1]].hi, lw, hw)
            )
        return chunks, wms

    def detect_schema_changes(self, known_schema: Optional[Schema] = None):
        """Live DDL detection: re-discover the table's schema through real
        JDBC metadata and derive SchemaChangeEvents from the difference.

        The reference parses binlog DDL statements
        (source/parser/CustomMySqlAntlrDdlParser.java) because MySQL's log
        carries raw SQL; trigger-based capture has no DDL channel, so the
        Spark-first equivalent is metadata polling + schema diff — the
        same events come out (ADD/ALTER type), and the engine's existing
        difference machinery (core/schema_evolution.get_schema_difference)
        does the derivation. Returns (events, new_schema)."""
        from ..core.schema_evolution import get_schema_difference

        current = self.ep.discover_schema(self.cfg.table)
        if known_schema is None:
            return [], current
        events = get_schema_difference(
            TableId.parse(self.table_id), known_schema, current
        )
        return events, current

    def read(self, mid_scan_hook=None) -> DataFrame:
        """Envelope changelog per the configured startup mode
        (StartupMode.java -> assigner selection)."""
        mode = self.cfg.startup_mode
        if mode == StartupMode.SNAPSHOT:
            chunks, wms = self.snapshot_chunks()
            log = self.read_log_envelope(0)
            parts = [
                _normalized(c, log, self.cfg.key_column, w, self.table_id)
                for c, w in zip(chunks, wms)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        if mode == StartupMode.INITIAL:
            start = self.current_offset()
            chunks, wms = self.snapshot_chunks(mid_scan_hook)
            log = self.read_log_envelope(0)
            return snapshot_with_tail(
                chunks, wms, log, self.cfg.key_column, self.table_id, stream_from=start
            )
        if mode == StartupMode.EARLIEST_OFFSET:
            return self.read_log_envelope(0)
        if mode == StartupMode.LATEST_OFFSET:
            return self.read_log_envelope(self.current_offset())
        if mode == StartupMode.SPECIFIC_OFFSETS:
            return self.read_log_envelope(self.cfg.startup_offset)
        if mode == StartupMode.TIMESTAMP:
            if not self.cfg.startup_timestamp:
                raise ValueError("TIMESTAMP startup mode requires startup_timestamp")
            rows = self.ep.query(
                f"SELECT COALESCE(MIN(SEQ), {2**62}) FROM "
                f"{self.cfg.table.upper()}{LOG_SUFFIX} "
                f"WHERE TS >= TIMESTAMP('{self.cfg.startup_timestamp}')"
            )
            first = int(rows[0][0])
            return self.read_log_envelope(first - 1)
        raise ValueError(f"unsupported startup mode: {mode}")


def fresh_rows_for_keys(
    source: "JdbcLiveSource",
    keys_df: DataFrame,
    key_column: str,
    collect_cap: int = 10_000,
) -> Optional[DataFrame]:
    """Re-read the CURRENT rows for a set of touched keys (the post-DDL
    repair path: trigger capture cannot retroactively fill new columns, so
    the stale window is re-read from the live table).

    Scale shape: small key sets collect to IN-predicates pushed to the
    database (O(keys), the common case — the stale window is one poll
    wide); above `collect_cap` the table is re-read chunked and
    LEFT SEMI-joined to the key set executor-side — one bounded extra
    scan on the rare DDL poll, never an unbounded driver collect."""
    n = keys_df.count()
    if n == 0:
        return None
    lower = key_column.lower()
    if n <= collect_cap:
        keys = [r[0] for r in keys_df.collect()]
        preds = []
        for i in range(0, len(keys), 1000):
            chunk = keys[i : i + 1000]
            vals = ", ".join(
                str(k)
                if isinstance(k, (int, float))
                else "'" + str(k).replace("'", "''") + "'"
                for k in chunk
            )
            preds.append(f"{key_column.upper()} IN ({vals})")
        fresh = source.spark.read.jdbc(
            source.cfg.url,
            source.cfg.table.upper(),
            predicates=preds,
            properties=source._props,
        )
    else:
        mn, mx, cnt = source._probe()
        preds = chunk_predicates(
            plan_chunks(mn, mx, cnt, source.cfg.chunk_size),
            source.cfg.key_column.upper(),
        )
        full = source.spark.read.jdbc(
            source.cfg.url,
            source.cfg.table.upper(),
            predicates=preds,
            properties=source._props,
        )
        full = full.toDF(*[c.lower() for c in full.columns])
        fresh = full.join(
            keys_df.toDF(lower).distinct(), on=lower, how="left_semi"
        )
    return fresh.toDF(*[c.lower() for c in fresh.columns])


def _normalized(chunk_df, log, key_column, wm, table_id):
    from .snapshot_backfill import normalize_chunk

    return normalize_chunk(chunk_df, log, key_column, wm, table_id)


# ---------------------------------------------------------------------------
# CLI integration: source.type=jdbc
# ---------------------------------------------------------------------------


def jdbc_streams(spark: SparkSession, config: dict):
    """CLI resolver: yield TableStream per configured (or discovered)
    table. Config keys: url, tables (selector string), key-column.<table>
    (default: discovered primary key), chunk-size, startup-mode."""
    from ..pipeline.composer import TableStream

    url = config.get("url")
    if not url:
        raise SystemExit("source.type=jdbc requires 'url'")
    ep = JdbcEndpoint(spark, url)
    selector = config.get("tables", r"app.\.*")
    for tid in ep.discover_tables(selectors=selector):
        schema = ep.discover_schema(tid.table_name)
        key = config.get(f"key-column.{tid.table_name}") or (
            schema.primary_keys[0] if schema.primary_keys else None
        )
        if key is None:
            raise SystemExit(f"no key column for {tid}: set key-column.{tid.table_name}")
        cfg = JdbcLiveSourceConfig(
            url=url,
            table=tid.table_name,
            key_column=key,
            table_id=str(tid),
            chunk_size=int(config.get("chunk-size", DEFAULT_CHUNK_SIZE)),
            startup_mode=StartupMode(str(config.get("startup-mode", "initial"))),
        )
        src = JdbcLiveSource(spark, cfg)
        yield TableStream(table_id=tid, df=src.read(), schema=schema, insert_only=False)
