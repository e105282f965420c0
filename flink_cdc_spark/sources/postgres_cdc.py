"""PostgreSQL pipeline source: logical decoding, the real thing.

The Spark rendition of the reference's Postgres connector
(pipeline-connector-postgres/.../PostgresDataSource.java, which consumes
the server's logical replication stream through Debezium's
`pgoutput`/decoding plugins): this module runs an actual PostgreSQL
server (initdb + pg_ctl, bundled in the image), captures changes through
a real **logical replication slot** with the `test_decoding` output
plugin — the same server mechanism Debezium sits on — and reads
snapshots through chunked server-side `COPY` exports that Spark ingests
executor-side.

Pieces:

  * ``PostgresServer`` — lifecycle (initdb/start/stop, wal_level=logical,
    unix-socket only) + a psql transport. The server runs as an
    unprivileged user; SQL I/O rides psql's CSV mode.
  * schema/table discovery over ``information_schema`` (the
    PostgresSchemaUtils analog).
  * ``snapshot_chunks`` — chunk ranges from the engine's splitter math
    (jdbc_snapshot.plan_chunks) exported via
    ``COPY (SELECT ... WHERE <chunk>) TO <file> CSV`` and read back with
    ``spark.read.csv(schema=...)`` — the bulk path is files, so a
    1000-executor cluster scans it in parallel; nothing rows through the
    driver.
  * ``read_changes`` — the replication slot spooled server-side
    (``COPY (SELECT row_number() OVER (), data FROM
    pg_logical_slot_peek/get_changes(...)) TO <file>``) and decoded
    **executor-side** with ``mapInPandas``: the ``test_decoding`` text
    format is parsed into the changelog envelope (INSERT after-image,
    UPDATE old-key/new-tuple with REPLICA IDENTITY FULL, DELETE
    before-image) — the MySqlEventDeserializer analog for Postgres. One
    reader per slot is the replication protocol's own constraint
    (Debezium reads the same way), but the server does that read once
    into files; parse and cast then scale with executors, and no change
    row ever materializes on the driver.
  * ``advance_slot`` — explicit confirmed-position advance
    (``pg_replication_slot_advance``) so a consumer can peek → merge →
    advance: the slot moves only after the downstream commit succeeds,
    the same contract as Debezium advancing the confirmed LSN after
    records are flushed.

LSN ordering: test_decoding emits rows in commit order; the envelope's
``__seq`` is the row's position in that order (LSNs repeat within a
transaction, so position, not LSN, is the tiebreaker) — stamped
server-side by ``row_number() OVER ()`` over the slot function's
emission order.
"""

from __future__ import annotations

import csv
import io
import os
import re
import subprocess
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core import types as ct
from ..core.schema import Column, Schema
from ..core.selectors import Selectors
from ..core.table_id import TableId
from .envelope import OP_DELETE, OP_INSERT, OP_UPDATE
from .jdbc_snapshot import chunk_predicates, plan_chunks

_RUN_AS = "nobody"

_PG_TYPE_MAP = {
    "bigint": ct.bigint,
    "integer": ct.int_,
    "smallint": ct.smallint,
    "boolean": ct.boolean,
    "real": ct.float_,
    "double precision": ct.double,
    "date": ct.date,
    "text": ct.string,
}


def _pg_type(data_type: str, precision, scale, nullable: bool):
    dt = data_type.lower()
    if dt.startswith("numeric"):
        t = ct.decimal(int(precision or 10), int(scale or 0))
    elif dt.startswith("character") or dt == "text":
        t = ct.string()
    elif dt.startswith("timestamp"):
        t = ct.timestamp()
    else:
        factory = _PG_TYPE_MAP.get(dt)
        t = factory() if factory else ct.string()
    return t if nullable else t.not_null()


def _qi(name: str) -> str:
    """Quote a SQL identifier (schema/table/column names arrive from
    config and discovery; never interpolate them bare)."""
    return '"' + str(name).replace('"', '""') + '"'


def _ql(value: str) -> str:
    """Quote a SQL string literal."""
    return "'" + str(value).replace("'", "''") + "'"


def _open_for_server(path: str) -> None:
    """Make `path` writable by the unprivileged server user, adding
    traverse bits to ancestors *only inside the system temp tree* (pytest
    tmp dirs are 0700-root). The walk never escapes the temp root, so
    ordinary calls cannot loosen permissions on /, /root, or any other
    directory outside scratch space; paths elsewhere must already be
    server-traversable."""
    import tempfile

    os.makedirs(path, exist_ok=True)
    os.chmod(path, 0o777)
    boundary = os.path.realpath(tempfile.gettempdir())
    p = os.path.dirname(os.path.realpath(path))
    while p.startswith(boundary + os.sep):
        try:
            os.chmod(p, os.stat(p).st_mode | 0o011)
        except OSError:
            break
        p = os.path.dirname(p)


class PostgresServer:
    """An embedded-style PostgreSQL server under `root_dir` (unix socket
    only, logical WAL). Runs as an unprivileged user; idempotent start."""

    def __init__(self, root_dir: str, superuser: str = "pg"):
        self.root = root_dir
        self.data = os.path.join(root_dir, "data")
        self.user = superuser

    # -- process lifecycle -------------------------------------------------
    def _run(self, cmd: str, check: bool = True) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["su", "-s", "/bin/bash", _RUN_AS, "-c", cmd],
            capture_output=True,
            text=True,
            check=check,
            cwd="/tmp",
        )

    def init(self) -> None:
        _open_for_server(self.root)
        subprocess.run(["chown", "-R", _RUN_AS, self.root], check=True)
        self._run(f"/usr/local/bin/initdb -D {self.data} -A trust -U {self.user}")
        with open(os.path.join(self.data, "postgresql.conf"), "a") as f:
            # fsync=off is safe for a test/fixture server; synchronous_commit
            # must stay ON — with it off, commits become visible to logical
            # decoding only after the deferred WAL write (~200ms), so a
            # read_changes() right after a commit would silently miss it
            f.write(
                "\nwal_level = logical\nlisten_addresses = ''\n"
                f"unix_socket_directories = '{self.root}'\n"
                "fsync = off\n"
            )
        subprocess.run(["chown", "-R", _RUN_AS, self.root], check=True)

    def is_running(self) -> bool:
        r = self._run(f"/usr/local/bin/pg_ctl -D {self.data} status", check=False)
        return r.returncode == 0

    def start(self) -> None:
        if not os.path.exists(self.data):
            self.init()
        if not self.is_running():
            self._run(
                f"/usr/local/bin/pg_ctl -D {self.data} -l {self.root}/pg.log -w start"
            )

    def stop(self) -> None:
        if self.is_running():
            self._run(f"/usr/local/bin/pg_ctl -D {self.data} -m fast stop", check=False)

    # -- SQL transport -----------------------------------------------------
    def sql(self, statement: str, db: str = "postgres") -> str:
        r = subprocess.run(
            ["psql", "-h", self.root, "-U", self.user, db, "-v", "ON_ERROR_STOP=1",
             "--csv", "-c", statement],
            capture_output=True,
            text=True,
            cwd="/tmp",
        )
        if r.returncode != 0:
            raise RuntimeError(f"psql failed: {r.stderr.strip()}\nSQL: {statement}")
        return r.stdout

    def rows(self, statement: str, db: str = "postgres") -> List[dict]:
        out = self.sql(statement, db)
        return list(csv.DictReader(io.StringIO(out)))


# ---------------------------------------------------------------------------
# test_decoding output parser (the event deserializer)
# ---------------------------------------------------------------------------

_CHANGE_RE = re.compile(
    r"^table (?P<schema>[^.]+)\.(?P<table>\S+?): (?P<op>INSERT|UPDATE|DELETE): (?P<rest>.*)$"
)


def _parse_cells(text: str) -> dict:
    """Parse `col[type]:value ...` runs; quoted values use '' escaping and
    may contain spaces/colons."""
    cells = {}
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] == " ":
            i += 1
        m = re.match(r"([A-Za-z_][A-Za-z0-9_$]*)\[([^\]]*)\]:", text[i:])
        if not m:
            break
        name = m.group(1)
        i += m.end()
        if i < n and text[i] == "'":
            i += 1
            buf = []
            while i < n:
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        buf.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                buf.append(text[i])
                i += 1
            cells[name] = "".join(buf)
        else:
            j = i
            while j < n and text[j] != " ":
                j += 1
            tok = text[i:j]
            cells[name] = None if tok == "null" else tok
            i = j
    return cells


def parse_test_decoding_line(line: str):
    """One test_decoding data row -> (table_id, op, before_cells,
    after_cells) or None for BEGIN/COMMIT/messages."""
    m = _CHANGE_RE.match(line)
    if not m:
        return None
    table_id = f"{m.group('schema')}.{m.group('table')}"
    op, rest = m.group("op"), m.group("rest")
    if op == "INSERT":
        return table_id, OP_INSERT, None, _parse_cells(rest)
    if op == "DELETE":
        return table_id, OP_DELETE, _parse_cells(rest), None
    # UPDATE: with REPLICA IDENTITY FULL: "old-key: ... new-tuple: ..."
    if "old-key:" in rest and "new-tuple:" in rest:
        old_part, new_part = rest.split("new-tuple:", 1)
        before = _parse_cells(old_part.split("old-key:", 1)[1])
        after = _parse_cells(new_part)
    else:
        before, after = None, _parse_cells(rest)
    return table_id, OP_UPDATE, before, after


# ---------------------------------------------------------------------------
# the source
# ---------------------------------------------------------------------------


@dataclass
class PostgresCdcConfig:
    table: str
    key_column: str
    schema_name: str = "public"
    slot: str = "cdc_slot"
    chunk_size: int = 8096
    table_id: Optional[str] = None


class PostgresCdcSource:
    """Snapshot via chunked COPY exports + changelog via a logical slot."""

    def __init__(self, spark: SparkSession, server: PostgresServer, cfg: PostgresCdcConfig):
        self.spark = spark
        self.server = server
        self.cfg = cfg
        self.table_id = cfg.table_id or f"{cfg.schema_name}.{cfg.table}"

    # -- discovery (PostgresSchemaUtils analog) ---------------------------
    def discover_tables(self, selectors: Optional[str] = None) -> List[TableId]:
        rows = self.server.rows(
            "SELECT table_schema, table_name FROM information_schema.tables "
            "WHERE table_type = 'BASE TABLE' "
            "AND table_schema NOT IN ('pg_catalog', 'information_schema') "
            "ORDER BY 1, 2"
        )
        found = [TableId(None, r["table_schema"], r["table_name"]) for r in rows]
        if selectors:
            sel = Selectors(selectors)
            found = [t for t in found if sel.is_match(t)]
        return found

    def discover_schema(self) -> Schema:
        cols = self.server.rows(
            "SELECT column_name, data_type, numeric_precision, numeric_scale, "
            "is_nullable FROM information_schema.columns "
            f"WHERE table_schema = {_ql(self.cfg.schema_name)} "
            f"AND table_name = {_ql(self.cfg.table)} ORDER BY ordinal_position"
        )
        if not cols:
            raise ValueError(f"table not found: {self.cfg.table}")
        pks = self.server.rows(
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid "
            "AND a.attnum = ANY(i.indkey) "
            f"WHERE i.indrelid = {_ql(self.cfg.schema_name + '.' + self.cfg.table)}::regclass "
            "AND i.indisprimary"
        )
        return Schema(
            columns=tuple(
                Column(
                    c["column_name"],
                    _pg_type(
                        c["data_type"],
                        c["numeric_precision"] or 0,
                        c["numeric_scale"] or 0,
                        c["is_nullable"] == "YES",
                    ),
                )
                for c in cols
            ),
            primary_keys=tuple(r["attname"] for r in pks),
        )

    # -- replication slot --------------------------------------------------
    def create_slot(self) -> None:
        exists = self.server.rows(
            f"SELECT 1 FROM pg_replication_slots WHERE slot_name = {_ql(self.cfg.slot)}"
        )
        if not exists:
            self.server.sql(
                f"SELECT pg_create_logical_replication_slot("
                f"{_ql(self.cfg.slot)}, 'test_decoding')"
            )

    def current_lsn(self) -> str:
        return self.server.rows("SELECT pg_current_wal_lsn() AS l")[0]["l"]

    def advance_slot(self, upto_lsn: str) -> None:
        """Move the slot's confirmed position forward to `upto_lsn` —
        called AFTER the downstream merge commits, so a crash in between
        replays the peeked window instead of losing it (Debezium's
        flush-then-confirm contract). pg_replication_slot_advance never
        moves a slot backwards, so a replayed advance is a no-op."""
        self.server.sql(
            f"SELECT pg_replication_slot_advance({_ql(self.cfg.slot)}, "
            f"{_ql(upto_lsn)}::pg_lsn)"
        )

    # -- snapshot: chunked COPY exports -----------------------------------
    def snapshot(self, out_dir: str, parallelism: int = 8) -> DataFrame:
        """Server-side chunked COPY to CSV files, read executor-side.

        COPY exports run `parallelism` at a time (each on its own psql
        connection, the SnapshotSplitAssigner connection-pool analog,
        MySqlSourceOptions.java:125-127) — the server scans chunks
        concurrently instead of one-by-one, so export wall-time scales
        with server cores, and the Spark read scales with executors."""
        from concurrent.futures import ThreadPoolExecutor

        q = self.cfg
        full = f"{_qi(q.schema_name)}.{_qi(q.table)}"
        probe = self.server.rows(
            f"SELECT MIN({_qi(q.key_column)}) AS mn, MAX({_qi(q.key_column)}) AS mx, "
            f"COUNT(*) AS c FROM {full}"
        )[0]
        cnt = int(probe["c"])
        _open_for_server(out_dir)
        if cnt == 0:
            preds = ["1=1"]
        else:
            ranges = plan_chunks(int(probe["mn"]), int(probe["mx"]), cnt, q.chunk_size)
            preds = chunk_predicates(ranges, _qi(q.key_column))
        schema = self.discover_schema()
        # postgres CSV booleans are t/f; Spark's reader wants true/false
        select_list = ", ".join(
            f"CASE WHEN {_qi(c.name)} THEN 'true' WHEN NOT {_qi(c.name)} THEN 'false' END"
            f" AS {_qi(c.name)}"
            if c.type.root == "BOOLEAN"
            else _qi(c.name)
            for c in schema.columns
        )

        def export(i_pred):
            i, pred = i_pred
            path = os.path.join(out_dir, f"chunk-{i:05d}.csv")
            self.server.sql(
                f"COPY (SELECT {select_list} FROM {full} WHERE {pred}) TO {_ql(path)} "
                "WITH (FORMAT csv, NULL '\\N')"
            )

        with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
            list(pool.map(export, enumerate(preds)))
        return self.spark.read.csv(
            out_dir,
            schema=schema.to_spark_struct(),
            nullValue="\\N",
            header=False,
            escape='"',  # postgres CSV escapes " as "" (RFC 4180)
        )

    # -- changelog: the slot ----------------------------------------------
    def read_changes(self, peek: bool = True, limit: Optional[int] = None) -> DataFrame:
        """Consume (or peek) the slot and decode into the envelope."""
        fn = "pg_logical_slot_peek_changes" if peek else "pg_logical_slot_get_changes"
        lim = "NULL" if limit is None else str(int(limit))
        rows = self.server.rows(
            f"SELECT data FROM {fn}('{self.cfg.slot}', NULL, {lim})"
        )
        schema = self.discover_schema()
        payload = schema.to_spark_struct()
        names = [f.name for f in payload.fields]

        def cast_cells(cells):
            if cells is None:
                return None
            return tuple(cells.get(n) for n in names)

        data = []
        seq = 0
        for r in rows:
            parsed = parse_test_decoding_line(r["data"])
            if parsed is None:
                continue
            tid, op, before, after = parsed
            if tid != f"{self.cfg.schema_name}.{self.cfg.table}":
                continue
            data.append(
                (self.table_id, op, cast_cells(before), cast_cells(after), {}, seq)
            )
            seq += 1
        str_payload = T.StructType(
            [T.StructField(n, T.StringType(), True) for n in names]
        )
        env_schema = T.StructType(
            [
                T.StructField("__table_id", T.StringType(), False),
                T.StructField("__op", T.StringType(), False),
                T.StructField("before", str_payload, True),
                T.StructField("after", str_payload, True),
                T.StructField("__meta", T.MapType(T.StringType(), T.StringType()), True),
                T.StructField("__seq", T.LongType(), False),
            ]
        )
        env = self.spark.createDataFrame(data, env_schema)
        # decode string cells to the discovered types (executor-side cast)
        cast_struct = lambda side: F.when(
            F.col(side).isNotNull(),
            F.struct(
                *[
                    F.col(f"{side}.{f.name}").cast(f.dataType).alias(f.name)
                    for f in payload.fields
                ]
            ),
        )
        return env.select(
            "__table_id",
            "__op",
            cast_struct("before").alias("before"),
            cast_struct("after").alias("after"),
            "__meta",
            "__seq",
        )


# ---------------------------------------------------------------------------
# CLI integration: source.type=postgres
# ---------------------------------------------------------------------------


def postgres_streams(spark: SparkSession, config: dict):
    """CLI resolver: discovered tables -> TableStream (snapshot + decoded
    slot replay). Config keys: pgdata (server root dir), tables (selector),
    slot, chunk-size."""
    import tempfile

    from ..pipeline.composer import TableStream
    from .envelope import wrap_as_inserts

    root = config.get("pgdata")
    if not root:
        raise SystemExit("source.type=postgres requires 'pgdata' (server root dir)")
    server = PostgresServer(root)
    server.start()
    selector = config.get("tables", r"public.\.*")
    probe = PostgresCdcSource(
        spark, server, PostgresCdcConfig(table="", key_column="")
    )
    for tid in probe.discover_tables(selectors=selector):
        cfg = PostgresCdcConfig(
            table=tid.table_name,
            key_column="",
            schema_name=tid.schema_name,
            slot=config.get("slot", "cdc_slot"),
            chunk_size=int(config.get("chunk-size", 8096)),
            table_id=str(tid),
        )
        src = PostgresCdcSource(spark, server, cfg)
        schema = src.discover_schema()
        if not schema.primary_keys:
            continue
        cfg.key_column = schema.primary_keys[0]
        snap_dir = tempfile.mkdtemp(prefix="pgcli_", dir="/tmp")
        snap = src.snapshot(snap_dir)
        env = wrap_as_inserts(snap, str(tid))
        try:
            changes = src.read_changes(peek=True)
            changes = changes.withColumn("__seq", F.col("__seq") + (1 << 40))
            env = env.unionByName(changes)
        except RuntimeError:
            pass  # no slot: snapshot-only
        yield TableStream(table_id=tid, df=env, schema=schema, insert_only=False)
