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
    before-image) — the MySqlEventDeserializer analog for Postgres
    (deserialization runs in task managers, never the JobManager:
    MySqlEventDeserializer.java:57-106). One reader per slot is the
    replication protocol's own constraint (Debezium reads the same way),
    but the server does that read once into a file; parse and cast then
    scale with executors, and no change row ever materializes on the
    driver.
  * ``advance_slot`` — explicit confirmed-position advance
    (``pg_replication_slot_advance``) so a consumer can peek → merge →
    advance: the slot moves only after the downstream commit succeeds,
    the same contract as Debezium advancing the confirmed LSN after
    records are flushed. ``PostgresCdcPipeline.poll_once`` drives this
    loop (peek up to a captured ``pg_current_wal_lsn()``, merge, then
    advance to that cap), so a crash between merge and advance replays
    the window instead of losing it.

LSN ordering: test_decoding emits rows in commit order; the envelope's
``__seq`` is the row's position in that order (LSNs repeat within a
transaction, so position, not LSN, is the tiebreaker) — stamped
server-side by ``row_number() OVER ()`` over the slot function's
emission order, so ordering survives the distributed file read.
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


_COPY_ESCAPES = {
    "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", "v": "\v",
    "\\": "\\",
}


def copy_text_unescape(s: str) -> str:
    """Undo COPY TO ... (FORMAT text) escaping: \\n, \\t, \\\\ et al plus
    octal/hex digit escapes. The spool file stays one-line-per-change even
    when payload text contains newlines/tabs — that is what makes the file
    splittable for a parallel Spark read."""
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt in _COPY_ESCAPES:
            out.append(_COPY_ESCAPES[nxt])
            i += 2
        elif nxt == "x" and i + 2 < n and s[i + 2] in "0123456789abcdefABCDEF":
            j = i + 2
            while j < min(i + 4, n) and s[j] in "0123456789abcdefABCDEF":
                j += 1
            out.append(chr(int(s[i + 2 : j], 16)))
            i = j
        elif nxt in "01234567":
            j = i + 1
            while j < min(i + 4, n) and s[j] in "01234567":
                j += 1
            out.append(chr(int(s[i + 1 : j], 8)))
            i = j
        else:
            out.append(nxt)
            i += 2
    return "".join(out)


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
            # identifiers quoted INSIDE the literal, else regclass
            # case-folds / splits on embedded dots (mixed-case tables)
            f"WHERE i.indrelid = "
            f"{_ql(_qi(self.cfg.schema_name) + '.' + _qi(self.cfg.table))}::regclass "
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
    def create_slot(self, plugin: str = "test_decoding") -> None:
        exists = self.server.rows(
            f"SELECT 1 FROM pg_replication_slots WHERE slot_name = {_ql(self.cfg.slot)}"
        )
        if not exists:
            self.server.sql(
                f"SELECT pg_create_logical_replication_slot("
                f"{_ql(self.cfg.slot)}, {_ql(plugin)})"
            )

    def create_publication(
        self, name: str = "cdc_pub", publish_truncate: bool = False
    ) -> str:
        """Publication for the pgoutput protocol (production logical
        replication requires one; pgoutput filters rows by it).
        ``publish_truncate`` adds TRUNCATE to the published operation set
        (PostgreSQL publishes insert/update/delete by default)."""
        exists = self.server.rows(
            f"SELECT 1 FROM pg_publication WHERE pubname = {_ql(name)}"
        )
        if not exists:
            with_opts = (
                " WITH (publish = 'insert, update, delete, truncate')"
                if publish_truncate
                else ""
            )
            self.server.sql(
                f"CREATE PUBLICATION {_qi(name)} FOR TABLE "
                f"{_qi(self.cfg.schema_name)}.{_qi(self.cfg.table)}"
                + with_opts
            )
        return name

    def truncate_events_from_spool(self, path: str):
        """Driver-side control pass over a spooled pgoutput file: 'T'
        messages -> TruncateTableEvents (pgoutput_wire.truncate_events).
        Empty unless the publication was created WITH publish=truncate."""
        from .pgoutput_wire import relation_map, truncate_events

        with open(path, "r", encoding="utf-8") as f:
            lines = [
                line.split("\t", 1)[1].strip() for line in f if "\t" in line
            ]
        return truncate_events(lines, relation_map(lines))

    def current_lsn(self) -> str:
        return self.server.rows("SELECT pg_current_wal_lsn() AS l")[0]["l"]

    def advance_slot(self, upto_lsn: str) -> None:
        """Move the slot's confirmed position forward to `upto_lsn` —
        called AFTER the downstream merge commits, so a crash in between
        replays the peeked window instead of losing it (Debezium's
        flush-then-confirm contract). A same-LSN replay is a no-op; an
        advance with an LSN *older* than the confirmed position errors
        server-side ("cannot advance replication slot ... minimum is"),
        which for a replayed confirm means the work is already done — so
        that specific failure is swallowed here."""
        try:
            self.server.sql(
                f"SELECT pg_replication_slot_advance({_ql(self.cfg.slot)}, "
                f"{_ql(upto_lsn)}::pg_lsn)"
            )
        except RuntimeError as e:
            if "cannot advance replication slot" not in str(e):
                raise

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
    def spool_changes(
        self,
        peek: bool = True,
        limit: Optional[int] = None,
        upto_lsn: Optional[str] = None,
    ) -> str:
        """Spool the slot server-side into ONE file:

            COPY (SELECT row_number() OVER () AS seq, data
                  FROM pg_logical_slot_{peek,get}_changes(slot, upto, lim))
            TO <file>   -- COPY text format: splittable, one line per change

        The single slot read (the replication protocol's constraint) is
        done by the server itself, writing a file — nothing rows through
        psql or the driver. ``seq`` is stamped server-side by row_number()
        over the slot's emission order, so commit ordering survives a
        parallel, out-of-order Spark read of the file. Returns the path.
        """
        import tempfile
        import uuid

        fn = "pg_logical_slot_peek_changes" if peek else "pg_logical_slot_get_changes"
        lim = "NULL" if limit is None else str(int(limit))
        upto = "NULL" if upto_lsn is None else f"{_ql(upto_lsn)}::pg_lsn"
        out_dir = tempfile.mkdtemp(prefix="pgslot_", dir="/tmp")
        _open_for_server(out_dir)
        path = os.path.join(out_dir, f"changes-{uuid.uuid4().hex[:8]}.tsv")
        self.server.sql(
            f"COPY (SELECT row_number() OVER () AS seq, data "
            f"FROM {fn}({_ql(self.cfg.slot)}, {upto}, {lim})) TO {_ql(path)}"
        )
        return path

    def spool_binary_changes(
        self,
        publication: str,
        peek: bool = True,
        limit: Optional[int] = None,
        upto_lsn: Optional[str] = None,
    ) -> str:
        """pgoutput variant of spool_changes: the slot's BINARY messages
        hex-encoded server-side (COPY of bytea would escape anyway; hex is
        splittable and trivially decodable in executors)."""
        import tempfile
        import uuid

        fn = (
            "pg_logical_slot_peek_binary_changes"
            if peek
            else "pg_logical_slot_get_binary_changes"
        )
        lim = "NULL" if limit is None else str(int(limit))
        upto = "NULL" if upto_lsn is None else f"{_ql(upto_lsn)}::pg_lsn"
        out_dir = tempfile.mkdtemp(prefix="pgout_", dir="/tmp")
        _open_for_server(out_dir)
        path = os.path.join(out_dir, f"changes-{uuid.uuid4().hex[:8]}.tsv")
        self.server.sql(
            f"COPY (SELECT row_number() OVER () AS seq, encode(data, 'hex') "
            f"FROM {fn}({_ql(self.cfg.slot)}, {upto}, {lim}, "
            f"'proto_version', '1', 'publication_names', {_ql(publication)})) "
            f"TO {_ql(path)}"
        )
        return path

    def read_changes_pgoutput(
        self,
        publication: str = "cdc_pub",
        peek: bool = True,
        limit: Optional[int] = None,
        upto_lsn: Optional[str] = None,
    ) -> DataFrame:
        """Changelog envelope decoded from the PRODUCTION pgoutput binary
        protocol (pgoutput_wire.py): the slot spools hex-encoded messages
        server-side; 'R' Relation messages resolve column names in a
        driver-side control pass (the two-plane TABLE_MAP shape); row
        messages decode executor-side via mapInPandas. The slot must have
        been created with plugin='pgoutput'."""
        import json as _json

        from ..session import ensure_package_on_executors
        from .pgoutput_wire import relation_map

        ensure_package_on_executors(self.spark)
        path = self.spool_binary_changes(
            publication, peek=peek, limit=limit, upto_lsn=upto_lsn
        )
        schema = self.discover_schema()
        payload = schema.to_spark_struct()
        names = [f.name for f in payload.fields]
        with open(path, "r", encoding="utf-8") as f:
            rels = relation_map(
                line.split("\t", 1)[1].strip() for line in f if "\t" in line
            )
        want_oids = {
            oid
            for oid, r in rels.items()
            if r["namespace"] == self.cfg.schema_name
            and r["relation"] == self.cfg.table
        }
        col_names_by_oid = {
            oid: [c["name"] for c in rels[oid]["columns"]] for oid in want_oids
        }

        raw = self.spark.read.csv(
            path, sep="\t", schema="seq LONG, data STRING", quote=""
        )

        def decode(batches):
            import pandas as pd

            from flink_cdc_spark.sources.pgoutput_wire import (
                parse_pgoutput_message,
            )

            for pdf in batches:
                out = []
                for seq, hx in zip(pdf["seq"], pdf["data"]):
                    if hx is None or hx[:2] not in ("49", "55", "44"):
                        continue  # only I/U/D rows decode here
                    msg = parse_pgoutput_message(bytes.fromhex(hx))
                    oid = msg["oid"]
                    if oid not in col_names_by_oid:
                        continue
                    cols = col_names_by_oid[oid]

                    def obj(cells):
                        if cells is None:
                            return None
                        return _json.dumps(dict(zip(cols, cells)))

                    if msg["type"] == "INSERT":
                        out.append((int(seq), "INSERT", None, obj(msg["new"])))
                    elif msg["type"] == "UPDATE":
                        out.append(
                            (int(seq), "UPDATE", obj(msg["old"]), obj(msg["new"]))
                        )
                    else:
                        out.append((int(seq), "DELETE", obj(msg["old"]), None))
                yield pd.DataFrame(
                    out, columns=["seq", "op", "before_json", "after_json"]
                )

        dec = raw.mapInPandas(
            decode,
            schema="seq LONG, op STRING, before_json STRING, after_json STRING",
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
            F.lit(self.table_id).alias("__table_id"),
            F.col("op").alias("__op"),
            cast_struct("__b").alias("before"),
            cast_struct("__a").alias("after"),
            F.create_map().cast("map<string,string>").alias("__meta"),
            (F.col("seq") - F.lit(1)).cast("long").alias("__seq"),
        )

    def read_changes(
        self,
        peek: bool = True,
        limit: Optional[int] = None,
        upto_lsn: Optional[str] = None,
    ) -> DataFrame:
        """Decode the slot into the changelog envelope, executor-side.

        Spool (server-side COPY, one eager pass — so the returned frame is
        stable even for the destructive ``get_changes``) -> splittable
        ``spark.read.csv`` of (seq, data) -> ``mapInPandas`` parse of the
        test_decoding grammar -> ``from_json`` + cast to the discovered
        schema. Every per-row step runs in executors; the driver only
        issues the COPY and holds the file path."""
        from ..session import ensure_package_on_executors

        ensure_package_on_executors(self.spark)
        path = self.spool_changes(peek=peek, limit=limit, upto_lsn=upto_lsn)
        schema = self.discover_schema()
        payload = schema.to_spark_struct()
        names = [f.name for f in payload.fields]
        table_match = f"{self.cfg.schema_name}.{self.cfg.table}"

        raw = self.spark.read.csv(
            path,
            sep="\t",
            schema="seq LONG, data STRING",
            quote="",  # pass COPY text format through verbatim
        )

        def decode(batches):
            import json as _json

            import pandas as pd

            for pdf in batches:
                out = []
                for seq, data in zip(pdf["seq"], pdf["data"]):
                    if data is None:
                        continue
                    parsed = parse_test_decoding_line(copy_text_unescape(data))
                    if parsed is None:
                        continue
                    tid, op, before, after = parsed
                    if tid != table_match:
                        continue
                    out.append(
                        (
                            int(seq),
                            op,
                            None
                            if before is None
                            else _json.dumps({n: before.get(n) for n in names}),
                            None
                            if after is None
                            else _json.dumps({n: after.get(n) for n in names}),
                        )
                    )
                yield pd.DataFrame(
                    out, columns=["seq", "op", "before_json", "after_json"]
                )

        dec = raw.mapInPandas(
            decode,
            schema="seq LONG, op STRING, before_json STRING, after_json STRING",
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
            F.lit(self.table_id).alias("__table_id"),
            F.col("op").alias("__op"),
            cast_struct("__b").alias("before"),
            cast_struct("__a").alias("after"),
            F.create_map().cast("map<string,string>").alias("__meta"),
            (F.col("seq") - F.lit(1)).cast("long").alias("__seq"),
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
