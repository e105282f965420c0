"""TiDB CDC source surface: options, KV-event decode over the TiKV wire.

The Spark rendition of the reference's TiDB connector
(flink-connector-tidb-cdc). No TiKV/PD cluster or client ships in this
environment, so the live branch fails fast; the substantive piece — the
KV change-event decode of
``RowDataTiKVChangeEventDeserializationSchema.deserialize`` — is real
and tested over canned wire bytes built with ``tikv_wire``:

* a change event is a cdcpb Row: (commit_ts, op_type PUT|DELETE, key,
  value, old_value);
* ``RowKey.decode(key)`` yields (table_id, handle) — the record-key
  memcomparable layout in ``tikv_wire.decode_row_key``;
* DELETE decodes the OLD value (the deleted image);
* PUT with an empty old_value is an INSERT; PUT with a non-empty
  old_value is an UPDATE carrying only the post-image (the reference
  emits a lone UPDATE_AFTER — deserialize():137-160);
* ``__seq`` is commit_ts — TiKV's own total order (per-key unique: one
  commit per key per version).

Execution shape: one ``mapInPandas`` pass decodes key + row-v2 values
into plain JSON images; ``from_json`` + ``cast`` build the typed payload
struct JVM-side. Region-sharded CDC streams are the parallel unit (one
task per region file/slice), matching how TiKV itself shards the
changefeed.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass
from typing import Dict, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core import types as ct
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
)
from .tikv_wire import decode_row_key, decode_row_v2

_TIDB_TYPE_MAP = {
    # RowDataTiKVEventDeserializationSchemaBase converter surface
    "tinyint": ct.smallint,
    "smallint": ct.smallint,
    "mediumint": ct.int_,
    "int": ct.int_,
    "bigint": ct.bigint,
    "float": ct.float_,
    "double": ct.double,
    "char": ct.string,
    "varchar": ct.string,
    "text": ct.string,
    "json": ct.string,
    "date": ct.date,
    "datetime": ct.timestamp,
    "timestamp": ct.timestamp_ltz,
    "blob": ct.bytes_,
    "varbinary": ct.bytes_,
    "binary": ct.bytes_,
    "boolean": ct.boolean,
}


def tidb_type(type_name: str, precision: int = 0, scale: int = 0,
              nullable: bool = True):
    """TiDB (MySQL-dialect) type name -> CDC type."""
    name = (type_name or "").strip().lower().split("(", 1)[0]
    if name in ("decimal", "numeric"):
        t = ct.decimal(precision or 10, scale)
    else:
        factory = _TIDB_TYPE_MAP.get(name)
        t = factory() if factory else ct.string()
    return t if nullable else t.not_null()


@dataclass
class TiDBSourceConfig:
    """`tidb-cdc` options (TDBSourceOptions.java:37-90)."""

    database: str = ""
    table: str = ""
    pd_addresses: str = ""
    host_mapping: str = ""
    startup_mode: str = "initial"
    grpc_timeout_ms: int = 0
    grpc_scan_timeout_ms: int = 0
    batch_get_concurrency: int = 0
    batch_scan_concurrency: int = 0

    @classmethod
    def from_dict(cls, config: dict) -> "TiDBSourceConfig":
        mode = str(config.get("scan.startup.mode", "initial")).lower()
        if mode not in ("initial", "latest-offset"):
            raise ValueError(
                f"scan.startup.mode must be initial or latest-offset, got {mode!r}"
            )
        return cls(
            database=config.get("database-name", ""),
            table=config.get("table-name", ""),
            pd_addresses=config.get("pd-addresses", ""),
            host_mapping=config.get("host-mapping", ""),
            startup_mode=mode,
            grpc_timeout_ms=int(config.get("tikv.grpc.timeout_in_ms", 0) or 0),
            grpc_scan_timeout_ms=int(
                config.get("tikv.grpc.scan_timeout_in_ms", 0) or 0
            ),
            batch_get_concurrency=int(
                config.get("tikv.batch_get_concurrency", 0) or 0
            ),
            batch_scan_concurrency=int(
                config.get("tikv.batch_scan_concurrency", 0) or 0
            ),
        )


# column metadata: name -> (column_id, wire type) — the tableInfo analog
TableInfo = Dict[str, Tuple[int, str]]


def decode_cdc_events(
    raw: DataFrame,
    table_id_num: int,
    table_id: str,
    table_info: TableInfo,
    payload: T.StructType,
) -> DataFrame:
    """Decode cdcpb Row events (columns: ``commit_ts`` long, ``op_type``
    string, ``key``/``value``/``old_value`` binary) into the changelog
    envelope; events for other table ids are dropped (region streams
    interleave tables)."""
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(raw.sparkSession)
    names = [f.name for f in payload.fields]
    col_types = {cid: wire for _, (cid, wire) in table_info.items()}
    id_to_name = {cid: n for n, (cid, _) in table_info.items()}

    def _jsonable(v):
        # bytes through json.dumps(default=str) would serialize as the
        # Python repr "b'..'" and the later cast would store that repr's
        # UTF-8 — base64 here, unbase64 in the JVM-side cast below
        if isinstance(v, (bytes, bytearray)):
            return base64.b64encode(bytes(v)).decode("ascii")
        return v

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for ts, op, key, value, old in zip(
                pdf["commit_ts"], pdf["op_type"], pdf["key"],
                pdf["value"], pdf["old_value"],
            ):
                tid, handle = decode_row_key(bytes(key))
                if tid != table_id_num:
                    continue

                def image(raw_value):
                    if raw_value is None or len(raw_value) == 0:
                        return None
                    vals = decode_row_v2(bytes(raw_value), col_types)
                    d = {id_to_name[cid]: v for cid, v in vals.items()}
                    return json.dumps(
                        {n: _jsonable(d.get(n)) for n in names}, default=str
                    )

                if op == "DELETE":
                    out.append((int(ts), OP_DELETE, image(old), None, handle))
                elif op == "PUT":
                    after = image(value)
                    if old is None or len(old) == 0:
                        out.append((int(ts), OP_INSERT, None, after, handle))
                    else:
                        out.append((int(ts), OP_UPDATE, None, after, handle))
                else:
                    raise ValueError(f"unknown op_type {op!r}")
            yield pd.DataFrame(
                out,
                columns=["seq", "op", "before_json", "after_json", "handle"],
            )

    dec = raw.mapInPandas(
        decode,
        schema="seq LONG, op STRING, before_json STRING, after_json STRING, "
               "handle LONG",
    )
    str_payload = T.StructType(
        [T.StructField(n, T.StringType(), True) for n in names]
    )
    parsed = dec.withColumn(
        "__b", F.from_json("before_json", str_payload)
    ).withColumn("__a", F.from_json("after_json", str_payload))
    def _cast_field(side, f):
        if isinstance(f.dataType, T.BinaryType):
            # the decoder base64-encoded raw bytes into the JSON image
            return F.unbase64(F.col(f"{side}.{f.name}")).alias(f.name)
        return F.col(f"{side}.{f.name}").cast(f.dataType).alias(f.name)

    cast_struct = lambda side: F.when(
        F.col(side).isNotNull(),
        F.struct(*[_cast_field(side, f) for f in payload.fields]),
    )
    return parsed.select(
        F.lit(table_id).alias(ENVELOPE_TABLE_ID),
        F.col("op").alias(ENVELOPE_OP),
        cast_struct("__b").alias("before"),
        cast_struct("__a").alias("after"),
        F.create_map(
            F.lit("source"), F.lit("tidb-cdc"),
            F.lit("handle"), F.col("handle").cast("string"),
        ).alias(ENVELOPE_META),
        F.col("seq").alias(ENVELOPE_SEQ),
    )


def tidb_streams(spark: SparkSession, config: dict):
    """CLI resolver for `type: tidb`. `kv-file` (a parquet of cdcpb Row
    events: commit_ts, op_type, key, value, old_value) runs the offline
    replay through decode_cdc_events; `table-info` maps column names to
    "id:type" pairs (the tableInfo the decoder consults). Live mode
    needs a PD/TiKV cluster and the TiKV client — neither ships here."""
    cfg = TiDBSourceConfig.from_dict(config)
    kv_file = config.get("kv-file")
    if kv_file:
        from ..core.schema import Schema
        from ..core.table_id import TableId
        from ..pipeline.composer import TableStream

        info_raw = config.get("table-info") or {}
        if not isinstance(info_raw, dict) or not info_raw:
            raise SystemExit(
                "source.type=tidb kv-file replay requires 'table-info' "
                "(column -> 'id:type' mapping)"
            )
        wire_to_spark = {"long": T.LongType(), "double": T.DoubleType(),
                         "string": T.StringType(), "bytes": T.BinaryType()}
        info: TableInfo = {}
        fields = []
        for name, spec in info_raw.items():
            cid, wire = str(spec).split(":", 1)
            if wire not in wire_to_spark:
                raise SystemExit(f"unsupported table-info type {wire!r}")
            info[name] = (int(cid), wire)
            fields.append(T.StructField(name, wire_to_spark[wire]))
        payload = T.StructType(fields)
        table_id = config.get("table-id", "tidb.table")
        table_id_num = int(config.get("table-id-num", 1))
        pks = tuple(
            k.strip() for k in str(config.get("primary-key", "")).split(",")
            if k.strip()
        )
        env = decode_cdc_events(
            spark.read.parquet(kv_file), table_id_num, table_id, info, payload
        )
        schema = Schema.from_spark_struct(payload, primary_keys=pks)
        return [TableStream(
            table_id=TableId.parse(table_id), df=env, schema=schema,
            insert_only=False,
        )]
    if not cfg.pd_addresses:
        raise SystemExit(
            "source.type=tidb requires 'pd-addresses' (live) or "
            "'kv-file' (offline replay)"
        )
    raise SystemExit(
        "source.type=tidb live mode needs a reachable PD/TiKV cluster at "
        f"{cfg.pd_addresses} and the TiKV client; neither ships in this "
        "environment. The KV-event decoder (decode_cdc_events) is "
        "available for offline use."
    )
