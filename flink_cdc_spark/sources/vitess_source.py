"""Vitess CDC source surface: options, VGTID offset algebra, VStream decode.

The Spark rendition of the reference's Vitess connector
(flink-connector-vitess-cdc — a thin wrapper over the Debezium Vitess
connector: VitessSource.java:258-276 builds Debezium properties,
VitessTableFactory.java:43-129 the option surface). No vtgate ships in
this environment, so the live branch fails fast; the substantive pieces
are real and tested:

* **VGTID offset algebra** — a Vitess position is a per-shard map of
  GTID sets (`[{"keyspace":..,"shard":"-80","gtid":"MySQL56/uuid:1-5"}]`).
  ``GtidSet`` implements interval-set parse/contains/union with MySQL's
  semantics (sorted disjoint intervals per server-uuid); ``Vgtid``
  wraps the per-shard map. This is what startup-from-VGTID filtering
  and checkpoint resume depend on.
* **VStream decode** — Debezium-vitess change records (before/after/op
  with a source struct carrying keyspace/table/shard/vgtid and the
  transaction gtid) decode to the changelog envelope with built-in
  expressions only; events whose transaction is already contained in
  the start VGTID are dropped (the resume contract), per shard.

Sharded execution: each shard's stream is independently ordered —
``__seq`` is (shard-local transaction id), and ``__meta`` carries the
shard so per-key ordering stays within a shard exactly like VStream's
per-shard delivery.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .gtid import GtidSet  # shared MySQL56 GTID algebra (sources/gtid.py)
from .envelope import (
    ENVELOPE_META,
    ENVELOPE_OP,
    ENVELOPE_SEQ,
    ENVELOPE_TABLE_ID,
    OP_DELETE,
    OP_INSERT,
    OP_REPLACE,
    OP_UPDATE,
)

TABLET_TYPES = ("MASTER", "REPLICA", "RDONLY")


# ---------------------------------------------------------------------------
# GTID set / VGTID algebra
# ---------------------------------------------------------------------------

@dataclass
class Vgtid:
    """Per-shard GTID positions — the VStream resume token."""

    shards: Dict[str, GtidSet] = field(default_factory=dict)
    keyspace: str = ""

    @classmethod
    def parse(cls, text: str) -> "Vgtid":
        data = json.loads(text)
        if not isinstance(data, list):
            raise ValueError("VGTID must be a JSON array of shard positions")
        shards, keyspace = {}, ""
        for entry in data:
            keyspace = entry.get("keyspace", keyspace)
            shards[entry["shard"]] = GtidSet.parse(entry.get("gtid", ""))
        return cls(shards, keyspace)

    def format(self) -> str:
        return json.dumps(
            [
                {"keyspace": self.keyspace, "shard": s,
                 "gtid": f"MySQL56/{g.format()}" if g.intervals else "current"}
                for s, g in sorted(self.shards.items())
            ]
        )

    def covers(self, shard: str, uuid: str, txid: int) -> bool:
        g = self.shards.get(shard)
        return g is not None and g.contains(uuid, txid)


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------


@dataclass
class VitessSourceConfig:
    """`vitess-cdc` options (VitessTableFactory.java:43-129)."""

    hostname: str = ""
    port: int = 15991
    keyspace: str = ""
    username: str = ""
    password: str = ""
    shard: str = ""
    gtid: str = "current"
    stop_on_reshard: bool = False
    tombstones_on_delete: bool = True
    schema_name_adjustment_mode: str = "avro"
    tablet_type: str = "RDONLY"
    table_name: str = ""
    decoding_plugin_name: str = "decoderbufs"
    name: str = "flink"

    @classmethod
    def from_dict(cls, config: dict) -> "VitessSourceConfig":
        tablet = str(config.get("tablet-type", "RDONLY")).upper()
        if tablet not in TABLET_TYPES:
            raise ValueError(
                f"tablet-type must be one of {TABLET_TYPES}, got {tablet!r}"
            )
        return cls(
            hostname=config.get("hostname", ""),
            port=int(config.get("port", 15991)),
            keyspace=config.get("keyspace", ""),
            username=config.get("username", ""),
            password=config.get("password", ""),
            shard=config.get("vitess.shard", ""),
            gtid=config.get("vitess.gtid", "current"),
            stop_on_reshard=str(
                config.get("vitess.stop_on_reshard", "false")
            ).lower() == "true",
            tombstones_on_delete=str(
                config.get("tombstones.on.delete", "true")
            ).lower() == "true",
            schema_name_adjustment_mode=config.get(
                "schema.name.adjustment.mode", "avro"
            ),
            tablet_type=tablet,
            table_name=config.get("table-name", ""),
            decoding_plugin_name=config.get("decoding.plugin.name", "decoderbufs"),
            name=config.get("name", "flink"),
        )


# ---------------------------------------------------------------------------
# VStream decode
# ---------------------------------------------------------------------------


def decode_vstream(
    records: DataFrame,
    payload: T.StructType,
    *,
    start_vgtid: Optional[Vgtid] = None,
    value_col: str = "value",
) -> DataFrame:
    """Debezium-vitess change records -> changelog envelope.

    Value shape (Debezium Vitess connector): ``{"before":.., "after":..,
    "op": c|u|d|r, "source": {"keyspace":.., "table":.., "shard":..,
    "gtid": "uuid:txid"}}``. Events whose transaction the ``start_vgtid``
    already contains are dropped per shard (resume semantics). Pure
    built-in expressions: the VGTID filter compiles to a per-shard
    interval predicate, not a UDF."""
    doc_schema = T.StructType(
        [
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("op", T.StringType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("keyspace", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                        T.StructField("shard", T.StringType(), True),
                        T.StructField("gtid", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    doc = F.from_json(F.col(value_col), doc_schema).alias("d")
    parsed = records.select(doc)
    uuid = F.split(F.col("d.source.gtid"), ":").getItem(0)
    txid = F.split(F.col("d.source.gtid"), ":").getItem(1).cast("long")
    if start_vgtid is not None and start_vgtid.shards:
        covered = F.lit(False)
        for shard, gset in start_vgtid.shards.items():
            for u, ivs in gset.intervals.items():
                for lo, hi in ivs:
                    covered = covered | (
                        (F.col("d.source.shard") == shard)
                        & (uuid == u)
                        & (txid >= lo)
                        & (txid <= hi)
                    )
        parsed = parsed.where(~covered)
    op = (
        F.when(F.col("d.op") == "c", OP_INSERT)
        .when(F.col("d.op") == "u", OP_UPDATE)
        .when(F.col("d.op") == "d", OP_DELETE)
        .otherwise(OP_REPLACE)
    )
    return parsed.select(
        F.concat_ws(".", F.col("d.source.keyspace"), F.col("d.source.table")).alias(
            ENVELOPE_TABLE_ID
        ),
        op.alias(ENVELOPE_OP),
        F.col("d.before").alias("before"),
        F.col("d.after").alias("after"),
        F.create_map(
            F.lit("shard"), F.col("d.source.shard"),
            F.lit("gtid"), F.col("d.source.gtid"),
        ).alias(ENVELOPE_META),
        txid.alias(ENVELOPE_SEQ),
    )


def vitess_streams(spark: SparkSession, config: dict):
    """CLI resolver for `type: vitess`. `vstream-file` (text, one
    Debezium-vitess record per line) runs the offline replay — payload
    schema inferred from the records' images, `vitess.gtid` (a VGTID
    JSON) resumes past covered transactions. Live mode needs a reachable
    vtgate VStream endpoint — none ships here."""
    cfg = VitessSourceConfig.from_dict(config)
    stream_file = config.get("vstream-file")
    if stream_file:
        from ..core.schema import Schema
        from ..core.table_id import TableId
        from ..pipeline.composer import TableStream

        raw = spark.read.text(stream_file)
        # .rdd = the PySpark spelling of the Dataset[String] JSON-
        # inference API — a one-off control-plane schema pass, not a
        # data-plane RDD op
        inferred = spark.read.json(raw.rdd.map(lambda r: r["value"]))
        after_t = dict(
            (f.name, f.dataType) for f in inferred.schema.fields
        ).get("after")
        if after_t is None:
            raise SystemExit(
                "vstream-file records carry no 'after' images to infer from"
            )
        payload = T.StructType(sorted(after_t.fields, key=lambda f: f.name))
        start = None
        if cfg.gtid and cfg.gtid != "current":
            start = Vgtid.parse(cfg.gtid)
        env = decode_vstream(raw, payload, start_vgtid=start)
        table_id = config.get("table-id", f"{cfg.keyspace or 'ks'}.table")
        pks = tuple(
            k.strip() for k in str(config.get("primary-key", "")).split(",")
            if k.strip()
        )
        schema = Schema.from_spark_struct(payload, primary_keys=pks)
        return [TableStream(
            table_id=TableId.parse(table_id), df=env, schema=schema,
            insert_only=False,
        )]
    if not cfg.hostname or not cfg.keyspace:
        raise SystemExit(
            "source.type=vitess requires 'hostname' and 'keyspace' (live) "
            "or 'vstream-file' (offline replay)"
        )
    raise SystemExit(
        "source.type=vitess live mode needs a reachable vtgate VStream "
        f"endpoint at {cfg.hostname}:{cfg.port} (keyspace {cfg.keyspace}); "
        "none ships in this environment. The VStream decoder "
        "(decode_vstream) is available for offline use."
    )
