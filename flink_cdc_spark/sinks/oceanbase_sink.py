"""OceanBase pipeline sink: MySQL-dialect option surface over the JDBC
warehouse sink.

Reference: pipeline-connector-oceanbase OceanBaseDataSinkFactory.java
(identifier "oceanbase"; required url/username/password, optional
driver/druid/memstore-check/partition/sync-write/buffer-flush/max-retries)
and OceanBaseDataSinkOptions.java. OceanBase speaks the MySQL protocol —
the write path (DDL + staged upsert batches) is the same warehouse-sink
contract Doris/StarRocks use, so the connector here is the option surface
+ routing onto `sinks/jdbc_sink.JdbcWarehouseSink`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


def _as_bool(v, name):
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("true", "1", "yes"):
        return True
    if s in ("false", "0", "no"):
        return False
    raise ValueError(f"oceanbase option {name!r}: not a boolean: {v!r}")


def _as_float(v, name):
    try:
        return float(v)
    except (TypeError, ValueError):
        raise ValueError(f"oceanbase option {name!r}: not a number: {v!r}")


def _as_int(v, name):
    try:
        return int(v)
    except (TypeError, ValueError):
        raise ValueError(f"oceanbase option {name!r}: not an integer: {v!r}")


REQUIRED_OPTIONS = ("url", "username", "password")
OPTIONAL_OPTIONS = (
    "driver-class-name",
    "druid-properties",
    "memstore-check.enabled",
    "memstore-check.threshold",
    "memstore-check.interval",
    "partition.enabled",
    "sync-write",
    "buffer-flush.interval",
    "buffer-flush.buffer-size",
    "max-retries",
)


@dataclass
class OceanBaseSinkOptions:
    """Validated `sink: {type: oceanbase}` block."""

    url: str
    username: str
    password: str
    driver_class_name: str = "com.mysql.cj.jdbc.Driver"
    druid_properties: Optional[str] = None
    memstore_check_enabled: bool = True
    memstore_check_threshold: float = 0.9
    memstore_check_interval: int = 30000
    partition_enabled: bool = False
    sync_write: bool = False
    buffer_flush_interval: int = 1000
    buffer_size: int = 1000
    max_retries: int = 3


def validate_oceanbase_options(config: dict) -> OceanBaseSinkOptions:
    """Factory-style validation: required keys must be present, unknown
    keys are rejected (OceanBaseDataSinkFactory required/optionalOptions)."""
    known = set(REQUIRED_OPTIONS) | set(OPTIONAL_OPTIONS)
    unknown = sorted(k for k in config if k not in known and k != "name")
    if unknown:
        raise ValueError(
            f"unsupported option(s) for 'oceanbase' sink: {', '.join(unknown)}"
        )
    missing = [k for k in REQUIRED_OPTIONS if not config.get(k)]
    if missing:
        raise ValueError(
            f"'oceanbase' sink requires option(s): {', '.join(missing)}"
        )
    return OceanBaseSinkOptions(
        url=str(config["url"]),
        username=str(config["username"]),
        password=str(config["password"]),
        driver_class_name=str(
            config.get("driver-class-name", "com.mysql.cj.jdbc.Driver")
        ),
        druid_properties=config.get("druid-properties"),
        memstore_check_enabled=_as_bool(
            config.get("memstore-check.enabled", True), "memstore-check.enabled"
        ),
        memstore_check_threshold=_as_float(
            config.get("memstore-check.threshold", 0.9), "memstore-check.threshold"
        ),
        memstore_check_interval=_as_int(
            config.get("memstore-check.interval", 30000), "memstore-check.interval"
        ),
        partition_enabled=_as_bool(
            config.get("partition.enabled", False), "partition.enabled"
        ),
        sync_write=_as_bool(config.get("sync-write", False), "sync-write"),
        buffer_flush_interval=_as_int(
            config.get("buffer-flush.interval", 1000), "buffer-flush.interval"
        ),
        buffer_size=_as_int(
            config.get("buffer-flush.buffer-size", 1000), "buffer-flush.buffer-size"
        ),
        max_retries=_as_int(config.get("max-retries", 3), "max-retries"),
    )


def jdbc_url(options: OceanBaseSinkOptions) -> str:
    """The warehouse-sink JDBC url. OceanBase urls are already JDBC urls
    (MySQL protocol) — passed through verbatim."""
    return options.url
