"""CDC logical type system and its mapping onto Spark SQL types.

Models the 22 concrete DataTypes of the reference
(flink-cdc-common/src/main/java/org/apache/flink/cdc/common/types/DataTypes.java:41-426)
as a light dataclass; the physical representation is always Spark's
(Tungsten UnsafeRow) — we only keep logical semantics (nullability,
precision/scale/length) plus the widening lattice used by schema merging
(SchemaMergingUtils.getLeastCommonType, see schema_evolution.py).

Spark mapping decisions (SURVEY.md §1.3):
    TIME(p)            -> integer millis-of-day (precision kept in the logical type)
    TIMESTAMP(p)       -> timestamp_ntz
    TIMESTAMP_LTZ(p)   -> timestamp
    TIMESTAMP_TZ(p)    -> string (ISO-8601 with offset, offset preserved)
    VARIANT            -> Spark VariantType when available, else JSON string
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Type roots (reference: common/types/DataTypeRoot.java)
# ---------------------------------------------------------------------------

BOOLEAN = "BOOLEAN"
TINYINT = "TINYINT"
SMALLINT = "SMALLINT"
INT = "INT"
BIGINT = "BIGINT"
FLOAT = "FLOAT"
DOUBLE = "DOUBLE"
DECIMAL = "DECIMAL"
CHAR = "CHAR"
VARCHAR = "VARCHAR"  # STRING == VARCHAR(MAX)
BINARY = "BINARY"
VARBINARY = "VARBINARY"  # BYTES == VARBINARY(MAX)
DATE = "DATE"
TIME = "TIME"
TIMESTAMP = "TIMESTAMP"  # without time zone
TIMESTAMP_TZ = "TIMESTAMP_TZ"  # offset-preserving
TIMESTAMP_LTZ = "TIMESTAMP_LTZ"  # instant
ARRAY = "ARRAY"
MAP = "MAP"
ROW = "ROW"
VARIANT = "VARIANT"

MAX_LENGTH = 0x7FFFFFFF
DEFAULT_PRECISION = 6

_NUMERIC_ROOTS = {TINYINT, SMALLINT, INT, BIGINT, FLOAT, DOUBLE, DECIMAL}
_CHARACTER_ROOTS = {CHAR, VARCHAR}
_BINARY_ROOTS = {BINARY, VARBINARY}
_TIMESTAMP_ROOTS = {TIMESTAMP, TIMESTAMP_TZ, TIMESTAMP_LTZ}

# exact-numeric widening order (used by the merge lattice)
_EXACT_NUMERIC_ORDER = [TINYINT, SMALLINT, INT, BIGINT]


@dataclass(frozen=True)
class DataType:
    root: str
    nullable: bool = True
    precision: Optional[int] = None  # DECIMAL / TIME / TIMESTAMP*
    scale: Optional[int] = None  # DECIMAL
    length: Optional[int] = None  # CHAR/VARCHAR/BINARY/VARBINARY
    element: Optional["DataType"] = None  # ARRAY
    key: Optional["DataType"] = None  # MAP
    value: Optional["DataType"] = None  # MAP
    fields: tuple = field(default=())  # ROW: tuple[(name, DataType), ...]

    # -- predicates ---------------------------------------------------------
    def is_numeric(self) -> bool:
        return self.root in _NUMERIC_ROOTS

    def is_character(self) -> bool:
        return self.root in _CHARACTER_ROOTS

    def is_binary(self) -> bool:
        return self.root in _BINARY_ROOTS

    def is_timestamp(self) -> bool:
        return self.root in _TIMESTAMP_ROOTS

    def not_null(self) -> "DataType":
        return replace(self, nullable=False)

    def null(self) -> "DataType":
        return replace(self, nullable=True)

    def __str__(self) -> str:
        s = self.root
        if self.root == DECIMAL:
            s = f"DECIMAL({self.precision}, {self.scale})"
        elif self.root in (CHAR, VARCHAR, BINARY, VARBINARY):
            if self.length == MAX_LENGTH:
                s = "STRING" if self.root == VARCHAR else ("BYTES" if self.root == VARBINARY else s)
            else:
                s = f"{self.root}({self.length})"
        elif self.root in (TIME, *_TIMESTAMP_ROOTS):
            s = f"{self.root}({self.precision})"
        elif self.root == ARRAY:
            s = f"ARRAY<{self.element}>"
        elif self.root == MAP:
            s = f"MAP<{self.key}, {self.value}>"
        elif self.root == ROW:
            inner = ", ".join(f"`{n}` {t}" for n, t in self.fields)
            s = f"ROW<{inner}>"
        if not self.nullable:
            s += " NOT NULL"
        return s


# -- factories (reference: DataTypes.java) ----------------------------------


def boolean() -> DataType:
    return DataType(BOOLEAN)


def tinyint() -> DataType:
    return DataType(TINYINT)


def smallint() -> DataType:
    return DataType(SMALLINT)


def int_() -> DataType:
    return DataType(INT)


def bigint() -> DataType:
    return DataType(BIGINT)


def float_() -> DataType:
    return DataType(FLOAT)


def double() -> DataType:
    return DataType(DOUBLE)


def decimal(precision: int, scale: int) -> DataType:
    if not (1 <= precision <= 38):
        raise ValueError(f"DECIMAL precision must be in [1, 38], got {precision}")
    if not (0 <= scale <= precision):
        raise ValueError(f"DECIMAL scale must be in [0, precision], got {scale}")
    return DataType(DECIMAL, precision=precision, scale=scale)


def char(length: int) -> DataType:
    return DataType(CHAR, length=length)


def varchar(length: int) -> DataType:
    return DataType(VARCHAR, length=length)


def string() -> DataType:
    return DataType(VARCHAR, length=MAX_LENGTH)


def binary(length: int) -> DataType:
    return DataType(BINARY, length=length)


def varbinary(length: int) -> DataType:
    return DataType(VARBINARY, length=length)


def bytes_() -> DataType:
    return DataType(VARBINARY, length=MAX_LENGTH)


def date() -> DataType:
    return DataType(DATE)


def time(precision: int = 0) -> DataType:
    return DataType(TIME, precision=precision)


def timestamp(precision: int = DEFAULT_PRECISION) -> DataType:
    return DataType(TIMESTAMP, precision=precision)


def timestamp_tz(precision: int = DEFAULT_PRECISION) -> DataType:
    return DataType(TIMESTAMP_TZ, precision=precision)


def timestamp_ltz(precision: int = DEFAULT_PRECISION) -> DataType:
    return DataType(TIMESTAMP_LTZ, precision=precision)


def array(element: DataType) -> DataType:
    return DataType(ARRAY, element=element)


def map_(key: DataType, value: DataType) -> DataType:
    return DataType(MAP, key=key, value=value)


def row(*fields_: tuple) -> DataType:
    return DataType(ROW, fields=tuple(fields_))


def variant() -> DataType:
    return DataType(VARIANT)


# ---------------------------------------------------------------------------
# CDC type <-> Spark type
# ---------------------------------------------------------------------------

_HAS_VARIANT = hasattr(T, "VariantType")


def to_spark_type(dt: DataType) -> T.DataType:
    r = dt.root
    if r == BOOLEAN:
        return T.BooleanType()
    if r == TINYINT:
        return T.ByteType()
    if r == SMALLINT:
        return T.ShortType()
    if r == INT:
        return T.IntegerType()
    if r == BIGINT:
        return T.LongType()
    if r == FLOAT:
        return T.FloatType()
    if r == DOUBLE:
        return T.DoubleType()
    if r == DECIMAL:
        return T.DecimalType(dt.precision, dt.scale)
    if r in (CHAR, VARCHAR):
        return T.StringType()
    if r in (BINARY, VARBINARY):
        return T.BinaryType()
    if r == DATE:
        return T.DateType()
    if r == TIME:
        return T.IntegerType()  # millis-of-day
    if r == TIMESTAMP:
        return T.TimestampNTZType()
    if r == TIMESTAMP_LTZ:
        return T.TimestampType()
    if r == TIMESTAMP_TZ:
        return T.StringType()  # ISO-8601 with offset, offset preserved
    if r == ARRAY:
        return T.ArrayType(to_spark_type(dt.element), dt.element.nullable)
    if r == MAP:
        return T.MapType(to_spark_type(dt.key), to_spark_type(dt.value), dt.value.nullable)
    if r == ROW:
        return T.StructType(
            [T.StructField(n, to_spark_type(t), t.nullable) for n, t in dt.fields]
        )
    if r == VARIANT:
        return T.VariantType() if _HAS_VARIANT else T.StringType()
    raise ValueError(f"No Spark mapping for CDC type {dt}")


def from_spark_type(st: T.DataType, nullable: bool = True) -> DataType:
    m: DataType
    if isinstance(st, T.BooleanType):
        m = boolean()
    elif isinstance(st, T.ByteType):
        m = tinyint()
    elif isinstance(st, T.ShortType):
        m = smallint()
    elif isinstance(st, T.IntegerType):
        m = int_()
    elif isinstance(st, T.LongType):
        m = bigint()
    elif isinstance(st, T.FloatType):
        m = float_()
    elif isinstance(st, T.DoubleType):
        m = double()
    elif isinstance(st, T.DecimalType):
        m = decimal(st.precision, st.scale)
    elif isinstance(st, T.StringType):
        m = string()
    elif isinstance(st, T.BinaryType):
        m = bytes_()
    elif isinstance(st, T.DateType):
        m = date()
    elif isinstance(st, T.TimestampNTZType):
        m = timestamp(6)
    elif isinstance(st, T.TimestampType):
        m = timestamp_ltz(6)
    elif isinstance(st, T.ArrayType):
        m = array(from_spark_type(st.elementType, st.containsNull))
    elif isinstance(st, T.MapType):
        m = map_(from_spark_type(st.keyType, False), from_spark_type(st.valueType, st.valueContainsNull))
    elif isinstance(st, T.StructType):
        m = row(*[(f.name, from_spark_type(f.dataType, f.nullable)) for f in st.fields])
    elif _HAS_VARIANT and isinstance(st, T.VariantType):
        m = variant()
    else:
        raise ValueError(f"No CDC mapping for Spark type {st}")
    return m if nullable else m.not_null()


# ---------------------------------------------------------------------------
# Type parsing ("BIGINT", "DECIMAL(10, 2)", "ARRAY<INT>", ...)
# ---------------------------------------------------------------------------

_SIMPLE = {
    "BOOLEAN": boolean,
    "TINYINT": tinyint,
    "BYTE": tinyint,
    "SMALLINT": smallint,
    "SHORT": smallint,
    "INT": int_,
    "INTEGER": int_,
    "BIGINT": bigint,
    "LONG": bigint,
    "FLOAT": float_,
    "DOUBLE": double,
    "STRING": string,
    "BYTES": bytes_,
    "DATE": date,
    "VARIANT": variant,
}


def parse_type(s: str) -> DataType:
    """Parse a CDC type string (as used in YAML / CAST targets)."""
    text = s.strip()
    upper = text.upper()
    not_null = False
    if upper.endswith("NOT NULL"):
        not_null = True
        text = text[: len(text) - 8].strip()
        upper = text.upper()
    dt = _parse_inner(text, upper)
    return dt.not_null() if not_null else dt


def _parse_inner(text: str, upper: str) -> DataType:
    if upper in _SIMPLE:
        return _SIMPLE[upper]()
    # SQL-standard spelling: TIMESTAMP(p) WITH [LOCAL] TIME ZONE
    if upper.endswith("WITH TIME ZONE"):
        inner = parse_type(text[: len(text) - len("WITH TIME ZONE")].strip())
        return timestamp_tz(inner.precision if inner.precision is not None else 6)
    if upper.endswith("WITH LOCAL TIME ZONE"):
        inner = parse_type(text[: len(text) - len("WITH LOCAL TIME ZONE")].strip())
        return timestamp_ltz(inner.precision if inner.precision is not None else 6)
    if upper.startswith("ROW<") and upper.endswith(">"):
        fields_ = []
        for part in _split_all_top_level(text[4:-1]):
            # `name` TYPE  (backticks optional)
            part = part.strip()
            if part.startswith("`"):
                close = part.index("`", 1)
                fname, ftype = part[1:close], part[close + 1 :].strip()
            else:
                fname, ftype = part.split(None, 1)
            fields_.append((fname, parse_type(ftype)))
        return row(*fields_)
    if upper in ("TIMESTAMP", "DATETIME"):
        return timestamp()
    if upper == "TIMESTAMP_LTZ":
        return timestamp_ltz()
    if upper == "TIMESTAMP_TZ":
        return timestamp_tz()
    if upper == "TIME":
        return time()
    if upper in ("CHAR", "VARCHAR"):
        return char(1) if upper == "CHAR" else string()
    if upper in ("BINARY", "VARBINARY"):
        return binary(1) if upper == "BINARY" else bytes_()
    if upper in ("DECIMAL", "NUMERIC"):
        return decimal(10, 0)
    if "(" in text and text.endswith(")"):
        head, args_s = text.split("(", 1)
        head_u = head.strip().upper()
        args = [a.strip() for a in args_s[:-1].split(",")]
        if head_u in ("DECIMAL", "NUMERIC"):
            p = int(args[0])
            sc = int(args[1]) if len(args) > 1 else 0
            return decimal(p, sc)
        if head_u == "CHAR":
            return char(int(args[0]))
        if head_u == "VARCHAR":
            return varchar(int(args[0]))
        if head_u == "BINARY":
            return binary(int(args[0]))
        if head_u == "VARBINARY":
            return varbinary(int(args[0]))
        if head_u == "TIME":
            return time(int(args[0]))
        if head_u in ("TIMESTAMP", "DATETIME"):
            return timestamp(int(args[0]))
        if head_u == "TIMESTAMP_LTZ":
            return timestamp_ltz(int(args[0]))
        if head_u == "TIMESTAMP_TZ":
            return timestamp_tz(int(args[0]))
    if upper.startswith("ARRAY<") and upper.endswith(">"):
        return array(parse_type(text[6:-1]))
    if upper.startswith("MAP<") and upper.endswith(">"):
        inner = text[4:-1]
        k, v = _split_top_level(inner)
        return map_(parse_type(k), parse_type(v))
    raise ValueError(f"Cannot parse CDC type: {text!r}")


def _split_all_top_level(s: str) -> list:
    """Split on every top-level comma (ROW field lists)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    parts.append(s[start:].strip())
    return parts


def _split_top_level(s: str) -> tuple:
    depth = 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i].strip(), s[i + 1 :].strip()
    raise ValueError(f"Expected two comma-separated types in {s!r}")
