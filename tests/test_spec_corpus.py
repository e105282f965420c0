"""Verbatim replay of the reference's golden spec corpus.

Loads the 12 YAML spec files the reference's TransformSpecsITCase drives
(flink-cdc-composer/src/test/resources/specs/*.yaml) straight from the
read-only reference checkout and replays every `do` item through OUR
transform pipeline: same projections/filters, same canonical all-types
changelog (create, +I r1, U r1->r2, -D r2, +I nulls, -D nulls), and
event-level assertions against the corpus' own `expect` strings
(TransformSpecsITCase.java:120-390).

Scope notes (documented skips, every one visible in the pytest report):
  * items touching types the engine does not model bit-exactly are
    skipped: TIMESTAMP(9)/TIME(6)/TIME(9) sub-microsecond precision,
    TIMESTAMP WITH TIME ZONE / TIMESTAMP_LTZ, ARRAY/MAP/ROW/VARIANT
    columns (the engine supports variant via PARSE_JSON, but the corpus'
    Java toString rendering of nested values is not worth emulating);
  * `ignore:` items are skipped exactly as the reference skips them;
  * timestamps compare at microsecond precision (Spark stores micros;
    the corpus renders Java nanos — fractions are truncated to 6 digits
    on both sides before comparison).

If the reference checkout is absent the whole module skips — the repo's
own spec tests (test_specs.py) remain self-contained.
"""

import base64
import datetime
import decimal
import re

import pytest

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

from flink_cdc_spark.core.events import CreateTableEvent, DataChangeEvent
from flink_cdc_spark.core.schema import new_schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.pipeline.composer import EventPipelineComposer
from flink_cdc_spark.pipeline.definition import (
    PipelineConfig,
    PipelineDef,
    SinkDef,
    SourceDef,
    TransformDef,
)

SPEC_DIR = "/root/reference/flink-cdc-composer/src/test/resources/specs"

pytestmark = pytest.mark.skipif(
    yaml is None or not __import__("os").path.isdir(SPEC_DIR),
    reason="reference spec corpus not available",
)

TID = TableId.parse("foo.bar.baz")

# the corpus' FULL canonical schema (TransformSpecsITCase.java testInputSchema)
# — every column modeled. Sub-microsecond digits are carried only where the
# physical model preserves them (TIMESTAMP_TZ as ISO offset strings); the
# comparison truncates timestamp fractions to microseconds on both sides.
SCHEMA = (
    new_schema()
    .physical_column("id_", "BIGINT NOT NULL")
    .physical_column("bool_", "BOOLEAN")
    .physical_column("tinyint_", "TINYINT")
    .physical_column("smallint_", "SMALLINT")
    .physical_column("int_", "INT")
    .physical_column("bigint_", "BIGINT")
    .physical_column("float_", "FLOAT")
    .physical_column("double_", "DOUBLE")
    .physical_column("decimal_10_0_", "DECIMAL(10,0)")
    .physical_column("decimal_20_2_", "DECIMAL(20,2)")
    .physical_column("char_", "CHAR(140)")
    .physical_column("varchar_", "VARCHAR(140)")
    .physical_column("string_", "STRING")
    .physical_column("binary_", "BINARY(640)")
    .physical_column("varbinary_", "VARBINARY(640)")
    .physical_column("bytes_", "BYTES")
    .physical_column("timestamp_0_", "TIMESTAMP(0)")
    .physical_column("timestamp_6_", "TIMESTAMP(6)")
    .physical_column("timestamp_9_", "TIMESTAMP(9)")
    .physical_column("timestamp_tz_0_", "TIMESTAMP_TZ(0)")
    .physical_column("timestamp_tz_6_", "TIMESTAMP_TZ(6)")
    .physical_column("timestamp_tz_9_", "TIMESTAMP_TZ(9)")
    .physical_column("timestamp_ltz_0_", "TIMESTAMP_LTZ(0)")
    .physical_column("timestamp_ltz_6_", "TIMESTAMP_LTZ(6)")
    .physical_column("timestamp_ltz_9_", "TIMESTAMP_LTZ(9)")
    .physical_column("date_", "DATE")
    .physical_column("time_0_", "TIME(0)")
    .physical_column("time_6_", "TIME(6)")
    .physical_column("time_9_", "TIME(9)")
    .physical_column("array_int_", "ARRAY<INT>")
    .physical_column("array_string_", "ARRAY<STRING>")
    .physical_column("map_int_string_", "MAP<INT, STRING>")
    .physical_column("map_string_array_string_", "MAP<STRING, ARRAY<STRING>>")
    .physical_column("complex_row_", "ROW<`name` STRING, `length` INT>")
    .physical_column("variant_", "VARIANT")
    .build()
)  # the reference's testInputSchema declares NO primary key — items set
   # one through the transform rule's primary-key field


def _b64(s):
    return base64.b64decode(s)


def _variant(json_text):
    from pyspark.sql.types import VariantVal

    return VariantVal.parseJson(json_text)


def _millis(h, m, s):
    return (h * 3600 + m * 60 + s) * 1000


R1 = (
    1, True, 2, 3, 4, 5, 7.7, 88.88,
    decimal.Decimal("1234567890"), decimal.Decimal("123456789012345678.90"),
    "Alice", "Zorro", "From A to Z is Lie",
    _b64("TG9yZW0gaXBzdW0="), _b64("ZG9sb3Igc2l0IGFtZXQ="),
    _b64("YW1ldCBjb25zZWN0ZXR1ZXI="),
    datetime.datetime(1970, 1, 2, 10, 17, 36, 789123),
    datetime.datetime(1970, 1, 3, 17, 9, 27, 891234),
    datetime.datetime(1970, 1, 5, 0, 1, 18, 912345),
    "1970-01-02T10:17:36.789123456+08:00",
    "1970-01-03T17:09:27.891234561+01:00",
    "1970-01-05T00:01:18.912345612-04:00",
    datetime.datetime(1970, 1, 2, 10, 17, 36, 789123),
    datetime.datetime(1970, 1, 3, 17, 9, 27, 891234),
    datetime.datetime(1970, 1, 5, 0, 1, 18, 912345),
    datetime.date(2000, 12, 31),
    _millis(19, 43, 17), _millis(21, 45, 3), _millis(3, 59, 59),
    [1, 1, 2, 3, 5, 8, 13],
    ["one", "one", "two", "three", "five"],
    {1: "one", 2: "two", 3: "three"},
    {"one": ["O", "N", "E"], "two": ["T", "W", "O"],
     "three": ["T", "H", "R", "E", "E"]},
    ("Alice", 5),
    _variant('{"k":1,"object":{"k":"hello"},"array":[1,2,{"kk":1.123}]}'),
)
R2 = (
    -1, False, -2, -3, -4, -5, -7.7, -88.88,
    decimal.Decimal("-9876543210"), decimal.Decimal("-987654321098765432.10"),
    "爱丽丝", "疯帽子", "天地玄黄宇宙洪荒",
    _b64("5LiA5LqM5LiJ5Zub5LqU"), _b64("5YWt5LiD5YWr5Lmd5Y2B"),
    _b64("5ZC+6Lyp44Gv54yr44Gn44GC44KL"),
    datetime.datetime(1970, 1, 9, 8, 57, 36, 789723),
    datetime.datetime(1970, 1, 10, 15, 49, 27, 891834),
    datetime.datetime(1970, 1, 11, 22, 41, 18, 912945),
    "1970-01-09T08:57:36.789723456+08:00",
    "1970-01-10T15:49:27.891834561+01:00",
    "1970-01-11T22:41:18.912945612-04:00",
    datetime.datetime(1970, 1, 9, 8, 57, 36, 789723),
    datetime.datetime(1970, 1, 10, 15, 49, 27, 891834),
    datetime.datetime(1970, 1, 11, 22, 41, 18, 912945),
    datetime.date(2001, 1, 1),
    _millis(12, 34, 45), _millis(23, 45, 7), _millis(2, 30, 5),
    [2, 3, 5, 7, 11, 13, 17, 19],
    ["二", "san", "五", "qi", "十一"],
    {1: "yi", 2: "er", 3: "san"},
    {"一": ["Y", "I"], "二": ["E", "R"], "三": ["S", "A", "N"]},
    ("Derrida", 7),
    _variant('[{"k":1},"hello",{"k":2}]'),
)
R0 = tuple([0] + [None] * (len(R1) - 1))


def changelog(non_null: bool):
    events = [
        CreateTableEvent(TID, SCHEMA),
        DataChangeEvent.insert(TID, R1),
        DataChangeEvent.update(TID, R1, R2),
        DataChangeEvent.delete(TID, R2),
    ]
    if not non_null:
        events += [DataChangeEvent.insert(TID, R0), DataChangeEvent.delete(TID, R0)]
    return events


# -- corpus loading ---------------------------------------------------------


def load_items():
    import glob
    import os

    items = []
    for path in sorted(glob.glob(os.path.join(SPEC_DIR, "*.yaml"))):
        fname = os.path.basename(path).rsplit(".", 1)[0]
        with open(path, encoding="utf-8") as f:
            for item in yaml.safe_load(f) or []:
                items.append((fname, item))
    return items


ITEMS = load_items() if __import__("os").path.isdir(SPEC_DIR) and yaml else []


def _ids():
    return [f"{f}::{i['do']}" for f, i in ITEMS]


# -- expect-string parsing --------------------------------------------------


def _depth_at(s: str, pos: int) -> int:
    """Angle/paren nesting depth just before s[pos]."""
    depth = 0
    for ch in s[:pos]:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
    return depth

_DCE = re.compile(
    r"DataChangeEvent\{tableId=(?P<tid>[^,]+), before=\[(?P<before>.*)\], "
    r"after=\[(?P<after>.*)\], op=(?P<op>[A-Z]+), meta="
)
_CTE = re.compile(r"CreateTableEvent\{tableId=(?P<tid>[^,]+), schema=columns=\{(?P<cols>.*)\}, primaryKeys=(?P<pks>[^,}]*)")


def parse_expect(expect: str):
    creates, changes = [], []
    for line in expect.splitlines():
        line = line.strip()
        m = _CTE.match(line)
        if m:
            # column names are the LEADING backticked identifier of each
            # top-level comma part — ROW field names inside <> don't count
            names = []
            depth = 0
            for part_start in [0] + [
                i + 1
                for i, ch in enumerate(m.group("cols"))
                if ch == "," and _depth_at(m.group("cols"), i) == 0
            ]:
                seg = m.group("cols")[part_start:].lstrip()
                nm = re.match(r"`([^`]+)`", seg)
                if nm:
                    names.append(nm.group(1))
            pks = [p for p in m.group("pks").split(";") if p]
            creates.append((names, pks))
            continue
        m = _DCE.match(line)
        if m:
            before = m.group("before")
            after = m.group("after")
            changes.append((m.group("op"), before, after))
    return creates, changes


def _split_values(s: str):
    if s == "":
        return None
    # split on ', ' at top level only — nested arrays/maps/rows/JSON keep
    # their commas
    parts, depth, start, i = [], 0, 0, 0
    while i < len(s):
        ch = s[i]
        if ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        elif ch == "," and depth == 0 and i + 1 < len(s) and s[i + 1] == " ":
            parts.append(s[start:i])
            i += 2
            start = i
            continue
        i += 1
    parts.append(s[start:])
    return parts


_TS_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?([+-]\d{2}:\d{2})?$"
)


def _norm(s: str) -> str:
    """Normalize a rendered scalar for comparison: timestamps (optionally
    zone-offset-suffixed) truncate to microseconds and strip trailing
    fractional zeros."""
    m = _TS_RE.match(s)
    if m:
        frac = (m.group(2) or "")[:6].rstrip("0")
        return m.group(1) + ("." + frac if frac else "") + (m.group(3) or "")
    return s


def render(v) -> str:
    """Render one of OUR values the way the corpus' Java toString does."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (datetime.date, datetime.time)):
        return str(v)
    if isinstance(v, list):
        return "[" + ", ".join(render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{render(k)} -> {render(x)}" for k, x in v.items()) + "}"
    if type(v).__name__ == "VariantVal":
        return v.toJson()
    if hasattr(v, "__fields__"):  # pyspark Row (ROW-typed column)
        parts = []
        for fname in v.__fields__:
            fv = v[fname]
            jt = {str: "STRING", int: "INT", float: "DOUBLE", bool: "BOOLEAN"}.get(
                type(fv), "STRING"
            )
            parts.append(f"{fname}: {jt} -> {render(fv)}")
        return "{" + ", ".join(parts) + "}"
    return str(v)


def _parse_java_map(s: str):
    """Parse a Java-toString map rendering '{k -> v, ...}' into a dict of
    raw strings, splitting only at top level (values may be arrays)."""
    if not (s.startswith("{") and s.endswith("}") and " -> " in s):
        return None
    inner = s[1:-1]
    entries, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        elif ch == "," and depth == 0:
            entries.append(inner[start:i])
            start = i + 1
    entries.append(inner[start:])
    out = {}
    for e in entries:
        e = e.strip()
        if " -> " not in e:
            return None
        k, _, val = e.partition(" -> ")
        out[k.strip()] = val.strip()
    return out


def _value_eq(expected: str, ours) -> bool:
    r = render(ours)
    if _norm(expected) == _norm(r):
        return True
    # numeric laxness: BigDecimal vs Spark decimal/float scale rendering
    try:
        if decimal.Decimal(expected) == decimal.Decimal(r):
            return True
    except (decimal.InvalidOperation, ValueError):
        pass
    # FLOAT columns collect as f64-widened f32 (8.7f -> 8.699999809...):
    # compare at float32 precision, the column's actual width
    try:
        import numpy as np

        if np.float32(float(expected)) == np.float32(float(r)):
            return True
    except (ValueError, TypeError):
        pass
    # Java-toString map renders iterate in hash order — compare as dicts
    ma, mb = _parse_java_map(_norm(expected)), _parse_java_map(_norm(r))
    if ma is not None and mb is not None:
        return ma == mb
    # JSON-valued strings (variant renders): compare parsed objects —
    # Spark escapes non-ASCII as \uXXXX, Java renders raw
    try:
        import json

        a, b = json.loads(expected), json.loads(r)
        return isinstance(a, (dict, list)) and a == b
    except (ValueError, TypeError):
        return False


# Documented engine/reference divergences — each one a deliberate choice,
# asserted here so a behavior change surfaces as a test delta.
# (The DECIMAL p=19 clamp and SUBSTRING OOB divergences were closed in
# round 6: the compiler now implements the reference's storage-boundary
# decimal semantics and the negative-length substring guard.)
DIVERGENCES: dict = {
    # Timestamps are physically micros (Spark TIMESTAMP_NTZ); a 9-S
    # SimpleDateFormat pattern renders .SSSSSS000 where the reference
    # renders the stored nanos — the only surface where sub-microsecond
    # precision is observable outside ISO renders (those compare truncated)
    "temporal::Formatting TIMESTAMP(9) with Timezone":
        "9-digit fraction pattern exposes sub-microsecond digits the micros model drops",
    "temporal::Formatting TIMESTAMP_LTZ(9) with Timezone":
        "9-digit fraction pattern exposes sub-microsecond digits the micros model drops",
}


# -- the runner -------------------------------------------------------------


def run_item(spark, item):
    projection = item.get("projection")
    if projection:
        projection = ", ".join(
            ln.strip() for ln in projection.splitlines() if ln.strip()
        )
    transform = TransformDef(
        source_table="foo.bar.baz",
        projection=projection,
        filter=item.get("filter"),
        primary_keys=tuple(
            k.strip() for k in (item.get("primary-key") or "").split(",") if k.strip()
        ),
        converter_after_transform=item.get("converters"),
    )
    pipeline = PipelineDef(
        source=SourceDef(type="values"),
        sink=SinkDef(type="values"),
        transforms=[transform],
        config=PipelineConfig(
            runtime_mode="BATCH",
            schema_change_behavior="EVOLVE",
            local_time_zone=item.get("time-zone") or "UTC",
        ),
    )
    composer = EventPipelineComposer(spark, pipeline)
    non_null = str(item.get("non-null", "")).lower() == "true"
    return composer.run(changelog(non_null))


@pytest.mark.parametrize("fname,item", ITEMS, ids=_ids())
def test_spec_corpus(spark, fname, item):
    if item.get("ignore"):
        pytest.skip(f"reference ignores this item: {item['ignore']}")
    key = f"{fname}::{item['do']}"
    if key in DIVERGENCES:
        pytest.skip(f"documented divergence: {DIVERGENCES[key]}")
    if "expect-error" in item:
        with pytest.raises(Exception):
            result = run_item(spark, item)
            result.changelogs["foo.bar.baz"].collect()
        return

    creates, changes = parse_expect(item.get("expect") or "")
    result = run_item(spark, item)
    env = result.changelogs["foo.bar.baz"]

    if creates:
        exp_names, exp_pks = creates[0]
        schema = result.schemas["foo.bar.baz"]
        assert [c.name for c in schema.columns] == exp_names
        assert list(schema.primary_keys) == exp_pks

    # TIME columns are physically millis-of-day ints — format them the way
    # java.time.LocalTime.toString does, using the logical schema to find them
    out_schema = result.schemas.get("foo.bar.baz")
    roots = [c.type.root for c in out_schema.columns] if out_schema else []

    def _fmt_time(ms):
        sec, frac = divmod(int(ms), 1000)
        base = f"{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}"
        return base + (f".{frac:03d}" if frac else "")

    def _conv_image(vals):
        if vals is None:
            return None
        return tuple(
            _fmt_time(v) if v is not None and i < len(roots) and roots[i] == "TIME"
            else v
            for i, v in enumerate(vals)
        )

    rows = sorted(env.collect(), key=lambda r: r["__seq"])
    got = []
    for r in rows:
        before = _conv_image(tuple(r["before"]) if r["before"] is not None else None)
        after = _conv_image(tuple(r["after"]) if r["after"] is not None else None)
        got.append((r["__op"], before, after))
    assert len(got) == len(changes), (
        f"event count: ours {[(g[0]) for g in got]} vs corpus {[c[0] for c in changes]}"
    )
    for (op_e, before_e, after_e), (op_g, before_g, after_g) in zip(changes, got):
        op_map = {"INSERT": "INSERT", "UPDATE": "UPDATE", "DELETE": "DELETE",
                  "REPLACE": "REPLACE"}
        assert op_map[op_e] == op_g
        for exp_s, ours in ((before_e, before_g), (after_e, after_g)):
            exp_vals = _split_values(exp_s)
            if exp_vals is None:
                assert ours is None, f"expected no image, got {ours}"
                continue
            assert ours is not None, f"expected image {exp_vals}, got None"
            assert len(exp_vals) == len(ours), (exp_vals, [render(v) for v in ours])
            for e, o in zip(exp_vals, ours):
                assert _value_eq(e, o), (
                    f"value mismatch: corpus {e!r} vs ours {render(o)!r} "
                    f"(row: corpus {exp_vals} vs ours {[render(v) for v in ours]})"
                )
