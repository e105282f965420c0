"""Golden-spec harness: event-level assertions on the transformed changelog.

The analog of the reference's spec corpus
(flink-cdc-composer/src/test/resources/specs/*.yaml driven by
TransformSpecsITCase.java:120-390): a fixed all-types input changelog
(create, insert r1, update r1->r2, delete r2, insert r3-with-nulls,
delete r3) runs through transform pipelines and the OUTPUT EVENTS — op
plus both images, in order — are asserted, not just the final table
state. This pins per-event semantics: projection applied to both images,
filter-on-UPDATE splitting, SOFT_DELETE rewriting, metadata columns per
image. Specs are our own content (same coverage intent as the reference's
corpus, re-expressed)."""

import datetime
import decimal

import pytest

from flink_cdc_spark.core.events import CreateTableEvent, DataChangeEvent
from flink_cdc_spark.core.schema import new_schema
from flink_cdc_spark.core.table_id import TableId
from flink_cdc_spark.pipeline import parse_pipeline_yaml
from flink_cdc_spark.pipeline.composer import EventPipelineComposer

TID = TableId.parse("db.alltypes")

SCHEMA = (
    new_schema()
    .physical_column("id", "BIGINT NOT NULL")
    .physical_column("b", "BOOLEAN")
    .physical_column("ti", "TINYINT")
    .physical_column("si", "SMALLINT")
    .physical_column("i", "INT")
    .physical_column("bi", "BIGINT")
    .physical_column("f", "FLOAT")
    .physical_column("d", "DOUBLE")
    .physical_column("dec", "DECIMAL(10,2)")
    .physical_column("s", "STRING")
    .physical_column("dt", "DATE")
    .physical_column("ts", "TIMESTAMP")
    .primary_key("id")
    .build()
)

R1 = (
    1, True, 1, 10, 100, 1000, 1.5, 2.5,
    decimal.Decimal("12.34"), "alpha — ünïcode",
    datetime.date(2024, 1, 2), datetime.datetime(2024, 1, 2, 3, 4, 5),
)
R2 = (
    1, False, 2, 20, 200, 2000, 2.5, 3.5,
    decimal.Decimal("56.78"), "beta",
    datetime.date(2024, 2, 3), datetime.datetime(2024, 2, 3, 4, 5, 6),
)
R3 = (3, None, None, None, None, None, None, None, None, None, None, None)


def all_types_changelog():
    """create, +I r1, r1->r2, -D r2, +I r3(nulls), -D r3 —
    the reference suite's 6-event shape (TransformSpecsITCase.java:~181-190)."""
    return [
        CreateTableEvent(TID, SCHEMA),
        DataChangeEvent.insert(TID, R1),
        DataChangeEvent.update(TID, R1, R2),
        DataChangeEvent.delete(TID, R2),
        DataChangeEvent.insert(TID, R3),
        DataChangeEvent.delete(TID, R3),
    ]


def run_spec(spark, projection=None, filter_=None, behavior="EVOLVE"):
    lines = ["transform:", f"  - source-table: {TID}"]
    if projection:
        lines.append(f"    projection: \"{projection}\"")
    if filter_:
        lines.append(f"    filter: \"{filter_}\"")
    transform_block = "\n".join(lines) if (projection or filter_) else ""
    yaml_text = f"""
source: {{type: values}}
sink: {{type: values}}
{transform_block}
pipeline: {{execution.runtime-mode: BATCH, schema.change.behavior: {behavior}}}
"""
    composer = EventPipelineComposer(spark, parse_pipeline_yaml(yaml_text))
    return composer.run(all_types_changelog())


def rendered_events(result, table="db.alltypes"):
    """(op, before-tuple, after-tuple) in stream order."""
    env = result.changelogs[table]
    rows = sorted(env.collect(), key=lambda r: r["__seq"])
    out = []
    for r in rows:
        before = tuple(r["before"]) if r["before"] is not None else None
        after = tuple(r["after"]) if r["after"] is not None else None
        out.append((r["__op"], before, after))
    return out


def test_identity_passthrough_preserves_event_stream(spark):
    ev = rendered_events(run_spec(spark))
    assert [e[0] for e in ev] == ["INSERT", "UPDATE", "DELETE", "INSERT", "DELETE"]
    assert ev[1][1][0] == 1 and ev[1][2][0] == 1  # update keeps both images
    assert ev[3][2][1:] == tuple([None] * 11)  # null row intact


def test_projection_applies_to_both_images(spark):
    ev = rendered_events(
        run_spec(spark, projection="id, UPPER(s) AS s_up, i * 2 AS i2")
    )
    op, before, after = ev[1]  # the update
    assert op == "UPDATE"
    assert before == (1, "ALPHA — ÜNÏCODE", 200)
    assert after == (1, "BETA", 400)
    # null row: expressions propagate NULL per image
    assert ev[3][2] == (3, None, None)


def test_filter_on_update_splits(spark):
    """r1 (i=100) fails i>150, r2 (i=200) passes -> the UPDATE becomes an
    INSERT of the after image (reference §2.4 N/Y case); its later DELETE
    passes (before image i=200)."""
    ev = rendered_events(run_spec(spark, projection="id, i", filter_="i > 150"))
    assert ev == [
        ("INSERT", None, (1, 200)),     # N/Y update -> insert after image
        ("DELETE", (1, 200), None),     # delete of r2 passes the filter
    ]


def test_filter_update_yn_becomes_delete(spark):
    """r1 (i=100) passes i<150, r2 (i=200) fails -> Y/N update becomes a
    DELETE carrying the before image; the subsequent -D r2 is dropped."""
    ev = rendered_events(run_spec(spark, projection="id, i", filter_="i < 150"))
    assert ev == [
        ("INSERT", None, (1, 100)),
        ("DELETE", (1, 100), None),     # Y/N update -> delete before image
    ]


def test_metadata_column_per_image_op(spark):
    """__data_event_type__ renders -U for the before image and +U for the
    after image of one UPDATE (TransformContext.java:86)."""
    ev = rendered_events(
        run_spec(spark, projection="id, __data_event_type__ AS op_tag")
    )
    op, before, after = ev[1]
    assert op == "UPDATE"
    assert before == (1, "-U") and after == (1, "+U")
    assert ev[0][2] == (1, "+I")
    assert ev[2][1] == (1, "-D")
