"""Generation-aware rename translation in the LSM store (r14; the r13
flattened chase map corrupted NAME REUSE across rename generations —
ADVICE r13 high/medium).

Scenarios pinned here, each one a concrete corruption of the flattened
map this rewrite removes:

  * RENAME a->b then RENAME c->a: a forward merge addressing the LIVE
    reintroduced `a` must write under `a` (the chase map sent it to b —
    silent cross-column corruption).
  * A fresh re-ADD of a renamed-away name must land literally (the
    chase map silently dropped it).
  * A single-event swap [(a,b),(b,a)] is simultaneous, both in the
    manifest schema and on the read path (the chase map produced
    duplicate out names).
  * A crash-replayed merge carrying an OLD generation's full column set
    translates through exactly the rename events after its generation —
    even when one of its names has since been reintroduced as a
    different live column.
  * A replayed ADD whose column was since renamed (same foreachBatch
    epoch) is a no-op, while the same-named ADD arriving under a LATER
    epoch is a fresh re-ADD.
  * A replayed pre-rename merge must not regress manifest pks to the
    stale name (ADVICE r13 medium).
"""

from pyspark.sql import types as T

from flink_cdc_spark.sinks.lsm_store import LsmStateStore
from flink_cdc_spark.sources.envelope import wrap_as_inserts


def _store(spark, tmp_path, **kw):
    return LsmStateStore(spark, str(tmp_path / "lsm"), **kw)


def _struct(*cols):
    return T.StructType([T.StructField(n, t, True) for n, t in cols])


def _merge(store, spark, table, struct, rows, pks=("id",)):
    df = spark.createDataFrame(rows, struct)
    store.merge(table, wrap_as_inserts(df, table), struct, list(pks))


S_ID_A = _struct(("id", T.LongType()), ("a", T.StringType()))
S_ID_A_C = _struct(("id", T.LongType()), ("a", T.StringType()),
                   ("c", T.StringType()))


def test_live_reintroduced_name_gets_own_data(spark, tmp_path):
    """RENAME a->b, RENAME c->a: forward merges address the live a."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A_C, [(1, "a-val", "c-val")])
    st.rename_columns("db.t", [("a", "b")])
    st.rename_columns("db.t", [("c", "a")])
    cur = _struct(("id", T.LongType()), ("b", T.StringType()),
                  ("a", T.StringType()))
    _merge(st, spark, "db.t", cur, [(2, "b2", "a2")])
    rows = {r.id: (r.b, r.a) for r in st.read("db.t").collect()}
    assert rows == {1: ("a-val", "c-val"), 2: ("b2", "a2")}


def test_fresh_re_add_of_renamed_away_name_lands(spark, tmp_path):
    """ADD of a name an older generation renamed away is a literal add."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "old-a")])
    st.rename_columns("db.t", [("a", "b")])
    st.add_columns("db.t", [("a", T.LongType())])
    out = st.read("db.t")
    assert out.columns == ["id", "b", "a"]
    r = out.collect()[0]
    assert (r.id, r.b, r.a) == (1, "old-a", None)


def test_single_event_swap_is_simultaneous(spark, tmp_path):
    st = _store(spark, tmp_path)
    struct = _struct(("id", T.LongType()), ("a", T.StringType()),
                     ("b", T.StringType()))
    _merge(st, spark, "db.t", struct, [(1, "was-a", "was-b")])
    st.rename_columns("db.t", [("a", "b"), ("b", "a")])
    out = st.read("db.t")
    assert sorted(out.columns) == ["a", "b", "id"]
    r = out.collect()[0]
    assert (r.a, r.b) == ("was-b", "was-a")
    # forward merge under the swapped names stays put
    _merge(st, spark, "db.t", struct, [(2, "a2", "b2")])
    rows = {x.id: (x.a, x.b) for x in st.read("db.t").collect()}
    assert rows[2] == ("a2", "b2")


def test_replayed_old_generation_merge_translates_by_generation(
    spark, tmp_path
):
    """A replayed merge whose full name set matches an OLD generation
    translates through only the renames after that generation — even
    though one of its names (`a`) is ALSO a live reintroduced column."""
    st = _store(spark, tmp_path)
    gen0 = _struct(("id", T.LongType()), ("a", T.StringType()),
                   ("x", T.StringType()))
    _merge(st, spark, "db.t", gen0, [(1, "a1", "x1")])
    st.rename_columns("db.t", [("a", "b")])
    st.rename_columns("db.t", [("x", "y")])
    st.add_columns("db.t", [("c", T.StringType())])
    st.rename_columns("db.t", [("c", "a")])
    # crash-replay: the writer re-merges with its own (gen-0) schema
    _merge(st, spark, "db.t", gen0, [(1, "a1", "x1")])
    out = st.read("db.t")
    assert set(out.columns) == {"id", "b", "y", "a"}
    r = out.collect()[0]
    # gen-0 `a` landed in b, gen-0 `x` in y; the live `a` stays NULL
    assert (r.b, r.y, r.a) == ("a1", "x1", None)


def test_replayed_add_then_rename_skips_fresh_epoch_readds(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.begin_epoch(5)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    st.add_columns("db.t", [("z", T.LongType())])
    st.rename_columns("db.t", [("z", "w")])
    # crash-replay of the same batch: the ADD re-delivers under epoch 5
    st.begin_epoch(5)
    st.add_columns("db.t", [("z", T.LongType())])
    assert set(st.read("db.t").columns) == {"id", "a", "w"}
    # a later epoch's ADD of the same name is a genuine fresh re-ADD
    st.begin_epoch(6)
    st.add_columns("db.t", [("z", T.LongType())])
    assert set(st.read("db.t").columns) == {"id", "a", "w", "z"}


def test_replayed_pre_rename_merge_keeps_translated_pks(spark, tmp_path):
    """ADVICE r13 medium: a replayed merge carrying stale pk names must
    not regress manifest pks — the next read()'s window would reference
    a column absent from the schema."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v1")])
    st.rename_columns("db.t", [("id", "key")])
    # crash-replayed pre-rename merge, addressed by the OLD pk name
    _merge(st, spark, "db.t", S_ID_A, [(1, "v2")], pks=("id",))
    assert st._load("db.t")["pks"] == ["key"]
    rows = {r.key: r.a for r in st.read("db.t").collect()}
    assert rows == {1: "v2"}


def test_positioned_add_orders_manifest_schema(spark, tmp_path):
    """FIRST/BEFORE/AFTER anchors reach the manifest schema order
    (SchemaUtils applyAddColumnEvent; ADVICE r13 low)."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    st.add_columns("db.t", [("lead", T.LongType(), "FIRST", None)])
    st.add_columns("db.t", [("mid", T.LongType(), "AFTER", "id")])
    st.add_columns("db.t", [("pre", T.LongType(), "BEFORE", "a")])
    assert st.read("db.t").columns == ["lead", "id", "mid", "pre", "a"]


def test_replayed_rename_after_fresh_readd_noops(spark, tmp_path):
    """ADVICE r14 medium: a crash-replayed batch carrying RENAME a->b
    followed by a re-ADD of `a` must converge — the replayed rename sees
    the re-added `a` live and, before the fix, re-applied, leaving the
    schema ['id','b','b'] (duplicate b, a lost). The rename must no-op
    when its NEW name already exists and is not part of a swap."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    # first delivery of the batch
    st.rename_columns("db.t", [("a", "b")])
    st.add_columns("db.t", [("a", T.LongType())])
    assert st.read("db.t").columns == ["id", "b", "a"]
    # crash replay: the same rename + add re-deliver in order
    st.rename_columns("db.t", [("a", "b")])
    st.add_columns("db.t", [("a", T.LongType())])
    out = st.read("db.t")
    assert out.columns == ["id", "b", "a"]
    r = out.collect()[0]
    assert (r.id, r.b, r.a) == (1, "v", None)


def test_legacy_flat_renames_mixed_with_events_read(spark, tmp_path):
    """ADVICE r14 low: a pre-r14 manifest holds flat [old, new] pairs in
    d['renames']; r14 rename_columns appends a new-style EVENT to that
    same list. The read path must normalize PER ENTRY — deciding the
    format from renames[0] wrapped the event too and dict() raised."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    st.rename_columns("db.t", [("a", "b")])
    # regress the stored delta renames to the legacy flat-pair format
    m = st._load("db.t")
    m["deltas"][0]["renames"] = [["a", "b"]]
    st._store("db.t", m)
    # post-upgrade rename appends a new-style event to the mixed list
    st.rename_columns("db.t", [("b", "c")])
    out = st.read("db.t")
    assert out.columns == ["id", "c"]
    assert out.collect()[0].c == "v"


def test_before_after_missing_anchor_raises(spark, tmp_path):
    """ADVICE r14 low: BEFORE/AFTER with a None or unknown anchor must
    fail loudly (SchemaUtils.applyAddColumnEvent checkNotNull), not
    silently degrade to LAST."""
    import pytest

    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    with pytest.raises(ValueError, match="anchor column is required"):
        st.add_columns("db.t", [("n1", T.LongType(), "BEFORE", None)])
    with pytest.raises(ValueError, match="anchor not in schema"):
        st.add_columns("db.t", [("n2", T.LongType(), "AFTER", "ghost")])
    # the schema is untouched by the failed adds
    assert st.read("db.t").columns == ["id", "a"]


def test_after_anchor_renamed_since_event_translates(spark, tmp_path):
    """A replayed positioned ADD whose anchor was renamed after the
    event's epoch translates the anchor forward instead of raising —
    crash replay still lands in the right position."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    st.rename_columns("db.t", [("a", "b")])
    st.add_columns("db.t", [("n", T.LongType(), "AFTER", "a")])
    assert st.read("db.t").columns == ["id", "b", "n"]


def test_after_anchor_dropped_since_event_lands_last(spark, tmp_path):
    """A replayed positioned ADD whose anchor was DROPPED after the
    event's epoch lands (ordered LAST — the position is unobservable);
    only a genuinely unknown anchor raises."""
    st = _store(spark, tmp_path)
    _merge(st, spark, "db.t", S_ID_A, [(1, "v")])
    st.add_columns("db.t", [("n", T.LongType(), "AFTER", "a")])
    st.drop_columns("db.t", ["a", "n"])
    # crash replay of the ADD: anchor `a` is gone, n must still land
    st.add_columns("db.t", [("n", T.LongType(), "AFTER", "a")])
    assert st.read("db.t").columns == ["id", "n"]
