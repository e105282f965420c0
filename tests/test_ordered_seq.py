"""banded_global_rank must reproduce the single-partition global window
it replaces — including on NULL order values, where a bare
countDistinct-based offset would undercount (NULL tuples ARE rankable
values to dense_rank) and collide ranks across bands."""

from pyspark.sql import Window, functions as F

from flink_cdc_spark.operators.ordered_seq import banded_global_rank


def _reference(df, band, order, dense):
    w = Window.orderBy(band, *order)
    fn = F.dense_rank() if dense else F.row_number()
    return df.withColumn("ref_rank", fn.over(w))


def _assert_matches(df, band, order, dense):
    got = banded_global_rank(df, band, order, "seq", dense=dense)
    ref = _reference(df, band, order, dense)
    joined = got.join(ref, ["band", "k", "v"]).select("seq", "ref_rank")
    assert all(r.seq == r.ref_rank for r in joined.collect())


def test_dense_rank_equivalence(spark):
    df = spark.createDataFrame(
        [(b, k, v) for b in (1, 2, 3) for k in (10, 20, 20, 30) for v in ("x",)],
        "band INT, k INT, v STRING",
    )
    _assert_matches(df, "band", ["k"], dense=True)


def test_dense_rank_with_null_order_values(spark):
    """The ADVICE scenario: NULL order tuples in a band must advance the
    cumulative offsets exactly like any other distinct tuple."""
    df = spark.createDataFrame(
        [
            (1, None, "a"),
            (1, None, "b"),  # same NULL tuple: ties under dense_rank
            (1, 5, "c"),
            (2, None, "d"),  # band 2's ranks must start AFTER band 1's 2 tuples
            (2, 7, "e"),
            (3, 1, "f"),
        ],
        "band INT, k INT, v STRING",
    )
    _assert_matches(df, "band", ["k"], dense=True)


def test_row_number_equivalence_unique_keys(spark):
    df = spark.createDataFrame(
        [(b, k, "x") for b in (1, 2) for k in (1, 2, 3)],
        "band INT, k INT, v STRING",
    )
    _assert_matches(df, "band", ["k"], dense=False)


def test_within_scope_restarts_ranks(spark):
    df = spark.createDataFrame(
        [("s1", 1, 10, "x"), ("s1", 2, 10, "y"), ("s2", 1, 10, "z")],
        "scope STRING, band INT, k INT, v STRING",
    )
    out = banded_global_rank(df, "band", ["k"], "seq", dense=True, within="scope")
    seqs = {(r.scope, r.band): r.seq for r in out.collect()}
    assert seqs == {("s1", 1): 1, ("s1", 2): 2, ("s2", 1): 1}
