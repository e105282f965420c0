"""rotate_emit_dir (ADVICE r12): the PREVIOUS invocation's emit subdir
must survive the current invocation (a lazily returned DataFrame may
still point at it) and be removed only by the run after next."""

import os

from flink_cdc_spark.streaming.windowed import rotate_emit_dir


def test_predecessor_survives_one_round(tmp_path):
    root = str(tmp_path / "emit")
    d1 = rotate_emit_dir(root)
    assert os.path.isdir(d1)
    d2 = rotate_emit_dir(root)
    assert os.path.isdir(d1), "previous run's dir must survive the next call"
    assert os.path.isdir(d2)
    assert d2 > d1  # strictly ordered names
    d3 = rotate_emit_dir(root)
    assert not os.path.isdir(d1), "run-before-last must be reclaimed"
    assert os.path.isdir(d2) and os.path.isdir(d3)


def test_monotone_even_with_clock_skew(tmp_path):
    root = str(tmp_path / "emit")
    # simulate a future-stamped predecessor (clock went backwards)
    future = os.path.join(root, f"run_{10**20 - 5:020d}")
    os.makedirs(future)
    d = rotate_emit_dir(root)
    assert d > future
