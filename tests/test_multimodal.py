"""Multimodal plumbing: schema enforcement, Arrow batch stages, 1->N frame
fan-out, deterministic fake decode, phash near-dup banding."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_spark.datapipe import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, n=48, partitions=4).cache()


def test_media_schema_enforced(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 48


def test_image_features_deterministic(media):
    f1 = {r.media_id: (r.phash, r.mean_luma) for r in mm.extract_image_features(media).collect()}
    f2 = {r.media_id: (r.phash, r.mean_luma) for r in mm.extract_image_features(media).collect()}
    assert f1 == f2
    assert len(f1) == 48
    ph = next(iter(f1.values()))[0]
    assert len(ph) == 16  # 64-bit hex


def test_resize_changes_meta_and_payload(media):
    out = mm.resize_images(media, 16, 16)
    assert out.schema == mm.MEDIA_SCHEMA
    rows = out.collect()
    assert all(r.meta.width == 16 and r.meta.height == 16 for r in rows)
    assert all(len(r.payload) == 256 for r in rows)  # 16x16 uint8


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, every_n=2, max_frames=3)
    assert frames.count() == 48 * 3
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per)
    idx = {r.frame_idx for r in frames.select("frame_idx").distinct().collect()}
    assert idx == {0, 2, 4}


def test_decode_stub_raises_on_pointer(spark):
    rows = [(1, None, "s3://bucket/img.png", ("image", "png", 8, 8, None, None))]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    with pytest.raises(Exception) as exc:
        mm.extract_image_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or "pointer" in str(exc.value)


def test_phash_near_dup_banding_matches_naive(spark, media):
    feats = mm.extract_image_features(media).cache()
    banded = {
        (r.media_a, r.media_b, r.hamming)
        for r in mm.near_dup_by_phash(feats, max_hamming=20).collect()
    }
    a, b = feats.alias("a"), feats.alias("b")
    half = lambda side, lo: (  # noqa: E731
        F.conv(F.substring(f"{side}.phash", lo, 8), 16, 10).cast("long")
    )
    naive_df = (
        a.join(b, F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            (
                F.bit_count(half("a", 1).bitwiseXOR(half("b", 1)))
                + F.bit_count(half("a", 9).bitwiseXOR(half("b", 9)))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 20)
    )
    naive = {(r.media_a, r.media_b, r.hamming) for r in naive_df.collect()}
    # banding requires >= 1 shared 16-bit band; with hamming <= 20 over 4
    # bands that is NOT guaranteed by pigeonhole (20 > 3), so banded must
    # be a subset; at threshold <= 3 they must be equal
    assert banded <= naive
    banded3 = {
        (r.media_a, r.media_b)
        for r in mm.near_dup_by_phash(feats, max_hamming=3).collect()
    }
    naive3 = {(r.media_a, r.media_b) for r in naive_df.where("hamming <= 3").collect()}
    assert banded3 == naive3


def test_audio_features_reference_model(spark):
    import hashlib
    import math

    import numpy as np

    docs = spark.createDataFrame(
        [(i, f"audio clip number {i}") for i in range(12)], "doc_id long, text string"
    )
    audio = mm.audio_from_documents(docs)
    # schema: audio rows carry sample_rate, no width/height
    row = audio.first()
    assert row["meta"]["media_type"] == "audio"
    assert row["meta"]["width"] is None and row["meta"]["sample_rate"] is not None

    feats = {r.media_id: r for r in mm.extract_audio_features(audio).collect()}
    assert len(feats) == 12
    for i in range(12):
        digest = hashlib.md5(f"audio clip number {i}".encode()).digest()
        n = 256 + (i % 7) * 64
        reps = -(-n // 16)
        pcm = np.frombuffer(digest * reps, dtype=np.uint8)[:n].astype(np.int64)
        sr = 8000 + (i % 4) * 4000
        r = feats[i]
        assert r.n_samples == n
        assert r.duration_ms == (n * 1000) // sr
        assert r.peak_amp == int(pcm.max())
        assert r.mean_amp == int(pcm.sum()) / n
        assert r.rms == math.sqrt(int((pcm ** 2).sum()) / n)


def test_frame_sample_stats_matches_frames(media):
    import numpy as np

    stats = mm.frame_sample_stats(media, every_n=4, max_frames=3)
    frames = mm.sample_frames(media, every_n=4, max_frames=3)
    got = {(r.media_id, r.frame_idx): (r.frame_sum, r.first_byte)
           for r in stats.collect()}
    assert len(got) == 48 * 3
    # cross-check against the materialized frame bytes
    for r in frames.collect():
        arr = np.frombuffer(bytes(r.frame), dtype=np.uint8)
        assert got[(r.media_id, r.frame_idx)][0] == int(arr.astype(np.int64).sum())
        assert got[(r.media_id, r.frame_idx)][1] == int(arr[0])


def test_audio_fingerprint_and_near_dup(spark):
    """Audio fingerprints: deterministic, gain-robust shape (64-bit hex);
    identical clips collide, and the banded near-dup join (reusing the
    phash bander on the afp column) finds them."""
    docs = spark.createDataFrame(
        [(i, f"clip {i % 6}") for i in range(12)],  # 6 distinct payloads
        "doc_id long, text string",
    )
    audio = mm.audio_from_documents(docs)
    fps = mm.audio_fingerprint(audio)
    rows = {r.media_id: r.afp for r in fps.collect()}
    assert len(rows) == 12 and all(len(v) == 16 for v in rows.values())
    # same text + same n -> same pcm -> same fingerprint (i, i+6 share both
    # text (i%6) and n (i%7) only when i%42 aligns; check doc 0 vs itself
    # via re-run instead: determinism)
    again = {r.media_id: r.afp for r in mm.audio_fingerprint(audio).collect()}
    assert rows == again
    pairs = mm.near_dup_by_phash(
        fps.withColumnRenamed("afp", "phash"), max_hamming=3
    )
    got = {(r.media_a, r.media_b) for r in pairs.collect()}
    # exact-duplicate fingerprints must pair (hamming 0)
    from collections import defaultdict

    by_fp = defaultdict(list)
    for mid, fp in rows.items():
        by_fp[fp].append(mid)
    expected_exact = {
        (a, b)
        for ids in by_fp.values()
        for a in ids for b in ids if a < b
    }
    assert expected_exact <= got
