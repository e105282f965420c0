"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Design (the part that must be right at 100 TB):
  * media payloads are `binary` columns riding next to a typed metadata
    struct (media_type, width/height or sample_rate/duration, codec) — the
    schema is real and enforced;
  * every processing stage is `mapInPandas` over Arrow batches, so bytes
    move Python-side once per batch, not per row, and each stage is an
    embarrassingly parallel map (no shuffle);
  * oversized payloads should be pointered (store a URI, fetch in the
    UDF) — represented here by the `uri` column; the frame passes either
    inline bytes or a pointer.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
`decode_image` routes through a DETERMINISTIC FAKE decoder (seeded by the
payload hash) behind `_decode_backend`; swapping in a real library is a
one-function change and every schema/batching contract stays identical.
A real deployment should also raise `spark.sql.execution.arrow
.maxRecordsPerBatch` awareness: batches are bounded by bytes, not rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_backend(payload: bytes, width: int, height: int) -> np.ndarray:
    """FAKE deterministic decode: the md5 digest of the payload tiled to
    (height, width) — pixel(r, c) = digest[(r*width + c) mod 16].

    Replace with e.g. PIL.Image.open(io.BytesIO(payload)) in a real
    deployment; the container has no image codecs (see module docstring).
    The tiling is chosen to be *closed-form reproducible in SQL* (md5 +
    modular indexing), so downstream features are oracle-checkable even
    though the decode itself runs in a pandas UDF.
    """
    if payload is None:
        raise NotImplementedError("pointer fetch (uri) not implemented in the stub")
    h, w = height or 8, width or 8
    digest = hashlib.md5(bytes(payload)).digest()  # 16 bytes
    reps = -(-(h * w) // 16)
    return np.frombuffer(digest * reps, dtype=np.uint8)[: h * w].reshape(h, w)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from the documents table: the text bytes
    stand in for an encoded image payload (media_id = doc_id; width/height
    derived from the id). Pure built-in expressions — no UDF — so an
    oracle over `documents` sees exactly the same inputs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("string").alias("uri"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("codec"),
            (F.lit(8) + (F.col("doc_id") % 5) * 4).cast("int").alias("width"),
            (F.lit(8) + (F.col("doc_id") % 3) * 4).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def synthesize_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fixture frame matching MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4  # 128 bytes
        rows.append(
            (
                i,
                bytearray(payload),
                None,
                ("image", "fake", 8 + (i % 5) * 4, 8 + (i % 3) * 4, None, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def extract_image_features(media: DataFrame) -> DataFrame:
    """decode -> per-image features, one Arrow batch at a time."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over column arrays, not iterrows (row-boxing dominates at
            # Arrow batch sizes)
            for media_id, payload, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = _decode_backend(payload, m["width"], m["height"])
                # 8x8 downsample -> mean-threshold perceptual hash
                ys = np.linspace(0, img.shape[0] - 1, 8).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, 8).astype(int)
                small = img[np.ix_(ys, xs)]
                bits = (small >= small.mean()).flatten()
                phash = "".join(
                    f"{int(''.join('1' if b else '0' for b in bits[k:k+8]), 2):02x}"
                    for k in range(0, 64, 8)
                )
                out.append(
                    (media_id, img.shape[1], img.shape[0], float(img.mean()), phash)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_luma", "phash"]
            )

    return media.mapInPandas(stage, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode (raw bytes)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, uris, metas = [], [], [], []
            for media_id, payload, uri, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["uri"], pdf["meta"]
            ):
                m = dict(meta)
                img = _decode_backend(payload, m["width"], m["height"])
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                resized = img[np.ix_(ys, xs)]
                ids.append(media_id)
                payloads.append(resized.tobytes())
                uris.append(uri)
                m.update({"width": width, "height": height, "codec": "raw"})
                metas.append(m)
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "uri": uris, "meta": metas}
            )

    return media.mapInPandas(stage, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Video-style frame sampling: one input row fans out to <= max_frames
    rows (the batch shape changes — mapInPandas handles 1->N)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                base = _decode_backend(payload, m["width"], m["height"])
                for k in range(max_frames):
                    # fake temporal dimension: shift the seed per frame
                    frame = np.roll(base, k * every_n, axis=0)
                    out.append((media_id, k * every_n, frame.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(stage, schema=FRAME_SCHEMA)


def image_features_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL reproducing extract_image_features(media_from_documents):
    md5-digest-tiled pixels, exact mean luma, 8x8 mean-threshold phash.
    Integer pixel sums are exact in float64 on both engines, so mean_luma
    and the phash threshold compare bit-for-bit."""
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(8 + (doc_id % 5) * 4 AS INTEGER) AS width,
             CAST(8 + (doc_id % 3) * 4 AS INTEGER) AS height,
             list_transform(range(16),
               k -> CAST('0x' || substr(md5(text), CAST(2*k+1 AS INTEGER), 2) AS BIGINT)) AS b
      FROM {table}
    ), f AS (
      SELECT media_id, width, height,
        CAST(list_sum(list_transform(range(width*height),
               i -> b[CAST(i % 16 AS INTEGER) + 1])) AS DOUBLE)
          / (width*height) AS mean_luma,
        list_transform(range(64), j ->
          b[CAST((CAST(floor((j // 8) * (height-1) / 7.0) AS BIGINT) * width
                + CAST(floor((j % 8) * (width-1) / 7.0) AS BIGINT)) % 16 AS INTEGER) + 1]
        ) AS small
      FROM m
    ), t AS (
      SELECT *, CAST(list_sum(small) AS DOUBLE) / 64.0 AS thr FROM f
    )
    SELECT media_id, width, height, mean_luma,
      array_to_string(list_transform(range(8), i ->
        printf('%02x', CAST(list_sum(list_transform(range(8), j ->
          CASE WHEN small[CAST(8*i + j AS INTEGER) + 1] >= thr
               THEN (1 << CAST(7 - j AS INTEGER)) ELSE 0 END)) AS BIGINT))), '')
        AS phash
    FROM t
    """


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("mean_amp", T.DoubleType(), False),
        T.StructField("peak_amp", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)

FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sum", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), False),
    ]
)


def audio_from_documents(docs: DataFrame) -> DataFrame:
    """Build an audio MEDIA_SCHEMA frame from the documents table: the
    md5 digest of the text stands in for an encoded audio payload
    (16 "codec bytes" the fake decoder tiles into PCM samples);
    sample_rate and the sample count derive from doc_id. Pure built-in
    expressions, so a DuckDB oracle sees identical inputs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5(F.encode(F.col("text"), "UTF-8"))).alias("payload"),
        F.lit(None).cast("string").alias("uri"),
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("fake-pcm8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_audio_backend(payload: bytes, media_id: int) -> np.ndarray:
    """FAKE deterministic PCM decode: the payload bytes tiled to
    ``256 + (media_id % 7) * 64`` unsigned 8-bit samples.

    Replace with e.g. soundfile.read(io.BytesIO(payload)) in a real
    deployment (no audio codecs in this container)."""
    if payload is None:
        raise NotImplementedError("pointer fetch (uri) not implemented in the stub")
    n = 256 + (media_id % 7) * 64
    raw = bytes(payload)
    reps = -(-n // len(raw))
    return np.frombuffer(raw * reps, dtype=np.uint8)[:n]


def extract_audio_features(media: DataFrame) -> DataFrame:
    """decode -> per-clip loudness features, one Arrow batch at a time.

    mean/peak/rms are computed from exact integer sums then one IEEE
    division/sqrt, so a SQL oracle over the same integer sums compares
    bit-for-bit."""
    import math

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                pcm = _decode_audio_backend(payload, media_id)
                n = int(pcm.shape[0])
                sr = int(m["sample_rate"])
                s = int(pcm.astype(np.int64).sum())
                sq = int((pcm.astype(np.int64) ** 2).sum())
                out.append(
                    (media_id, n, (n * 1000) // sr, s / n, int(pcm.max()),
                     math.sqrt(sq / n))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "duration_ms",
                    "mean_amp", "peak_amp", "rms",
                ],
            )

    return media.mapInPandas(stage, schema=AUDIO_FEATURES_SCHEMA)


def audio_features_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL reproducing extract_audio_features(audio_from_documents):
    md5-digest bytes tiled to n samples; exact int sums then IEEE
    division/sqrt."""
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sr,
             CAST(256 + (doc_id % 7) * 64 AS INTEGER) AS n,
             list_transform(range(16),
               k -> CAST('0x' || substr(md5(text), CAST(2*k+1 AS INTEGER), 2) AS BIGINT)) AS b
      FROM {table}
    ), s AS (
      SELECT media_id, sr, n,
             list_transform(range(n), i -> b[CAST(i % 16 AS INTEGER) + 1]) AS pcm
      FROM m
    )
    SELECT media_id,
           n AS n_samples,
           CAST((n * 1000) // sr AS BIGINT) AS duration_ms,
           CAST(list_sum(pcm) AS DOUBLE) / n AS mean_amp,
           CAST(list_max(pcm) AS INTEGER) AS peak_amp,
           sqrt(CAST(list_sum(list_transform(pcm, x -> x * x)) AS DOUBLE) / n) AS rms
    FROM s
    """


def frame_sample_stats(media: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Frame sampling followed by per-frame stats in ONE mapInPandas pass
    (the decode->sample->reduce fusion a real video pipeline wants: frames
    never round-trip through the shuffle). frame_sum is roll-invariant;
    first_byte pins the temporal shift, so together they verify both the
    fan-out and the frame order."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                base = _decode_backend(payload, m["width"], m["height"])
                total = int(base.astype(np.int64).sum())
                h = base.shape[0]
                for k in range(max_frames):
                    shift = (k * every_n) % h
                    out.append(
                        (media_id, k * every_n, total,
                         int(base[(h - shift) % h, 0]))
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_sum", "first_byte"]
            )

    return media.mapInPandas(stage, schema=FRAME_STATS_SCHEMA)


def frame_sample_stats_oracle_sql(
    table: str = "documents", every_n: int = 4, max_frames: int = 3
) -> str:
    """DuckDB SQL reproducing frame_sample_stats(media_from_documents):
    np.roll(base, s, axis=0)[0,0] == base[(h - s) % h, 0] ==
    digest[(((h - s) % h) * w) % 16]."""
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(8 + (doc_id % 5) * 4 AS INTEGER) AS w,
             CAST(8 + (doc_id % 3) * 4 AS INTEGER) AS h,
             list_transform(range(16),
               k -> CAST('0x' || substr(md5(text), CAST(2*k+1 AS INTEGER), 2) AS BIGINT)) AS b
      FROM {table}
    ), f AS (
      SELECT media_id, w, h, b,
             CAST(list_sum(list_transform(range(w*h),
               i -> b[CAST(i % 16 AS INTEGER) + 1])) AS BIGINT) AS frame_sum
      FROM m
    )
    SELECT media_id,
           CAST(k * {every_n} AS INTEGER) AS frame_idx,
           frame_sum,
           CAST(b[CAST((((h - (k * {every_n}) % h) % h) * w) % 16 AS INTEGER) + 1]
                AS INTEGER) AS first_byte
    FROM f, (SELECT unnest(range({max_frames})) AS k)
    """


def near_dup_by_phash(features: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Perceptual-hash near-dup: banded self-join on phash nibbles (same
    pigeonhole trick as SimHash dedup) then exact hamming filter."""
    f = features.select("media_id", "phash")
    bands = f.select(
        "media_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("phash", 1 + b * 4, 4).alias("bv"),
                )
                for b in range(4)
            ])
        ).alias("e"),
    ).select("media_id", "phash", F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            # hamming over two 32-bit halves (a full 64-bit conv can
            # overflow signed long for high hashes)
            (
                F.bit_count(
                    F.conv(F.substring("a.phash", 1, 8), 16, 10)
                    .cast("long")
                    .bitwiseXOR(F.conv(F.substring("b.phash", 1, 8), 16, 10).cast("long"))
                )
                + F.bit_count(
                    F.conv(F.substring("a.phash", 9, 8), 16, 10)
                    .cast("long")
                    .bitwiseXOR(F.conv(F.substring("b.phash", 9, 8), 16, 10).cast("long"))
                )
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("afp", T.StringType(), False),
    ]
)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Chromaprint-style acoustic fingerprint over the fake-PCM decode:
    the clip splits into 65 equal windows, and bit j of the 64-bit
    fingerprint is [energy(window j) > energy(window j+1)] — the classic
    energy-delta fingerprint, robust to global gain. One mapInPandas
    pass; exact integer window sums keep the closed SQL form."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm = _decode_audio_backend(payload, media_id).astype(np.int64)
                w = pcm.shape[0] // 65
                energies = pcm[: 65 * w].reshape(65, w).sum(axis=1)
                bits = energies[:-1] > energies[1:]
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                out.append((media_id, f"{val:016x}"))
            yield pd.DataFrame(out, columns=["media_id", "afp"])

    return media.mapInPandas(stage, schema=AUDIO_FP_SCHEMA)


def audio_fingerprint_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of audio_fingerprint(audio_from_documents): window
    energies as exact integer sums over the tiled digest."""
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(256 + (doc_id % 7) * 64 AS INTEGER) AS n,
             list_transform(range(16),
               k -> CAST('0x' || substr(md5(text), CAST(2*k+1 AS INTEGER), 2) AS BIGINT)) AS b
      FROM {table}
    ), w AS (
      SELECT media_id, n, b, n // 65 AS wlen FROM m
    ), e AS (
      SELECT media_id, wlen,
             list_transform(range(65), j ->
               list_sum(list_transform(range(j * wlen, (j + 1) * wlen),
                 i -> b[CAST(i % 16 AS INTEGER) + 1]))) AS energies
      FROM w
    )
    SELECT media_id,
           array_to_string(list_transform(range(8), i ->
             printf('%02x', CAST(list_sum(list_transform(range(8), j ->
               CASE WHEN energies[CAST(8*i + j AS INTEGER) + 1] >
                         energies[CAST(8*i + j AS INTEGER) + 2]
                    THEN (1 << CAST(7 - j AS INTEGER)) ELSE 0 END))
               AS BIGINT))), '') AS afp
    FROM e
    """
