"""Multimodal (image/audio/video) column processing.

Media ride through the engine as opaque ``binary`` columns with typed
metadata structs — the only representation that scales: blobs stay in
columnar storage, predicates prune on metadata without touching bytes,
and compute happens in Arrow-batched Pandas iterators (``mapInPandas``),
never row-at-a-time Python.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are deterministic fakes behind ``_decode_image`` /
``_decode_audio`` (clearly marked; swap the body for the real library
on a cluster image).  Everything Spark-side is real and tested:
schemas, Arrow batch shapes, UDF signatures, partition-sized batching.

Schema conventions:
    image:  (media_id BIGINT, content BINARY,
             meta STRUCT<format STRING, width INT, height INT>)
    audio:  (media_id BIGINT, content BINARY,
             meta STRUCT<format STRING, sample_rate INT, n_samples INT>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_bytes INT, "
    "mean_intensity DOUBLE, feature ARRAY<DOUBLE>"
)

RESIZE_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT>"
)


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    Real implementation: ``np.asarray(PIL.Image.open(BytesIO(content)))``.
    The container has no image codec, so decode derives a deterministic
    uint8 grayscale array from the bytes (repeating the payload to fill
    width*height).  Keeps every downstream shape/statistic real.
    """
    if width <= 0 or height <= 0:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not in this container); "
            "metadata must carry width/height for the stub"
        )
    buf = np.frombuffer(content, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(width * height / buf.size))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def image_features(images: DataFrame, *, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract in Arrow batches.

    mapInPandas: each partition arrives as an iterator of pandas
    DataFrames (Arrow batches); the UDF is called once per batch, the
    decode loop is C-speed numpy per image.  The 'feature' is a
    ``feature_dim``-bin intensity histogram (a stand-in for a real
    embedding model — same schema, same batching).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_image(content, w, h)
                hist, _ = np.histogram(img, bins=feature_dim, range=(0, 256))
                denom = max(1, img.size)
                out.append(
                    (
                        int(mid),
                        w,
                        h,
                        len(content),
                        float(img.mean()),
                        (hist / denom).astype(float).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_bytes", "mean_intensity", "feature",
                ],
            )

    return images.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(images: DataFrame, *, max_side: int = 64) -> DataFrame:
    """Downscale images whose longest side exceeds ``max_side``.

    Nearest-neighbor resample on the (stub-)decoded array, re-encoded as
    raw bytes with updated metadata — the classic normalize-before-
    training step.  Aspect ratio preserved, never upscales.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_image(content, w, h)
                scale = max_side / max(w, h)
                if scale < 1.0:
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    yi = (np.arange(nh) * (h / nh)).astype(int)
                    xi = (np.arange(nw) * (w / nw)).astype(int)
                    img = img[yi][:, xi]
                    w, h = nw, nh
                rows.append(
                    (int(mid), img.tobytes(), {"format": "raw8", "width": w, "height": h})
                )
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return images.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample(
    videos: DataFrame, *, every_n: int = 10
) -> DataFrame:
    """Sample every Nth frame of a 'video' (binary column + n_frames
    metadata) into image rows — the explode-shaped multimodal op.

    Input:  (media_id, content BINARY, meta STRUCT<format, n_frames INT,
             width INT, height INT>)
    Output: IMAGE_SCHEMA rows, one per sampled frame, media_id shifted
            to (video_id * 100000 + frame_no).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                n, w, h = int(meta["n_frames"]), int(meta["width"]), int(meta["height"])
                frame_bytes = max(1, len(content) // max(1, n))
                for f in range(0, n, every_n):
                    chunk = content[f * frame_bytes : (f + 1) * frame_bytes]
                    rows.append(
                        (
                            int(mid) * 100000 + f,
                            chunk,
                            {"format": "raw8", "width": w, "height": h},
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return videos.mapInPandas(kernel, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, sample_rate: INT, n_samples: INT>"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_samples INT, duration_s DOUBLE, "
    "rms DOUBLE, zero_crossing_rate DOUBLE, peak INT, loudness ARRAY<DOUBLE>"
)


def _decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    Real implementation: ``librosa.load(BytesIO(content))`` /
    ``soundfile.read``.  The container has no audio codec, so decode
    derives a deterministic int16 waveform from the payload bytes
    (little-endian pairs, tiled to n_samples).  Keeps every downstream
    shape/statistic real.
    """
    if n_samples <= 0:
        raise NotImplementedError(
            "real audio decode requires librosa/soundfile (not in this "
            "container); metadata must carry n_samples for the stub"
        )
    usable = len(content) - (len(content) % 2)
    buf = (
        np.frombuffer(content[:usable], dtype="<i2")
        if usable
        else np.zeros(1, dtype="<i2")
    )
    reps = int(np.ceil(n_samples / buf.size))
    return np.tile(buf, reps)[:n_samples].astype(np.int64)


def audio_features(audios: DataFrame, *, n_windows: int = 8) -> DataFrame:
    """Decode + per-clip acoustic statistics in Arrow batches: duration,
    RMS, zero-crossing rate, peak, and an ``n_windows``-bucket loudness
    (windowed RMS) contour — the audio analogue of image_features, same
    mapInPandas batching, numpy-vectorized per clip.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                sr, n = int(meta["sample_rate"]), int(meta["n_samples"])
                wave = _decode_audio(content, n)
                signs = np.sign(wave)
                nz = signs != 0
                zc = (
                    float(np.mean(np.abs(np.diff(signs[nz])) > 0))
                    if nz.sum() > 1
                    else 0.0
                )
                bounds = np.linspace(0, wave.size, n_windows + 1).astype(int)
                loud = [
                    float(np.sqrt(np.mean(np.square(wave[a:b], dtype=np.float64))))
                    if b > a
                    else 0.0
                    for a, b in zip(bounds[:-1], bounds[1:])
                ]
                out.append(
                    (
                        int(mid), sr, n, n / sr,
                        float(np.sqrt(np.mean(np.square(wave, dtype=np.float64)))),
                        zc,
                        int(np.abs(wave).max()),
                        loud,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_crossing_rate", "peak", "loudness",
                ],
            )

    return audios.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def synthetic_audio(spark, n: int = 32, *, seed: int = 11, sample_rate: int = 8000) -> DataFrame:
    """Deterministic fake audio table for tests/demos (no codec needed)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.to_binary(
                F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 16), F.lit("hex")
            ).alias("content"),
            F.struct(
                F.lit("fake-pcm16").alias("format"),
                F.lit(sample_rate).cast("int").alias("sample_rate"),
                ((F.col("id") % 4 + 1) * sample_rate).cast("int").alias("n_samples"),
            ).alias("meta"),
        )
    )


def synthetic_media(spark, n: int = 32, *, seed: int = 7) -> DataFrame:
    """Deterministic fake image table for tests/demos (no codec needed).

    Bytes derive from md5-seeded per-row expressions JVM-side, so the
    table is reproducible without shipping binaries.
    """
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.to_binary(
                F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 8), F.lit("hex")
            ).alias("content"),
            F.struct(
                F.lit("fake").alias("format"),
                (F.col("id") % 7 * 16 + 16).cast("int").alias("width"),
                (F.col("id") % 5 * 16 + 16).cast("int").alias("height"),
            ).alias("meta"),
        )
    )
