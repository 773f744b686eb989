"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schema, batch shape, partition-friendly
``mapInPandas`` kernels) is real and tested; the actual media decode is
STUBBED — the sandbox has no image/audio libraries — behind
``set_image_decoder``. The default decoder is a deterministic fake that
derives a feature vector from the bytes, so pipelines are end-to-end
testable and swap in a real decoder (PIL/torchaudio/ffmpeg) unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_FEATURE_DIM = 32


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction.

    Real deployments replace this via :func:`set_image_decoder`; shape and
    dtype are the contract (float32[_FEATURE_DIM])."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest, np.uint8).astype(np.float32)
    reps = int(np.ceil(_FEATURE_DIM / raw.size))
    return np.tile(raw, reps)[:_FEATURE_DIM] / 255.0


_image_decoder = _fake_decode_image


def set_image_decoder(fn) -> None:
    """Install a real decoder: ``bytes -> np.ndarray[float32, FEATURE_DIM]``.
    Raise NotImplementedError inside it for unsupported formats."""
    global _image_decoder
    _image_decoder = fn


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """(media_id, features array<float>) via Arrow-batched mapInPandas —
    the partition/batch shape a GPU-backed extractor would use."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            feats = [
                _image_decoder(bytes(p) if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(kernel, schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through a kernel that would hold the
    resize; here it re-emits bytes with updated metadata (decode stubbed)."""
    out_schema = MEDIA_SCHEMA

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = np.int32(width)
            pdf["height"] = np.int32(height)
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (media_id, frame_idx, ts_ms, payload-slice stub)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": []}
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                dur = 0 if pd.isna(dur) else int(dur)  # nulls arrive as NaN
                n = max(dur // every_ms, 1)
                for k in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["ts_ms"].append(k * every_ms)
            yield pd.DataFrame(rows)

    return df.select("media_id", "duration_ms").mapInPandas(kernel, schema)


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payload column)."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, f"{kind}/x-test", 640, 480, 5000 if kind == "video" else None, payload)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
