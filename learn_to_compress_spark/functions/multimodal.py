"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

The Spark-side machinery (schema, batch shape, partition-friendly
``mapInPandas`` kernels) is real and tested, and so is the decode for the
formats implementable from public specs with the stdlib
(``media_codecs.py``): **PNG pixels in/out** (zlib + scanline unfiltering),
**WAV PCM samples**, and true header probes for JPEG/GIF/BMP. Feature
extraction computes real pixel/sample statistics for decodable media and
falls back to a byte-histogram for opaque formats; a heavyweight decoder
(PIL/torchaudio/ffmpeg) slots in via :func:`set_image_decoder` unchanged.
Video frame extraction remains a STUB (no container parser in the sandbox;
``frame_sample_stub`` does real per-frame row fan-out over metadata only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    probe_media,
    resize_nearest,
)

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


def _byte_histogram_features(payload: bytes) -> np.ndarray:
    """Opaque-format fallback: normalized 32-bin byte histogram — a real
    (if crude) content feature, deterministic across workers."""
    if not payload:
        return np.zeros(_FEATURE_DIM, np.float32)
    arr = np.frombuffer(payload, np.uint8)
    hist = np.bincount(arr >> 3, minlength=_FEATURE_DIM).astype(np.float32)
    return hist / max(arr.size, 1)


def _png_features(pixels: np.ndarray) -> np.ndarray:
    """Real pixel statistics: per-channel mean/std (≤4 ch), 16-bin luminance
    histogram, log-dims — _FEATURE_DIM floats."""
    h, w, ch = pixels.shape
    out = np.zeros(_FEATURE_DIM, np.float32)
    px = pixels.astype(np.float32) / 255.0
    for c in range(min(ch, 4)):
        out[2 * c] = px[:, :, c].mean()
        out[2 * c + 1] = px[:, :, c].std()
    lum = px[:, :, : min(ch, 3)].mean(axis=2)
    hist = np.histogram(lum, bins=16, range=(0.0, 1.0))[0].astype(np.float32)
    out[8:24] = hist / lum.size
    out[24] = np.log1p(w)
    out[25] = np.log1p(h)
    out[26] = float(ch)
    return out


def _wav_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Real sample statistics: RMS, zero-crossing rate, 16-bin amplitude
    histogram, duration."""
    out = np.zeros(_FEATURE_DIM, np.float32)
    x = samples.astype(np.float32) / 32768.0
    mono = x.mean(axis=1)
    out[0] = float(np.sqrt((mono**2).mean())) if mono.size else 0.0
    if mono.size > 1:
        out[1] = float((np.diff(np.signbit(mono)) != 0).mean())
    hist = np.histogram(mono, bins=16, range=(-1.0, 1.0))[0].astype(np.float32)
    out[8:24] = hist / max(mono.size, 1)
    out[24] = np.log1p(mono.size / max(rate, 1))
    out[25] = float(samples.shape[1])
    return out


def _default_decoder(payload: bytes) -> np.ndarray:
    """bytes → float32[_FEATURE_DIM]: real decode for PNG/WAV, byte
    histogram for everything else."""
    info = probe_media(payload or b"")
    try:
        if info and info["format"] == "png":
            return _png_features(decode_png(payload))
        if info and info["format"] == "wav":
            return _wav_features(*decode_wav(payload))
    except NotImplementedError:
        pass
    return _byte_histogram_features(payload or b"")


# kept under the historical name: the pluggable-decoder seam tests swap it
_fake_decode_image = _default_decoder
_image_decoder = _default_decoder


def set_image_decoder(fn) -> None:
    """Install a custom decoder: ``bytes -> np.ndarray[float32, FEATURE_DIM]``.
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


def inspect_media(df: DataFrame) -> DataFrame:
    """(media_id, format, width, height, channels) parsed from the actual
    byte streams (PNG/JPEG/GIF/BMP/WAV header probes) — ground truth that
    overrides whatever the metadata columns claim."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "format", "width", "height", "channels")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                info = probe_media(bytes(p) if p is not None else b"") or {}
                rows["media_id"].append(mid)
                rows["format"].append(info.get("format"))
                rows["width"].append(info.get("width"))
                rows["height"].append(info.get("height"))
                rows["channels"].append(info.get("channels"))
            yield pd.DataFrame(rows).astype(
                {"width": "Int32", "height": "Int32", "channels": "Int32"}
            )

    return df.select("media_id", "payload").mapInPandas(kernel, schema)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize for decodable PNG payloads (nearest-neighbor resample,
    re-encoded as PNG); opaque payloads pass through with metadata updated
    (the stub path, clearly secondary). Schema is unchanged."""
    out_schema = MEDIA_SCHEMA

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            payloads = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                info = probe_media(b)
                if info and info["format"] == "png":
                    try:
                        b = encode_png(resize_nearest(decode_png(b), width, height))
                    except NotImplementedError:
                        pass
                payloads.append(b)
            pdf["payload"] = payloads
            pdf["width"] = np.int32(width)
            pdf["height"] = np.int32(height)
            yield pdf

    return df.mapInPandas(kernel, out_schema)


# kept under the historical name for the plumbing tests
resize_stub = resize_media


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms).

    MP4/AVI payloads parse their REAL container structure (ISO-BMFF
    ``stts`` time-to-sample table / AVI main header — ``media_codecs.
    probe_mp4``/``probe_avi``, public specs): ``frame_idx`` is the true
    frame ordinal and ``ts_ms`` its true timestamp, sampled as the first
    frame of each ``every_ms`` bucket. Opaque payloads keep the declared
    metadata fan-out (``duration_ms`` grid) — frame PIXEL decode stays
    behind the pluggable decoder seam (no codec libs in scope)."""
    from .media_codecs import video_frame_times

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
            for mid, dur, p in zip(pdf["media_id"], pdf["duration_ms"], pdf["payload"]):
                times = video_frame_times(bytes(p)) if p is not None else None
                if times is not None and times.size:
                    # first true frame of each every_ms bucket
                    buckets = times // every_ms
                    keep = np.concatenate(([True], buckets[1:] != buckets[:-1]))
                    for k in np.flatnonzero(keep):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(int(k))
                        rows["ts_ms"].append(int(times[k]))
                    continue
                dur = 0 if pd.isna(dur) else int(dur)  # nulls arrive as NaN
                n = max(dur // every_ms, 1)
                for k in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["ts_ms"].append(k * every_ms)
            yield pd.DataFrame(rows)

    return df.select("media_id", "duration_ms", "payload").mapInPandas(kernel, schema)


# kept under the historical name for the plumbing tests
frame_sample_stub = frame_sample


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: REAL PNG payloads (gradient
    images encoded by our own encoder), real WAV payloads (sine PCM), and
    opaque blobs, cycling by kind."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 16 + (i % 5) * 4, 12 + (i % 3) * 4
            px = (
                (np.arange(h)[:, None, None] * 7 + np.arange(w)[None, :, None] * 3 + i)
                % 256
            ).astype(np.uint8).repeat(3, axis=2)
            payload = encode_png(px)
            rows.append((i, kind, "image/png", w, h, None, payload))
        elif kind == "audio":
            import io
            import wave

            buf = io.BytesIO()
            t = np.arange(800)
            pcm = (8000 * np.sin(2 * np.pi * (220 + i) * t / 8000)).astype(np.int16)
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(pcm.tobytes())
            rows.append((i, kind, "audio/wav", None, None, 100, buf.getvalue()))
        else:
            payload = rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
            rows.append((i, kind, "video/x-test", 640, 480, 5000, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
