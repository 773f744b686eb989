"""Pure-stdlib media codecs for the multimodal pipeline.

No image/audio libraries exist in the execution environment, so the engine
implements the free formats directly from their public specifications:

* **PNG** — real decode AND encode (zlib IDAT + per-scanline unfiltering,
  filters 0-4, 8-bit gray/gray-alpha/RGB/RGBA, non-interlaced) — pixels in,
  pixels out, no fakes.
* **WAV** — real PCM decode via the stdlib ``wave`` module.
* **JPEG / GIF / BMP** — header probe only (true width/height/channels from
  the byte stream); full entropy decode is out of scope and raises
  ``NotImplementedError`` so callers can route to a pluggable decoder.

Everything here is driver/worker-side numpy — Spark plumbing lives in
``multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# header probes
# ---------------------------------------------------------------------------


def probe_media(payload: bytes) -> dict | None:
    """Sniff format + true dimensions from the byte stream. Returns
    ``{"format", "width", "height", "channels"|None, "sample_rate"|...}``
    or None if unrecognized."""
    if not payload:
        return None
    if payload[:8] == PNG_SIG:
        w, h, depth, ctype = struct.unpack_from(">IIBB", payload, 16)
        return {
            "format": "png",
            "width": int(w),
            "height": int(h),
            "bit_depth": int(depth),
            "channels": _PNG_CHANNELS.get(ctype),
        }
    if payload[:2] == b"\xff\xd8":
        return _probe_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        return {"format": "gif", "width": int(w), "height": int(h), "channels": 3}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0] if len(payload) >= 30 else None
        return {
            "format": "bmp",
            "width": int(w),
            "height": abs(int(h)),
            "channels": (bpp // 8) if bpp else None,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _probe_wav(payload)
    return None


def _probe_jpeg(payload: bytes) -> dict | None:
    """Walk JPEG markers to the first SOFn frame header (public JFIF spec):
    ``FF C0-CF (except C4/C8/CC) | len | precision | h:u16 | w:u16 | nc``."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        seglen = struct.unpack_from(">H", payload, i + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                break
            h, w = struct.unpack_from(">HH", payload, i + 5)
            nc = payload[i + 9] if i + 9 < n else None
            return {
                "format": "jpeg",
                "width": int(w),
                "height": int(h),
                "channels": int(nc) if nc is not None else None,
            }
        i += 2 + seglen
    return {"format": "jpeg", "width": None, "height": None, "channels": None}


def _probe_wav(payload: bytes) -> dict | None:
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid, clen = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        if cid == b"fmt ":
            ch, rate = struct.unpack_from("<HI", payload, i + 10)
            bits = struct.unpack_from("<H", payload, i + 22)[0]
            return {
                "format": "wav",
                "channels": int(ch),
                "sample_rate": int(rate),
                "bit_depth": int(bits),
            }
        i += 8 + clen + (clen & 1)
    return {"format": "wav", "channels": None, "sample_rate": None, "bit_depth": None}


# ---------------------------------------------------------------------------
# PNG decode (spec: RFC 2083) — zlib inflate + scanline unfilter
# ---------------------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """(h, w, channels) uint8 pixels of an 8-bit non-interlaced PNG."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    meta = None
    idat = []
    while i + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth} color={color} interlace={interlace})"
                )
            meta = (int(w), int(h), _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(filters[y])
        line = rows[y].copy()
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative per channel (uint8 wraparound)
            rec = line.reshape(w, ch)
            np.add.accumulate(rec, axis=0, dtype=np.uint8, out=rec)
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = line + prior
        elif f == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prior = out[y]
    return out.reshape(h, w, ch)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG from (h, w, channels) uint8 pixels
    (filter 0 scanlines; zlib level 6)."""
    pixels = np.ascontiguousarray(pixels, np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * ch
    raw = np.zeros((h, stride + 1), np.uint8)
    raw[:, 1:] = pixels.reshape(h, stride)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w, c) pixels — index arithmetic
    only, fully vectorized."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV PCM decode (stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """((n_frames, channels) int16 samples, sample_rate) for 16-bit PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, np.int16).reshape(-1, wf.getnchannels())
        return arr, wf.getframerate()
