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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        info = probe_avi(payload)
        if info:
            return {"format": "avi", "width": info["width"],
                    "height": info["height"], "channels": None}
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        info = probe_mp4(payload)
        if info:
            return {"format": "mp4", "width": info["width"],
                    "height": info["height"], "channels": None}
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


# ---------------------------------------------------------------------------
# Video containers: MP4 (ISO/IEC 14496-12 box structure) and AVI (RIFF).
# Public-spec header parsing only — no codec decode (no ffmpeg in scope);
# gives REAL per-frame timestamps so frame sampling fans out over actual
# media structure instead of synthesized metadata.
# ---------------------------------------------------------------------------


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in [start, end)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, off)
        btype = bytes(buf[off + 4 : off + 8])
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            body = off + 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < 8 or off + size > end:
            return
        yield btype, body, off + size
        off += size


def _find_box(buf: bytes, start: int, end: int, path: list[bytes]):
    """Body range of the first box at the given nesting path, or None."""
    for btype, b0, b1 in _iter_boxes(buf, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find_box(buf, b0, b1, path[1:])
    return None


def probe_mp4(payload: bytes) -> dict | None:
    """MP4/ISO-BMFF: movie duration + the video track's true per-frame
    timestamps from the ``stts`` (decoding time-to-sample) table.

    Returns ``{"format": "mp4", "duration_ms", "frame_times_ms",
    "width", "height"}`` or None when the payload isn't ISO-BMFF. Spec:
    ISO/IEC 14496-12 §8.2.2 (mvhd), §8.3.2 (tkhd), §8.4.2 (mdhd),
    §8.4.3 (hdlr), §8.6.1.2 (stts).

    Track selection: only a trak whose ``hdlr`` handler_type is ``vide``
    supplies ``frame_times_ms`` — in common real-world files the audio trak
    precedes the video trak, and its stts rows are audio sample-chunk times,
    not frames. Falls back to the first stts-bearing trak only when no video
    trak exists."""
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None
    moov = _find_box(payload, 0, n, [b"moov"])
    if moov is None:
        return None
    m0, m1 = moov
    out: dict = {"format": "mp4", "duration_ms": None, "frame_times_ms": None,
                 "width": None, "height": None}
    mvhd = _find_box(payload, m0, m1, [b"mvhd"])
    if mvhd is not None:
        v = payload[mvhd[0]]
        if v == 1:
            ts, dur = struct.unpack_from(">IQ", payload, mvhd[0] + 20)
        else:
            ts, dur = struct.unpack_from(">II", payload, mvhd[0] + 12)
        if ts:
            out["duration_ms"] = int(dur * 1000 // ts)
    video_cand = None  # (frame_times_ms, trak_dur_ms) from a 'vide' trak
    fallback_cand = None  # first stts-bearing trak of any handler type
    for btype, t0, t1 in _iter_boxes(payload, m0, m1):
        if btype != b"trak":
            continue
        tkhd = _find_box(payload, t0, t1, [b"tkhd"])
        if tkhd is not None:
            v = payload[tkhd[0]]
            wh_off = tkhd[0] + (96 if v == 1 else 84) - 8
            if wh_off + 8 <= tkhd[1]:
                w, h = struct.unpack_from(">II", payload, wh_off)
                if w and h:  # 16.16 fixed point; audio tracks carry 0x0
                    out["width"], out["height"] = w >> 16, h >> 16
        mdia = _find_box(payload, t0, t1, [b"mdia"])
        if mdia is None:
            continue
        # handler type: frame timestamps only make sense for a video trak
        hdlr = _find_box(payload, mdia[0], mdia[1], [b"hdlr"])
        is_video = (
            hdlr is not None
            and hdlr[0] + 12 <= hdlr[1]
            and bytes(payload[hdlr[0] + 8 : hdlr[0] + 12]) == b"vide"
        )
        if video_cand is not None or (fallback_cand is not None and not is_video):
            continue  # already have a better-or-equal candidate
        mdhd = _find_box(payload, mdia[0], mdia[1], [b"mdhd"])
        stts = _find_box(payload, mdia[0], mdia[1], [b"minf", b"stbl", b"stts"])
        if mdhd is None or stts is None:
            continue
        v = payload[mdhd[0]]
        if v == 1:
            (mts,) = struct.unpack_from(">I", payload, mdhd[0] + 20)
        else:
            (mts,) = struct.unpack_from(">I", payload, mdhd[0] + 12)
        (n_entries,) = struct.unpack_from(">I", payload, stts[0] + 4)
        ent = np.frombuffer(
            payload, ">u4", count=2 * n_entries, offset=stts[0] + 8
        ).reshape(n_entries, 2).astype(np.int64)
        deltas = np.repeat(ent[:, 1], ent[:, 0])
        if deltas.size and mts:
            starts = np.concatenate(([0], np.cumsum(deltas[:-1])))
            cand = (
                (starts * 1000 // mts).astype(np.int64),
                int(deltas.sum() * 1000 // mts),
            )
            if is_video:
                video_cand = cand
            elif fallback_cand is None:
                fallback_cand = cand
    chosen = video_cand if video_cand is not None else fallback_cand
    if chosen is not None:
        out["frame_times_ms"] = chosen[0]
        if out["duration_ms"] is None:
            out["duration_ms"] = chosen[1]
    return out


def probe_avi(payload: bytes) -> dict | None:
    """AVI (RIFF): fixed frame rate + count from the ``avih`` main header
    (dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight — public
    AVIMAINHEADER layout). Frame k's timestamp = k · µs_per_frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    # avih is the first chunk inside LIST/hdrl; scan RIFF chunks for it
    off, end = 12, len(payload)
    while off + 8 <= end:
        ctype = bytes(payload[off : off + 4])
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = off + 8
        if ctype == b"LIST" and payload[body : body + 4] == b"hdrl":
            off = body + 4
            continue
        if ctype == b"avih" and size >= 40:
            us_per_frame, _rate, _pad, _flags = struct.unpack_from("<IIII", payload, body)
            total, _init, _streams, _bufsz, w, h = struct.unpack_from(
                "<IIIIII", payload, body + 16
            )
            times = (
                (np.arange(total, dtype=np.int64) * us_per_frame) // 1000
                if us_per_frame
                else np.zeros(total, dtype=np.int64)
            )
            return {
                "format": "avi",
                "duration_ms": int(total * us_per_frame // 1000),
                "frame_times_ms": times,
                "width": int(w),
                "height": int(h),
            }
        off = body + size + (size & 1)
    return None


def video_frame_times(payload: bytes):
    """Per-frame timestamps (ms, int64 array) from a video container, or
    None when the payload is not a parseable MP4/AVI."""
    info = probe_mp4(payload) or probe_avi(payload)
    if info is None or info.get("frame_times_ms") is None:
        return None
    return info["frame_times_ms"]
