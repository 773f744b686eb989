"""Delta_var — variable-length delta segmentation (operator #13, ``delta_cost``).

Reference: ``headers/delta_cost_integer_template.h:16-495`` and the merge
variant ``headers/delta_cost_merge_integer_template.h`` — segments of
consecutive-difference encoding whose boundaries are chosen by compressed
byte cost, so one wide outlier jump doesn't inflate the fixed delta width of
a whole block.

Our algorithm reaches the same cost optimum differently (NOT a port):
top-down recursive split at the widest |diff| whenever the two halves (plus
per-segment overhead) serialize smaller, then a bounded merge pass — the
same skeleton as our LeCo_var (``leco_var.py``), with the model swapped for
"first value + fixed-width sign-magnitude deltas". Segment routing at decode
is ``np.searchsorted`` over the start array.

Layout: ``n_segs:u32 | starts u32[n_segs] | (bits:u8, first:T)[n_segs] |
delta bitstreams (each segment byte-aligned)``; ``bits >= width`` escapes a
segment to raw values.
"""

from __future__ import annotations

import struct

import numpy as np

from ..bitpack import pack_signmag, unpack_signmag
from .base import IntCodec, bits_int

_MIN_SEG = 16


class DeltaVarCodec(IntCodec):
    name = "delta_var"

    def _seg_meta(self) -> int:
        return 4 + 1 + self.dtype.itemsize  # start:u32 + bits:u8 + first:T

    def _seg_cost(self, w: np.ndarray, s: int, e: int):
        """(bytes, bits, argmax_width) of segment [s, e) given per-gap
        sign-magnitude widths ``w`` (w[i] covers the gap i → i+1)."""
        m = e - s
        if m <= 1:
            return self._seg_meta(), 0, s
        win = w[s : e - 1]
        amax = int(win.argmax())
        l = int(win[amax])
        if l >= self.width:
            return self._seg_meta() + m * self.dtype.itemsize, self.width, s + amax
        return self._seg_meta() + (-(-(m - 1) * l // 8)), l, s + amax

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        if n == 0:
            return struct.pack("<I", 0)
        cur, prev = values[1:], values[:-1]
        sign = cur > prev
        mag = np.where(sign, cur - prev, prev - cur).astype(np.uint64)
        # per-gap sign-magnitude width
        w = np.zeros(max(n - 1, 0), dtype=np.int64)
        nz = mag > 0
        w[nz] = np.floor(np.log2(mag[nz].astype(np.float64))).astype(np.int64) + 2
        # exact for powers straddling float rounding
        bad = (np.uint64(1) << np.maximum(w - 1, 0).astype(np.uint64)) <= mag
        w[bad] += 1

        segments: list[tuple[int, int, int]] = []  # (s, e, bits)
        stack = [(0, n)]
        while stack:
            s, e = stack.pop()
            cost, l, amax = self._seg_cost(w, s, e)
            if e - s >= 2 * _MIN_SEG:
                k = int(np.clip(amax + 1, s + _MIN_SEG, e - _MIN_SEG))
                cl, *_ = self._seg_cost(w, s, k)
                cr, *_ = self._seg_cost(w, k, e)
                if cl + cr < cost:
                    stack.append((k, e))
                    stack.append((s, k))
                    continue
            segments.append((s, e, l))
        segments.sort(key=lambda t: t[0])

        # bounded merge pass (merge skeleton of delta_cost_merge)
        for _ in range(2):
            merged, i, changed = [], 0, False
            while i < len(segments):
                if i + 1 < len(segments):
                    s0, e0, _l0 = segments[i]
                    s1, e1, _l1 = segments[i + 1]
                    c_sep = self._seg_cost(w, s0, e0)[0] + self._seg_cost(w, s1, e1)[0]
                    cm, lm, _ = self._seg_cost(w, s0, e1)
                    if cm < c_sep:
                        merged.append((s0, e1, lm))
                        i += 2
                        changed = True
                        continue
                merged.append(segments[i])
                i += 1
            segments = merged
            if not changed:
                break

        header = [struct.pack("<I", len(segments))]
        header.append(np.array([s for s, _e, _l in segments], dtype=np.uint32).tobytes())
        payloads = []
        for s, e, l in segments:
            header.append(struct.pack("<B", l))
            header.append(self.dtype.type(values[s]).tobytes())
            m = e - s
            if m <= 1 or l == 0:
                continue
            if l >= self.width:
                payloads.append(values[s:e].tobytes())
                continue
            payloads.append(pack_signmag(sign[s : e - 1], mag[s : e - 1], l).tobytes())
        return b"".join(header + payloads)

    def _parse(self, payload: bytes):
        (n_segs,) = struct.unpack_from("<I", payload, 0)
        starts = np.frombuffer(payload, np.uint32, count=n_segs, offset=4).astype(np.int64)
        off = 4 + 4 * n_segs
        sz = self.dtype.itemsize
        metas = []
        for i in range(n_segs):
            l = payload[off]
            first = np.frombuffer(payload, self.dtype, count=1, offset=off + 1)[0]
            metas.append((l, first))
            off += 1 + sz
        return starts, metas, off

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        starts, metas, off = self._parse(payload)
        ends = np.concatenate((starts[1:], [n])) if len(starts) else np.array([], np.int64)
        out = np.empty(n, dtype=self.dtype)
        buf = np.frombuffer(payload, np.uint8)
        for (s, e), (l, first) in zip(zip(starts, ends), metas):
            m = int(e - s)
            if l >= self.width:
                out[s:e] = np.frombuffer(payload, self.dtype, count=m, offset=off)
                off += m * self.dtype.itemsize
                continue
            out[s] = first
            if m <= 1 or l == 0:
                if m > 1:
                    out[s + 1 : e] = first
                continue
            nbytes = -(-(m - 1) * l // 8)
            sign, mag = unpack_signmag(buf[off : off + nbytes], m - 1, l)
            diffs = np.where(sign, mag, (~mag) + np.uint64(1))
            acc = np.empty(m, dtype=np.uint64)
            acc[0] = np.uint64(first)
            np.cumsum(diffs, out=acc[1:])
            acc[1:] += np.uint64(first)
            out[s:e] = acc.astype(self.dtype)
            off += nbytes
        return out

    def sum(self, payload: bytes, n: int) -> int:
        return int(self.decode(payload, n).sum(dtype=object))
