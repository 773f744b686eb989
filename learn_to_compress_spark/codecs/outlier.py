"""LeCo_outlier — outlier-tolerant piecewise-linear codec (operator #17).

Reference: ``headers/piecewise_ransac.h`` (RANSAC line fit + exception
list), ``headers/piecewise_outlier_detect.h``, decode kernel
``headers/bit_read.h:973-1105``. Real transcript/sensor ``ts`` columns have
rare spikes (session gaps, sensor death — FIXTURES.md §1) that blow
LeCo_fix's fixed residual width: one 1-hour gap in a chunk of 1-second
steps forces every slot to spike width. This codec keeps the narrow bulk
width and stores the few spiking rows in an exception list.

Divergence (deliberate, deterministic): instead of RANSAC's random sampling
consensus we use a percentile-trimmed REFIT — fit LS on all values, trim
errors outside [0.5, 99.5]%, refit on inliers, recenter on inliers — then
pick the residual bit width b minimizing the EXACT total cost
``header + n_exc(b)·(4+sizeof(T)) + packed(n, b)`` over all widths (the
reference picks outliers by a σ-threshold; exact-cost width search strictly
dominates and needs no tuning). Deterministic ⇒ resumable encodes stay
bit-identical.

Layout::

    max_bit:u8 | theta0:f64 | theta1:f64 | n_exc:u32 |
    exc_pos:u32[n_exc] (sorted) | exc_val:T[n_exc] |
    packed signmag residuals (n slots, exception slots store 0) | tail-pad

Raw escape: ``max_bit = width | raw values`` (same convention as LeCo_fix).
"""

from __future__ import annotations

import struct

import numpy as np

from ..bitpack import (
    gather_signmag,
    pack_signmag,
    ref_tail_pad_signmag,
    unpack_signmag,
)
from .base import IntCodec, as_signed64, bits_int, preds_castable

_U64 = np.uint64

_HEADER = 1 + 16 + 4  # max_bit + thetas + n_exc


def _packed_bytes(n: int, b: int) -> int:
    if b == 0:
        return 0
    body = -(-n * b // 8)
    return body + ref_tail_pad_signmag(body)


class LecoOutlierCodec(IntCodec):
    name = "leco_outlier"

    # --- fitting -----------------------------------------------------------

    def _ls_fit(self, values: np.ndarray, idx: np.ndarray):
        n = idx.size
        if n == 0:
            return 0.0, 0.0
        if n == 1:
            return float(as_signed64(values)[0]), 0.0
        x = idx.astype(np.float64)
        y = values.astype(np.float64)
        sumx = x.sum()
        sumy = y.sum()
        sumxx = (x * x).sum()
        sumxy = (x * y).sum()
        xxx = sumxx * n - sumx * sumx
        if xxx == 0.0:
            return float(y.mean()), 0.0
        theta1 = (sumxy * n - sumx * sumy) / xxx
        theta0 = (sumy - theta1 * sumx) / n
        return theta0, theta1

    def _mags(self, values: np.ndarray, theta0: float, theta1: float):
        # callers guard with preds_castable first — out-of-range float→int64
        # casts saturate differently per architecture (x86 vs aarch64)
        n = values.size
        pred = (theta0 + theta1 * np.arange(n, dtype=np.float64)).astype(np.int64)
        if self.width == 64:
            pred_u = pred.view(_U64)
            sign = values > pred_u
            mag = np.where(sign, values - pred_u, pred_u - values)
        else:
            v64 = values.astype(np.int64)
            sign = v64 > pred
            mag = np.abs(v64 - pred).astype(_U64)
        return sign, mag, pred

    def _trimmed_fit(self, values: np.ndarray):
        """LS on all → trim error percentiles → refit + midpoint-recenter on
        inliers. Returns (theta0, theta1)."""
        n = values.size
        idx_all = np.arange(n, dtype=np.int64)
        t0, t1 = self._ls_fit(values, idx_all)
        with np.errstate(invalid="ignore", over="ignore"):
            errf = as_signed64(values).astype(np.float64) - (t0 + t1 * idx_all)
            lo, hi = np.percentile(errf, [0.5, 99.5])
            inl = (errf >= lo) & (errf <= hi)
            if 2 <= inl.sum() < n:
                t0, t1 = self._ls_fit(values[inl], idx_all[inl])
                errf = as_signed64(values).astype(np.float64) - (t0 + t1 * idx_all)
                ei = errf[inl]
                t0 += (float(ei.max()) + float(ei.min())) / 2.0
        return t0, t1

    def _best_width(self, mag: np.ndarray):
        """(b, cost_bytes): exact-cost residual width over all candidates."""
        n = mag.size
        sz = self.dtype.itemsize
        smag = np.sort(mag)
        widths = np.arange(0, self.width, dtype=np.int64)
        # outlier threshold for width b: mag >= 2^(b-1) (b=0 ⇒ mag > 0)
        thr = np.empty(widths.size, dtype=_U64)
        thr[0] = 1
        thr[1:] = np.uint64(1) << (widths[1:] - 1).astype(_U64)
        n_exc = n - np.searchsorted(smag, thr, side="left")
        costs = (
            _HEADER
            + n_exc * (4 + sz)
            + np.array([_packed_bytes(n, int(b)) for b in widths])
        )
        k = int(np.argmin(costs))
        return int(widths[k]), int(costs[k])

    def size_bytes(self, values: np.ndarray) -> int:
        """Analytic compressed size (for auto-selection) — one fit + one
        sort, no packing."""
        values = np.ascontiguousarray(values, dtype=self.dtype)
        if values.size == 0:
            return _HEADER
        t0, t1 = self._trimmed_fit(values)
        if not self._castable(t0, t1, values.size):
            return 1 + values.size * self.dtype.itemsize
        _sign, mag, _pred = self._mags(values, t0, t1)
        _b, cost = self._best_width(mag)
        return min(cost, 1 + values.size * self.dtype.itemsize)

    def _castable(self, t0: float, t1: float, n: int) -> bool:
        """Model predictions must stay int64-castable for every slot (the
        arch-independence contract of ``base.preds_castable``); a trimmed fit
        on adversarial data can leave int64 → raw escape."""
        return preds_castable(t0 + t1 * np.arange(n, dtype=np.float64))

    # --- encode / decode ---------------------------------------------------

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        if n == 0:
            return bytes([0]) + struct.pack("<ddI", 0.0, 0.0, 0)
        t0, t1 = self._trimmed_fit(values)
        if not self._castable(t0, t1, n):
            return bytes([self.width]) + values.tobytes()
        sign, mag, _pred = self._mags(values, t0, t1)
        b, cost = self._best_width(mag)
        if cost >= 1 + n * self.dtype.itemsize:
            return bytes([self.width]) + values.tobytes()
        exc = mag > 0 if b == 0 else mag >= (_U64(1) << _U64(b - 1))
        exc_pos = np.flatnonzero(exc).astype(np.uint32)
        out = [
            bytes([b]),
            struct.pack("<ddI", t0, t1, exc_pos.size),
            exc_pos.tobytes(),
            values[exc].tobytes(),
        ]
        if b:
            m = mag.copy()
            m[exc] = 0
            s = sign.copy()
            s[exc] = False
            out.append(pack_signmag(s, m, b).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil(n * b / 8))))
        return b"".join(out)

    def _header(self, payload: bytes):
        max_bit = payload[0]
        if max_bit == self.width:
            return max_bit, 0.0, 0.0, None, None, 1
        t0, t1, n_exc = struct.unpack_from("<ddI", payload, 1)
        off = _HEADER
        exc_pos = np.frombuffer(payload, np.uint32, count=n_exc, offset=off)
        off += 4 * n_exc
        exc_val = np.frombuffer(payload, self.dtype, count=n_exc, offset=off)
        off += self.dtype.itemsize * n_exc
        return max_bit, t0, t1, exc_pos, exc_val, off

    def _pred(self, t0, t1, idx):
        return (t0 + t1 * idx.astype(np.float64)).astype(np.int64)

    def _combine(self, pred, sign, mag):
        if self.width == 64:
            pred_u = pred.view(_U64)
            return np.where(sign, pred_u + mag, pred_u - mag).astype(self.dtype)
        vals = np.where(sign, pred + mag.astype(np.int64), pred - mag.astype(np.int64))
        return vals.astype(self.dtype)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, t0, t1, exc_pos, exc_val, off = self._header(payload)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        pred = self._pred(t0, t1, np.arange(n))
        if max_bit:
            sign, mag = unpack_signmag(
                np.frombuffer(payload, np.uint8, offset=off), n, max_bit
            )
            vals = self._combine(pred, sign, mag)
        else:
            vals = pred.astype(self.dtype)
        if exc_pos is not None and exc_pos.size:
            vals[exc_pos.astype(np.int64)] = exc_val
        return vals

    def gather(self, payload, positions, n):
        max_bit, t0, t1, exc_pos, exc_val, off = self._header(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        pred = self._pred(t0, t1, positions)
        if max_bit:
            sign, mag = gather_signmag(
                np.frombuffer(payload, np.uint8, offset=off), positions, max_bit
            )
            vals = self._combine(pred, sign, mag)
        else:
            vals = pred.astype(self.dtype)
        if exc_pos is not None and exc_pos.size:
            # positions that are exceptions (both sides sorted-searchable)
            exc64 = exc_pos.astype(np.int64)
            j = np.searchsorted(exc64, positions)
            j = np.clip(j, 0, exc64.size - 1)
            hit = exc64[j] == positions
            vals[hit] = exc_val[j[hit]]
        return vals

    def sum(self, payload: bytes, n: int) -> int:
        vals = self.decode(payload, n)
        if self.width == 64:
            hi = int((vals >> _U64(32)).astype(np.int64).sum(dtype=np.int64))
            lo = int((vals & _U64(0xFFFFFFFF)).astype(np.int64).sum(dtype=np.int64))
            return (hi << 32) + lo
        return int(vals.sum(dtype=np.int64))
