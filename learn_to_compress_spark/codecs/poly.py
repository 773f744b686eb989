"""Poly2 — degree-2 polynomial model codec (operator #16, "nonlinear fix").

Reference: ``headers/nonlinear_fix.h:18-195`` (quadratic model fit per block,
truncated predictions, fixed-width sign-magnitude residuals; part of the
``best_compress`` candidate set ``experiments/best_compress.cpp:47``).

Our layout mirrors LeCo_fix with one extra coefficient:
``max_bit:u8 | theta0:f64 | theta1:f64 | theta2:f64 | packed signmag | tail-pad``
(raw escape: ``max_bit=width | raw values``). The quadratic LS fit solves the
3x3 normal equations from closed-form power sums — one vector pass over the
chunk, no per-row Python.
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


class Poly2Codec(IntCodec):
    name = "poly2"

    def _fit(self, values: np.ndarray):
        n = values.size
        if n < 3:
            return float(as_signed64(values)[0]) if n else 0.0, 0.0, 0.0
        x = np.arange(n, dtype=np.float64)
        y = values.astype(np.float64)
        # normal equations for [1, x, x^2]; solve with numpy (3x3)
        s1 = float(n)
        sx = x.sum()
        sx2 = (x * x).sum()
        x2 = x * x
        sx3 = (x2 * x).sum()
        sx4 = (x2 * x2).sum()
        sy = y.sum()
        sxy = (x * y).sum()
        sx2y = (x2 * y).sum()
        A = np.array([[s1, sx, sx2], [sx, sx2, sx3], [sx2, sx3, sx4]])
        b = np.array([sy, sxy, sx2y])
        try:
            t0, t1, t2 = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            return float(y[0]), 0.0, 0.0
        return float(t0), float(t1), float(t2)

    def _pred(self, t0, t1, t2, idx):
        # encode guards (preds_castable) guarantee stored models keep every
        # prediction inside int64, so this cast is architecture-independent
        x = idx.astype(np.float64)
        return (t0 + t1 * x + t2 * x * x).astype(np.int64)

    def _residuals(self, values, t0, t1, t2):
        pred = self._pred(t0, t1, t2, np.arange(values.size))
        if self.width == 64:
            pred_u = pred.view(_U64)
            sign = values > pred_u
            mag = np.where(sign, values - pred_u, pred_u - values)
        else:
            v64 = values.astype(np.int64)
            sign = v64 > pred
            mag = np.abs(v64 - pred).astype(_U64)
        return sign, mag, pred

    def _recenter(self, values, t0, t1, t2):
        """Midpoint intercept recenter (same trick as LeCo_fix,
        ``piecewise_fix_integer_template.h:36-46``) + floor-align candidate.
        Returns ``None`` when no candidate keeps predictions int64-castable
        (architecture-independent contract — see ``base.preds_castable``);
        callers raw-escape."""
        n = values.size
        x = np.arange(n, dtype=np.float64)
        with np.errstate(over="ignore"):  # t2·x² may overflow to ±inf; guarded below
            predf = t0 + t1 * x + t2 * x * x
        errf = as_signed64(values).astype(np.float64) - predf
        if preds_castable(predf):
            err = as_signed64(values) - predf.astype(np.int64)
            mid = (int(err.max()) + int(err.min())) / 2.0
        else:
            with np.errstate(invalid="ignore"):
                mid = (float(errf.max()) + float(errf.min())) / 2.0 if n else 0.0
        with np.errstate(invalid="ignore"):
            hf = float(errf.max()) if n else 0.0
        best = None
        for shift in (mid, hf):
            cand = t0 + shift
            if not np.isfinite(shift) or not preds_castable(predf + shift):
                continue
            sign, mag, _ = self._residuals(values, cand, t1, t2)
            m = int(mag.max()) if n else 0
            if best is None or m < best[0]:
                best = (m, cand, sign, mag)
        if best is None:
            return None
        return best[1], best[2], best[3], best[0]

    def size_bytes(self, values: np.ndarray) -> int:
        """Analytic compressed size without packing (for auto-selection)."""
        values = np.ascontiguousarray(values, dtype=self.dtype)
        t0, t1, t2 = self._fit(values)
        rec = self._recenter(values, t0, t1, t2)
        if rec is None:
            return 1 + values.size * self.dtype.itemsize
        max_err = rec[3]
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return 1 + values.size * self.dtype.itemsize
        body = -(-values.size * max_bit // 8)
        return 25 + (body + ref_tail_pad_signmag(body) if max_bit else 0)

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        t0, t1, t2 = self._fit(values)
        rec = self._recenter(values, t0, t1, t2)
        if rec is None:
            return bytes([self.width]) + values.tobytes()
        t0, sign, mag, max_err = rec
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return bytes([self.width]) + values.tobytes()
        out = [bytes([max_bit]), struct.pack("<ddd", t0, t1, t2)]
        if max_bit:
            out.append(pack_signmag(sign, mag, max_bit).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil(n * max_bit / 8))))
        return b"".join(out)

    def _header(self, payload: bytes):
        max_bit = payload[0]
        if max_bit == self.width:
            return max_bit, 0.0, 0.0, 0.0, 1
        t0, t1, t2 = struct.unpack_from("<ddd", payload, 1)
        return max_bit, t0, t1, t2, 25

    def _combine(self, pred, sign, mag):
        if self.width == 64:
            pred_u = pred.view(_U64)
            return np.where(sign, pred_u + mag, pred_u - mag).astype(self.dtype)
        vals = np.where(sign, pred + mag.astype(np.int64), pred - mag.astype(np.int64))
        return vals.astype(self.dtype)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, t0, t1, t2, off = self._header(payload)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        pred = self._pred(t0, t1, t2, np.arange(n))
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return self._combine(pred, sign, mag)

    def gather(self, payload, positions, n):
        max_bit, t0, t1, t2, off = self._header(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        pred = self._pred(t0, t1, t2, positions)
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = gather_signmag(np.frombuffer(payload, np.uint8, offset=off), positions, max_bit)
        return self._combine(pred, sign, mag)

    def sum(self, payload: bytes, n: int) -> int:
        """Exact sum of the decoded stored values (see LecoFixCodec.sum —
        summing signed predictions is wrong for width-64 sign-flipped
        columns whose stored values sit near 2^63)."""
        vals = self.decode(payload, n)
        if self.width == 64:
            hi = int((vals >> _U64(32)).astype(np.int64).sum(dtype=np.int64))
            lo = int((vals & _U64(0xFFFFFFFF)).astype(np.int64).sum(dtype=np.int64))
            return (hi << 32) + lo
        return int(vals.sum(dtype=np.int64))
