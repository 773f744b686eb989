"""Spline (cubic-model) codec — operator: spline_fix.

Reference: ``headers/spline_fix.h:18`` + ``headers/spline_lr.h`` — despite
the name, the shipped model is a CUBIC least-squares fit over the slot
index (``alpha + t1·i + t2·i² + t3·i³``, normal equations ``(AᵀA)⁻¹AᵀY``),
with truncated predictions and fixed-width sign-magnitude residuals — a
second nonlinear family next to poly2 for kinked-but-smooth data.

Divergence (conditioning, not semantics): we fit in the scaled domain
``u = i/(n−1)`` (the raw i³ power sums at 64Ki-row chunks are numerically
rotten) and expand the coefficients back to the i-domain before storing —
decode replays ``trunc(t0 + t1·i + t2·i² + t3·i³)`` from the STORED
doubles, so the fit path cannot affect bit identity. Every float→int64
cast is guarded by ``preds_castable`` (architecture-independence contract,
see ``codecs/base.py``); unusable fits raw-escape.

Layout mirrors poly2 with one extra coefficient::

    max_bit:u8 | t0:f64 | t1:f64 | t2:f64 | t3:f64 | packed signmag | pad
    (raw escape: max_bit = width | raw values)
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


class SplineCodec(IntCodec):
    name = "spline"

    def _fit(self, values: np.ndarray):
        n = values.size
        if n < 4:
            return (float(as_signed64(values)[0]) if n else 0.0, 0.0, 0.0, 0.0)
        s = float(n - 1)
        u = np.arange(n, dtype=np.float64) / s
        y = values.astype(np.float64)
        A = np.column_stack([np.ones(n), u, u * u, u * u * u])
        try:
            coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        except np.linalg.LinAlgError:
            return float(y[0]), 0.0, 0.0, 0.0
        a0, a1, a2, a3 = (float(c) for c in coef)
        # expand u = i/s back to the i-domain the decode contract uses
        return a0, a1 / s, a2 / (s * s), a3 / (s * s * s)

    def _predf(self, t0, t1, t2, t3, idx):
        x = idx.astype(np.float64)
        with np.errstate(over="ignore"):  # t3·x³ may overflow to ±inf; guarded
            return t0 + t1 * x + t2 * x * x + t3 * x * x * x

    def _pred(self, t0, t1, t2, t3, idx):
        # stored coefficients passed preds_castable at encode — never saturates
        return self._predf(t0, t1, t2, t3, idx).astype(np.int64)

    def _residuals_from(self, values, predf):
        pred = predf.astype(np.int64)
        if self.width == 64:
            pred_u = pred.view(_U64)
            sign = values > pred_u
            mag = np.where(sign, values - pred_u, pred_u - values)
        else:
            v64 = values.astype(np.int64)
            sign = v64 > pred
            mag = np.abs(v64 - pred).astype(_U64)
        return sign, mag

    def _recenter(self, values, t0, t1, t2, t3):
        """Midpoint + floor-align intercept candidates (same trick as
        LeCo_fix/poly2); None when no candidate keeps predictions castable.

        Each candidate is priced by RE-EVALUATING the decode expression
        ``(t0+shift) + t1·x + t2·x² + t3·x³`` — NOT ``predf + shift``: float
        addition is non-associative and at 2^64 magnitudes the two differ by
        ulps of 2048, which would make the stored residuals disagree with
        decode's predictions (hypothesis counterexample: constant -11264
        as uint64)."""
        n = values.size
        idx = np.arange(n)
        predf = self._predf(t0, t1, t2, t3, idx)
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
            if not np.isfinite(shift):
                continue
            cpredf = self._predf(t0 + shift, t1, t2, t3, idx)  # decode's expr
            if not preds_castable(cpredf):
                continue
            sign, mag = self._residuals_from(values, cpredf)
            m = int(mag.max()) if n else 0
            if best is None or m < best[0]:
                best = (m, t0 + shift, sign, mag)
        return best

    def size_bytes(self, values: np.ndarray) -> int:
        """Analytic compressed size without packing (for the race gate)."""
        values = np.ascontiguousarray(values, dtype=self.dtype)
        rec = self._recenter(values, *self._fit(values))
        if rec is None:
            return 1 + values.size * self.dtype.itemsize
        max_bit = bits_int(rec[0]) + 1 if rec[0] else 0
        if max_bit >= self.width:
            return 1 + values.size * self.dtype.itemsize
        body = -(-values.size * max_bit // 8)
        return 33 + (body + ref_tail_pad_signmag(body) if max_bit else 0)

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        t0, t1, t2, t3 = self._fit(values)
        rec = self._recenter(values, t0, t1, t2, t3)
        if rec is None:
            return bytes([self.width]) + values.tobytes()
        max_err, t0, sign, mag = rec
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return bytes([self.width]) + values.tobytes()
        out = [bytes([max_bit]), struct.pack("<dddd", t0, t1, t2, t3)]
        if max_bit:
            out.append(pack_signmag(sign, mag, max_bit).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil(n * max_bit / 8))))
        return b"".join(out)

    def _header(self, payload: bytes):
        max_bit = payload[0]
        if max_bit == self.width:
            return max_bit, 0.0, 0.0, 0.0, 0.0, 1
        t0, t1, t2, t3 = struct.unpack_from("<dddd", payload, 1)
        return max_bit, t0, t1, t2, t3, 33

    def _combine(self, pred, sign, mag):
        if self.width == 64:
            pred_u = pred.view(_U64)
            return np.where(sign, pred_u + mag, pred_u - mag).astype(self.dtype)
        vals = np.where(sign, pred + mag.astype(np.int64), pred - mag.astype(np.int64))
        return vals.astype(self.dtype)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, t0, t1, t2, t3, off = self._header(payload)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        pred = self._pred(t0, t1, t2, t3, np.arange(n))
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return self._combine(pred, sign, mag)

    def gather(self, payload, positions, n):
        max_bit, t0, t1, t2, t3, off = self._header(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        pred = self._pred(t0, t1, t2, t3, positions)
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = gather_signmag(np.frombuffer(payload, np.uint8, offset=off), positions, max_bit)
        return self._combine(pred, sign, mag)

    def sum(self, payload: bytes, n: int) -> int:
        """Exact sum of decoded stored values (split-halves trick — see
        Poly2Codec.sum for why signed prediction sums are wrong at 2^63)."""
        vals = self.decode(payload, n)
        if self.width == 64:
            hi = int((vals >> _U64(32)).astype(np.int64).sum(dtype=np.int64))
            lo = int((vals & _U64(0xFFFFFFFF)).astype(np.int64).sum(dtype=np.int64))
            return (hi << 32) + lo
        return int(vals.sum(dtype=np.int64))
