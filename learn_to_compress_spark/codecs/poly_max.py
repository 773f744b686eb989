"""Poly_max — auto-degree polynomial with MINIMAX recentering (operator #16
completed: arbitrary-degree "nonlinear fix" + max-recentered variant).

Reference: ``headers/nonlinear_fix.h:18-195`` fits a degree-k polynomial per
block (the repo's committed experiments run k ∈ {2,3});
``headers/poly_fix_integer_template_max.h`` is the minimax-recentered
variant — the stored bit width is ``bits(max|residual|)+1``, so the L∞ error
decides the payload, not the L2 error the LS fit optimizes.

Ours races k ∈ {2, 3} inside one codec and hybridizes the two norms with the
exact hull machinery already built for LeCo_LP (``codecs/leco_lp.py``):
the CURVATURE coefficients (x², x³) come from a numerically-stable LS fit
(scaled-Vandermonde lstsq, coefficients rescaled exactly), then the de-curved
series ``y − Σ_{j≥2} θ_j x^j`` gets the EXACT minimax line via
``chebyshev_line`` — the L∞-optimal (θ0, θ1) given that curvature, strictly
no wider than LS + midpoint shift. The degree with the smaller max residual
wins (ties to the lower degree: smaller header).

Layout: ``max_bit:u8 | deg:u8 | θ0..θdeg:f64 | packed signmag | tail-pad``
(raw escape: ``max_bit=width | raw values``). Predictions are guarded by
``preds_castable`` at encode so decode replays them architecture-
independently, exactly like poly2/spline.
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
from .base import as_signed64, bits_int, preds_castable
from .leco_lp import chebyshev_line
from .poly import Poly2Codec

_U64 = np.uint64


class PolyMaxCodec(Poly2Codec):
    name = "poly_max"
    DEGREES = (2, 3)

    # -- fitting ------------------------------------------------------------

    def _fit_k(self, y: np.ndarray, k: int) -> list[float] | None:
        """LS polynomial of degree k on x = 0..n-1, fit on x/(n-1) for
        conditioning and rescaled exactly (θ'_j = θ_j / (n-1)^j)."""
        n = y.size
        if n <= k + 1:
            return None
        scale = float(n - 1)
        xs = np.arange(n, dtype=np.float64) / scale
        V = np.vander(xs, k + 1, increasing=True)
        try:
            coef, *_ = np.linalg.lstsq(V, y, rcond=None)
        except np.linalg.LinAlgError:
            return None
        th = [float(c) / scale**j for j, c in enumerate(coef)]
        return th if all(np.isfinite(t) for t in th) else None

    def _predf(self, thetas, x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore", invalid="ignore"):
            acc = np.full(x.size, thetas[-1], dtype=np.float64)
            for t in thetas[-2::-1]:  # Horner
                acc = acc * x + t
        return acc

    def _residuals_at(self, values: np.ndarray, pred: np.ndarray):
        """Sign/magnitude of ``values − pred`` in WRAPPING int64 — the
        minimax intercept may sit below zero where an LS fit would not, and
        the unsigned compare poly2 uses would wrap the magnitude to ~2^64
        there. The wrapped signed difference is the true difference whenever
        |diff| < 2^63 (always, for a fit worth storing), and ``_combine``'s
        modular uint64 arithmetic reverses it exactly; a pathological wrap
        lands on max_bit ≥ width and raw-escapes."""
        v64 = values.view(np.int64) if self.width == 64 else values.astype(np.int64)
        with np.errstate(over="ignore"):
            resid = v64 - pred
        sign = resid > 0
        mag = np.abs(resid).view(_U64)
        return sign, mag

    def _pick(self, values: np.ndarray):
        """(thetas, sign, mag, max_err) of the best degree, or None when no
        candidate keeps predictions int64-castable."""
        n = values.size
        if n == 0:
            return None
        yf = as_signed64(values).astype(np.float64)
        x = np.arange(n, dtype=np.float64)
        best = None
        for k in self.DEGREES:
            th = self._fit_k(yf, k)
            if th is None:
                continue
            high = self._predf([0.0, 0.0] + th[2:], x)
            z = yf - high
            if not np.isfinite(z).all():
                continue
            t0, t1 = chebyshev_line(z)
            thetas = [t0, t1] + th[2:]
            predf = self._predf(thetas, x)
            if not preds_castable(predf):
                continue
            sign, mag = self._residuals_at(values, predf.astype(np.int64))
            max_err = int(mag.max()) if n else 0
            if best is None or max_err < best[3]:
                best = (thetas, sign, mag, max_err)
        return best

    # -- codec API ------------------------------------------------------------

    def size_bytes(self, values: np.ndarray) -> int:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        pick = self._pick(values)
        raw_size = 1 + values.size * self.dtype.itemsize
        if pick is None:
            return raw_size
        thetas, _sign, _mag, max_err = pick
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return raw_size
        body = -(-values.size * max_bit // 8)
        hdr = 2 + 8 * len(thetas)
        return hdr + (body + ref_tail_pad_signmag(body) if max_bit else 0)

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        pick = self._pick(values)
        if pick is None:
            return bytes([self.width]) + values.tobytes()
        thetas, sign, mag, max_err = pick
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return bytes([self.width]) + values.tobytes()
        deg = len(thetas) - 1
        out = [bytes([max_bit, deg]), struct.pack(f"<{deg + 1}d", *thetas)]
        if max_bit:
            out.append(pack_signmag(sign, mag, max_bit).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil(n * max_bit / 8))))
        return b"".join(out)

    def _header_max(self, payload: bytes):
        max_bit = payload[0]
        if max_bit == self.width:
            return max_bit, None, 1
        deg = payload[1]
        thetas = list(struct.unpack_from(f"<{deg + 1}d", payload, 2))
        return max_bit, thetas, 2 + 8 * (deg + 1)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, thetas, off = self._header_max(payload)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        pred = self._predf(thetas, np.arange(n, dtype=np.float64)).astype(np.int64)
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return self._combine(pred, sign, mag)

    def gather(self, payload, positions, n):
        max_bit, thetas, off = self._header_max(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        pred = self._predf(thetas, positions.astype(np.float64)).astype(np.int64)
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = gather_signmag(np.frombuffer(payload, np.uint8, offset=off), positions, max_bit)
        return self._combine(pred, sign, mag)
