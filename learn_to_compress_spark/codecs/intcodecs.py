"""Integer chunk codecs: raw / FOR / Delta / LeCo_fix / RLE.

Byte layouts follow the reference headers exactly (file:line cited per codec)
so compressed sizes are directly comparable; kernels are vectorized numpy.
Decode is a lossless bit-identical roundtrip of the input chunk.
"""

from __future__ import annotations

import struct

import numpy as np

from ..bitpack import (
    gather_signmag,
    gather_unsigned,
    pack_signmag,
    pack_unsigned,
    ref_tail_pad_signmag,
    ref_tail_pad_unsigned,
    unpack_signmag,
    unpack_unsigned,
    unpack_unsigned_ragged,
)
from .base import IntCodec, as_signed64, bits_int, preds_castable

_U64 = np.uint64


class RawCodec(IntCodec):
    """Escape codec — little-endian memcpy of the values.

    Reference analogue: ``JustCopy`` (``headers/codecs.h:72-130``) and the
    raw-escape branches of every codec."""

    name = "raw"

    def encode(self, values: np.ndarray) -> bytes:
        return np.ascontiguousarray(values, dtype=self.dtype).tobytes()

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        return np.frombuffer(payload, dtype=self.dtype, count=n).copy()

    def gather(self, payload, positions, n):
        arr = np.frombuffer(payload, dtype=self.dtype, count=n)
        return arr[np.asarray(positions, dtype=np.int64)]


class ForCodec(IntCodec):
    """Frame-of-reference: subtract chunk min, bit-pack unsigned residuals.

    Layout (``headers/FOR_integer_template.h:26-81``):
    ``max_bit:u8 | min:T | max:T | packed(u, max_bit) | tail-pad``.
    Raw escape writes ``max_bit=width | raw values``. We escape already at
    ``max_bit >= width-1`` because the reference *decoder* treats any header
    ``>= width-1`` as raw (``FOR_integer_template.h:87``) — encoding packed at
    width-1 would be undecodable there.
    """

    name = "for"

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        m = values.min()
        mx = values.max()
        max_bit = bits_int(int(mx) - int(m))
        if max_bit >= self.width - 1:
            return bytes([self.width]) + values.tobytes()
        out = [bytes([max_bit]), self.dtype.type(m).tobytes(), self.dtype.type(mx).tobytes()]
        if max_bit:
            resid = (values - m).astype(_U64)
            packed = pack_unsigned(resid, max_bit)
            out.append(packed.tobytes())
            out.append(b"\x00" * ref_tail_pad_unsigned(max_bit))
        return b"".join(out)

    def _header(self, payload: bytes):
        max_bit = payload[0]
        if max_bit >= self.width - 1:
            return max_bit, None, None, 1
        sz = self.dtype.itemsize
        m = np.frombuffer(payload, dtype=self.dtype, count=1, offset=1)[0]
        mx = np.frombuffer(payload, dtype=self.dtype, count=1, offset=1 + sz)[0]
        return max_bit, m, mx, 1 + 2 * sz

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, m, _mx, off = self._header(payload)
        if max_bit >= self.width - 1:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        if max_bit == 0:
            return np.full(n, m, dtype=self.dtype)
        resid = unpack_unsigned(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return (resid.astype(self.dtype) + m).astype(self.dtype, copy=False)

    def gather(self, payload, positions, n):
        max_bit, m, _mx, off = self._header(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit >= self.width - 1:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        if max_bit == 0:
            return np.full(len(positions), m, dtype=self.dtype)
        resid = gather_unsigned(np.frombuffer(payload, np.uint8, offset=off), positions, max_bit)
        return (resid.astype(self.dtype) + m).astype(self.dtype)

    def sum(self, payload: bytes, n: int) -> int:
        max_bit, m, _mx, off = self._header(payload)
        if max_bit >= self.width - 1:
            return int(np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).sum(dtype=object))
        if max_bit == 0:
            return int(m) * n
        resid = unpack_unsigned(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return int(m) * n + int(resid.sum(dtype=object))

    def filter_gt(self, payload: bytes, n: int, v: int) -> np.ndarray:
        """Zone-prune on (min,max) like ``FOR_integer_template.h:115-164``:
        skip the payload entirely when max <= v, take all when min > v."""
        max_bit, m, mx, off = self._header(payload)
        if max_bit < self.width - 1:
            if int(mx) <= v:
                return np.empty(0, dtype=np.int64)
            if int(m) > v:
                return np.arange(n, dtype=np.int64)
        return np.flatnonzero(self.decode(payload, n) > self.dtype.type(v))

    def filter_mod_band(self, payload: bytes, n: int, base: int, lo: int, hi: int):
        """Period-intersection pruning on the exact (min, max) header for
        ``lo < value % base < hi`` (``headers/FOR_integer_template.h:166-215``:
        the reference walks the periods intersecting the block's value range
        and skips the payload when no band window intersects it). Returns
        ``(positions, n_decoded)`` with ``n_decoded == 0`` when the header
        alone decides (band misses the whole range → empty; band covers the
        whole range → all rows), or None when the block straddles band
        boundaries — the caller's single full decode is then the exact cost
        the reference pays too."""
        max_bit, m, mx, off = self._header(payload)
        if max_bit >= self.width - 1:
            return None  # raw escape: no (min,max) header to prune on
        if hi - lo <= 1:
            return np.empty(0, dtype=np.int64), 0  # empty band
        m_i, mx_i = int(m), int(mx)
        if mx_i >= 2**63:
            return None  # signed-view domain mismatch — decode exactly
        if lo < 0 and hi > base - 1:
            return np.arange(n, dtype=np.int64), 0  # band = every residue
        p_lo, p_hi = m_i // base, mx_i // base
        if p_hi - p_lo > 64:
            # ≥63 FULL periods inside the range: each contains both in-band
            # and out-of-band values, so nothing can be decided header-only
            return None
        any_hit = False
        covered = True
        for p in range(p_lo, p_hi + 1):
            w_lo = max(m_i, p * base) - p * base  # window of [m,mx] in p
            w_hi = min(mx_i, (p + 1) * base - 1) - p * base
            if w_lo > w_hi:
                continue
            if w_hi > lo and w_lo < hi:
                any_hit = True
                if not (w_lo > lo and w_hi < hi):
                    covered = False
            else:
                covered = False
        if not any_hit:
            return np.empty(0, dtype=np.int64), 0
        if covered:
            return np.arange(n, dtype=np.int64), 0
        return None


class DeltaCodec(IntCodec):
    """Delta_fix: first value + sign-magnitude bit-packed consecutive diffs.

    Layout (``headers/delta_integer_template.h:26-87``):
    ``max_bit:u8 | first:T | packed_signmag(n-1, max_bit) | tail-pad``;
    raw escape at ``max_bit == width``.
    """

    name = "delta"

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        if n <= 1:
            return bytes([0]) + values.tobytes()
        cur = values[1:]
        prev = values[:-1]
        sign = cur > prev  # True => positive diff (bit_write sign convention)
        mag = np.where(sign, cur - prev, prev - cur).astype(_U64)
        max_bit = bits_int(int(mag.max())) + 1 if mag.any() else 0
        if max_bit > self.width:
            max_bit = self.width
        if max_bit == self.width:
            return bytes([self.width]) + values.tobytes()
        out = [bytes([max_bit]), values[:1].tobytes()]
        if max_bit:
            out.append(pack_signmag(sign, mag, max_bit).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil((n - 1) * max_bit / 8))))
        return b"".join(out)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit = payload[0]
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=1).copy()
        first = np.frombuffer(payload, dtype=self.dtype, count=1, offset=1)[0]
        if max_bit == 0 or n == 1:
            return np.full(n, first, dtype=self.dtype)
        off = 1 + self.dtype.itemsize
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n - 1, max_bit)
        diffs = np.where(sign, mag, (~mag) + _U64(1))  # two's-complement negate
        out = np.empty(n, dtype=_U64)
        out[0] = _U64(first)
        np.cumsum(diffs, out=out[1:])
        out[1:] += _U64(first)
        return out.astype(self.dtype)

    def sum(self, payload: bytes, n: int) -> int:
        return int(self.decode(payload, n).sum(dtype=object))


class LecoFixCodec(IntCodec):
    """LeCo_fix — the flagship codec (``headers/piecewise_fix_integer_template.h:27-140``).

    Encode: least-squares line over slot index (``headers/lr.h:61-87``),
    intercept recentered by ``(max_err+min_err)/2`` (``:36-46``), residual =
    value − trunc_toward_zero(theta0 + theta1·i) as sign-magnitude slots of
    fixed width ``bits(max|resid|)+1``; raw escape at full type width;
    0-bit payload for pure-model chunks.

    Layout: ``max_bit:u8 | theta0:f64 | theta1:f64 | packed | tail-pad``
    (raw escape: ``max_bit=width | raw values``).

    Divergence note: the reference accumulates the LS sums in a serial C
    loop; numpy's pairwise summation can differ in the last ulp of theta,
    which may flip residual widths on adversarial data. Decode remains
    bit-identical (theta is stored), sizes match in practice.
    """

    name = "leco"

    def _fit(self, values: np.ndarray):
        n = values.size
        if n == 1:
            return float(as_signed64(values)[0]), 0.0
        x = np.arange(n, dtype=np.float64)
        y = values.astype(np.float64)
        sumx = x.sum()
        sumy = y.sum()
        sumxx = (x * x).sum()
        sumxy = (x * y).sum()
        ccc = sumxy * n - sumx * sumy
        xxx = sumxx * n - sumx * sumx
        theta1 = ccc / xxx
        theta0 = (sumy - theta1 * sumx) / n
        return theta0, theta1

    def _residuals(self, values: np.ndarray, theta0: float, theta1: float):
        n = values.size
        pred = (theta0 + theta1 * np.arange(n, dtype=np.float64)).astype(np.int64)
        if self.width == 64:
            pred_u = pred.view(_U64)
            sign = values > pred_u  # uint64 domain, like C's usual conversions
            mag = np.where(sign, values - pred_u, pred_u - values)
        else:
            v64 = values.astype(np.int64)
            sign = v64 > pred
            mag = np.abs(v64 - pred).astype(_U64)
        return sign, mag, pred

    def _recenter(self, values: np.ndarray, theta0: float, theta1: float):
        """Pick the intercept shift with the smallest residual width, or
        ``None`` when no shift keeps predictions int64-castable (raw escape).

        Candidate A is the reference's midpoint recenter
        (``piecewise_fix_integer_template.h:36-46``). Candidate B aligns the
        continuous error range just below zero so that an exactly-quantized
        ramp (error width < 1, e.g. the SOSD linear dataset) truncates to
        ZERO residuals — a strict improvement the reference misses; decode
        is unchanged (theta is stored).

        Every float→int64 cast is guarded by ``preds_castable`` FIRST: out of
        range the cast saturates differently per architecture (x86 →
        INT64_MIN both directions, aarch64 → nearest bound), which would make
        a store written on one arch decode differently on another."""
        n = values.size
        x = np.arange(n, dtype=np.float64)
        predf = theta0 + theta1 * x
        yf = as_signed64(values).astype(np.float64)
        errf = yf - predf
        if preds_castable(predf):
            # exact int-domain error range drives the midpoint candidate
            err = as_signed64(values) - predf.astype(np.int64)
            mid = (int(err.max()) + int(err.min())) / 2.0
        else:
            # unshifted fit already leaves int64 — approximate the midpoint
            # in the float domain; the per-candidate guard below stays exact
            mid = (float(errf.max()) + float(errf.min())) / 2.0 if n else 0.0
        hf = float(errf.max()) if n else 0.0
        best = None
        for shift in (mid, hf):
            t0 = theta0 + shift
            if not np.isfinite(shift) or not preds_castable(predf + shift):
                continue
            sign, mag, _ = self._residuals(values, t0, theta1)
            m = int(mag.max()) if n else 0
            if best is None or m < best[0]:
                best = (m, t0, sign, mag)
        if best is None:  # no castable candidate — caller must raw-escape
            return None
        return best[1], best[2], best[3], best[0]

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        theta0, theta1 = self._fit(values)
        rec = self._recenter(values, theta0, theta1)
        if rec is None:
            return bytes([self.width]) + values.tobytes()
        theta0, sign, mag, max_error = rec
        max_bit = bits_int(max_error) + 1 if max_error else 0
        if max_bit > self.width:
            max_bit = self.width
        if max_bit == self.width:
            return bytes([self.width]) + values.tobytes()
        out = [bytes([max_bit]), struct.pack("<dd", theta0, theta1)]
        if max_bit:
            out.append(pack_signmag(sign, mag, max_bit).tobytes())
            out.append(b"\x00" * ref_tail_pad_signmag(int(np.ceil(n * max_bit / 8))))
        return b"".join(out)

    def _header(self, payload: bytes):
        max_bit = payload[0]
        if max_bit == self.width:
            return max_bit, 0.0, 0.0, 1
        theta0, theta1 = struct.unpack_from("<dd", payload, 1)
        return max_bit, theta0, theta1, 17

    def _pred(self, theta0, theta1, idx):
        # stored thetas passed preds_castable at encode, so this cast never
        # saturates (saturation is architecture-dependent: x86 vs aarch64)
        return (theta0 + theta1 * idx.astype(np.float64)).astype(np.int64)

    def _combine(self, pred, sign, mag):
        if self.width == 64:
            pred_u = pred.view(_U64)
            return np.where(sign, pred_u + mag, pred_u - mag).astype(self.dtype)
        vals = np.where(sign, pred + mag.astype(np.int64), pred - mag.astype(np.int64))
        return vals.astype(self.dtype)

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        max_bit, theta0, theta1, off = self._header(payload)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off).copy()
        pred = self._pred(theta0, theta1, np.arange(n))
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        return self._combine(pred, sign, mag)

    def decode_many(self, payloads, ns) -> list:
        """Batched decode: ONE join of every payload, then per-block-length
        groups run as ONE prediction matrix + ONE ragged bit-unpack, with all
        residual widths handled in the same gather (per-row shifts/masks).

        This is the engine-side twin of the reference's timed full-decode
        loop (``experiments/leco_int_template.cpp:112-131``): at the tiny
        block sizes its benchmarks sweep (100–2000 values,
        ``benchmark/fix_int_benchmark.py:16-26``) per-block kernel-call
        overhead would dominate; batching amortizes it across the column.
        Bit-identical to per-block :meth:`decode` (asserted by tests)."""
        B = len(payloads)
        out: list = [None] * B
        if B == 0:
            return out
        ns_list = [int(n) for n in ns]
        if min(ns_list) >= 1024:
            # large blocks: per-block working sets fit in L2 and reuse it
            # across the ~8 kernel ops, while a (B, n) matrix streams DRAM
            # on every op — measured crossover ≈ 768 values (per-block wins
            # 24.9 vs 31.5 ns/int at n=1024; batched wins 40 vs 50 at 512)
            return [self.decode(p, n) for p, n in zip(payloads, ns_list)]
        lens = np.fromiter((len(p) for p in payloads), np.int64, count=B)
        starts = np.empty(B, dtype=np.int64)
        starts[0] = 0
        np.cumsum(lens[:-1], out=starts[1:])
        flat = np.frombuffer(b"".join(payloads) + b"\x00" * 16, dtype=np.uint8)
        mb = flat[starts].astype(np.int64)
        ns_arr = np.asarray(ns, dtype=np.int64)
        raw_rows = np.nonzero(mb == self.width)[0]
        for i in raw_rows:  # raw escape — a frombuffer is already flat
            out[i] = np.frombuffer(payloads[i], dtype=self.dtype, count=ns_arr[i], offset=1).copy()
        model = np.nonzero(mb != self.width)[0]
        for n in np.unique(ns_arr[model]):
            idxs = model[ns_arr[model] == n]
            if n >= 1024:  # mixed input: large groups take the cache path
                for i in idxs:
                    out[i] = self.decode(payloads[i], int(n))
                continue
            s = starts[idxs]
            th = np.ascontiguousarray(flat[s[:, None] + np.arange(1, 17)]).view("<f8")
            x = np.arange(int(n), dtype=np.float64)
            # stored thetas passed preds_castable at encode — never saturates
            pred = (th[:, 0:1] + th[:, 1:2] * x[None, :]).astype(np.int64)
            l = mb[idxs]
            z = np.flatnonzero(l == 0)
            if z.size:
                # pure-model blocks (exactly-quantized fits are COMMON — the
                # floor-align recenter makes linear data mb=0): the value IS
                # the prediction, skip the whole residual pipeline
                vz = pred[z].astype(self.dtype, copy=False)
                for j, i in enumerate(idxs[z]):
                    out[i] = vz[j]
            nz = np.flatnonzero(l > 0)
            if not nz.size:
                continue
            if z.size:
                idxs, s, l, pred = idxs[nz], s[nz], l[nz], pred[nz]
            slots = unpack_unsigned_ragged(flat, s + 17, l, int(n))
            lm1 = (l - 1).astype(_U64)
            # bool cast ON PURPOSE: np.where over a 1-byte condition is
            # measurably faster than testing 8-byte u64 nonzero
            sign = (slots >> lm1[:, None]).astype(bool)
            mag = slots & ((_U64(1) << lm1) - _U64(1))[:, None]
            if self.width == 64:
                pred_u = pred.view(_U64)
                vals = np.where(sign, pred_u + mag, pred_u - mag).astype(
                    self.dtype, copy=False
                )
            else:
                # view, not astype: mag < 2^62 so the bit pattern IS the
                # signed value — saves a full-matrix copy
                m64 = mag.view(np.int64)
                vals = np.where(sign, pred + m64, pred - m64).astype(
                    self.dtype, copy=False
                )
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def gather(self, payload, positions, n):
        max_bit, theta0, theta1, off = self._header(payload)
        positions = np.asarray(positions, dtype=np.int64)
        if max_bit == self.width:
            return np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)[positions]
        pred = self._pred(theta0, theta1, positions)
        if max_bit == 0:
            return pred.astype(self.dtype)
        sign, mag = gather_signmag(np.frombuffer(payload, np.uint8, offset=off), positions, max_bit)
        return self._combine(pred, sign, mag)

    def sum(self, payload: bytes, n: int) -> int:
        """Compressed-domain SUM (``headers/piecewise_fix_op.h:167-284``):
        model sum + residual-stream sum, WITHOUT reconstructing the value
        array — the reference's shape exactly (its ``base_summation`` is the
        prediction series, its ``sum_all_deltas`` one pass over the packed
        delta words; both are separate streams, values never materialize).

        The prediction sum replays decode's own float evaluation (one
        vectorized multiply-add — decode truncates ``fl(θ0+θ1·i)``, so any
        closed form must reproduce that exact rounding; the reference's
        Bresenham stepping over the fractional part assumes it and ships
        with its self-check assert commented out). Residuals sum straight
        from the sign-magnitude stream; for width-64 the per-slot mod-2^64
        carries/borrows are counted so the result equals
        ``decode().sum()`` as exact integers even when predictions wrap."""
        max_bit, theta0, theta1, off = self._header(payload)
        if max_bit == self.width:
            vals = np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)
            return int(vals.sum(dtype=object))
        pred = self._pred(theta0, theta1, np.arange(n))

        def _split_sum_u64(u: np.ndarray) -> int:
            hi = int((u >> _U64(32)).astype(np.int64).sum(dtype=np.int64))
            lo = int((u & _U64(0xFFFFFFFF)).astype(np.int64).sum(dtype=np.int64))
            return (hi << 32) + lo

        if max_bit == 0:
            if self.width == 64:
                return _split_sum_u64(pred.view(_U64))
            return int(pred.astype(self.dtype).sum(dtype=np.int64))
        sign, mag = unpack_signmag(np.frombuffer(payload, np.uint8, offset=off), n, max_bit)
        if self.width == 64:
            pred_u = pred.view(_U64)
            total = _split_sum_u64(pred_u)
            total += _split_sum_u64(mag[sign]) - _split_sum_u64(mag[~sign])
            carries = int((sign & (mag > ~pred_u)).sum())  # pred_u + mag ≥ 2^64
            borrows = int((~sign & (mag > pred_u)).sum())  # pred_u - mag < 0
            return total + ((borrows - carries) << 64)
        # width 32: stored value = (pred ± mag) cast to uint32 (mod 2^32)
        v32 = np.where(sign, pred + mag.astype(np.int64), pred - mag.astype(np.int64))
        return int(v32.astype(self.dtype).sum(dtype=np.int64))

    def filter_gt(self, payload: bytes, n: int, v: int) -> np.ndarray:
        """Model-inversion pushdown (``piecewise_fix_integer_template.h:206-252``):
        with residual width l, value(i) < pred(i) + 2^(l-1); for theta1 > 0
        every slot before ``thre = (v+1 - 2^(l-1) - theta0)/theta1`` is
        guaranteed ≤ v and is skipped without touching the payload."""
        max_bit, theta0, theta1, off = self._header(payload)
        if max_bit == self.width:
            vals = np.frombuffer(payload, dtype=self.dtype, count=n, offset=off)
            return np.flatnonzero(vals > self.dtype.type(v))
        start = 0
        if theta1 > 0:
            half = float(1 << (max_bit - 1)) if max_bit else 0.0
            # the line model lives in the SIGNED (int64-view) domain while v
            # is unsigned: for width-64 blocks map v into the model domain —
            # sound only when the whole block sits on one side of the sign
            # boundary (its unsigned and signed orders then agree); a
            # boundary-crossing block falls back to the exact full compare
            vf: float | None = float(v)
            if self.width == 64:
                end = theta0 + theta1 * (n - 1)
                lo_b = min(theta0, end) - half - 2.0
                hi_b = max(theta0, end) + half + 2.0
                if lo_b < 0.0 <= hi_b:
                    vf = None  # mixed-sign block: start stays 0
                elif hi_b < 0.0:  # every stored value has the top bit set
                    vf = float(v - (1 << 64)) if v >= (1 << 63) else None
                elif v >= 1 << 63:  # block < 2^63 ≤ v: nothing qualifies
                    return np.empty(0, dtype=np.int64)
            if vf is not None:
                thre = (vf + 1.0 - half - theta0) / theta1
                # cancellation guard: vf and theta0 can be ~2^63 while their
                # difference is tiny; the subtraction's rounding error
                # (~4 ulp of the largest operand) in slot units can overshoot
                # past n and silently drop every match. Back the start off by
                # the bound; the exact compare below keeps the result correct.
                err = (
                    4.0
                    * np.finfo(np.float64).eps
                    * max(abs(vf), abs(theta0), half, 1.0)
                    / abs(theta1)
                    + 1.0
                )
                start = int(np.clip(np.floor(thre - err), 0, n))
        if start >= n:
            return np.empty(0, dtype=np.int64)
        idx = np.arange(start, n, dtype=np.int64)
        pred = self._pred(theta0, theta1, idx)
        if max_bit == 0:
            vals = pred.astype(self.dtype)
        else:
            sign, mag = gather_signmag(
                np.frombuffer(payload, np.uint8, offset=off), idx, max_bit
            )
            vals = self._combine(pred, sign, mag)
        return idx[vals > self.dtype.type(v)]

    def filter_mod_band(self, payload: bytes, n: int, base: int, lo: int, hi: int):
        """Per-period model inversion for ``lo < value % base < hi``
        (``headers/piecewise_fix_integer_template.h:254-303``): for each
        period p the qualifying values lie in ``(p·base+lo, p·base+hi)``;
        inverting the line model turns each such window into a slot-index
        range, so only slots whose prediction window can intersect a band
        are decoded. Returns ``(positions, n_decoded)`` or None when the
        model can't skip (raw escape, flat slope, or dense candidates —
        caller falls back to one full decode)."""
        max_bit, theta0, theta1, off = self._header(payload)
        if max_bit == self.width or theta1 == 0.0:
            return None
        # slack: |value − float prediction| < 2^(l-1) + 1 (trunc + residual),
        # plus the float64 cancellation bound of `band − theta0` at ~2^64
        # magnitudes (same guard as filter_gt)
        h = float(1 << (max_bit - 1)) + 2.0 if max_bit else 2.0
        h += 4.0 * np.finfo(np.float64).eps * max(
            abs(theta0), abs(theta0 + theta1 * (n - 1)), 1.0
        )
        p0, p1 = theta0, theta0 + theta1 * (n - 1)
        lo_v, hi_v = min(p0, p1) - h, max(p0, p1) + h
        n_periods = int(hi_v // base) - int(np.floor(lo_v / base)) + 1
        if n_periods > n:  # steeper than one slot per period: no skipping
            return None
        periods = np.arange(int(np.floor(lo_v / base)), int(hi_v // base) + 1, dtype=np.float64)
        band_lo = periods * float(base) + float(lo) + 1.0 - h
        band_hi = periods * float(base) + float(hi) - 1.0 + h
        a = (band_lo - theta0) / theta1
        b = (band_hi - theta0) / theta1
        if theta1 < 0:
            a, b = b, a
        starts = np.clip(np.floor(a).astype(np.int64), 0, n)
        ends = np.clip(np.ceil(b).astype(np.int64) + 1, 0, n)
        keep = ends > starts
        starts, ends = starts[keep], ends[keep]
        if starts.size == 0:
            return np.empty(0, dtype=np.int64), 0
        # union of candidate ranges via a prefix-sum coverage mask
        cover = np.zeros(n + 1, dtype=np.int32)
        np.add.at(cover, starts, 1)
        np.add.at(cover, ends, -1)
        cand = np.flatnonzero(np.cumsum(cover[:-1]) > 0)
        if cand.size >= 0.9 * n:
            return None
        vals = self.gather(payload, cand, n)
        rem = as_signed64(vals) % np.int64(base)
        return cand[(rem > lo) & (rem < hi)], int(cand.size)


class RleCodec(IntCodec):
    """Run-length encoding (``headers/rle.h:39-145``).

    Layout: ``total_pairs:u32 | (key:T, count:u32)*`` — the reference is
    uint32-only; we keep its shape and widen ``key`` to T.
    """

    name = "rle"

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        if n == 0:
            return struct.pack("<I", 0)
        bounds = np.flatnonzero(values[1:] != values[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        keys = values[starts]
        counts = (ends - starts).astype(np.uint32)
        out = [struct.pack("<I", len(keys))]
        pairs = np.empty(len(keys), dtype=np.dtype([("k", self.dtype), ("c", np.uint32)]))
        pairs["k"] = keys
        pairs["c"] = counts
        out.append(pairs.tobytes())
        return b"".join(out)

    def _pairs(self, payload: bytes):
        total = struct.unpack_from("<I", payload, 0)[0]
        pairs = np.frombuffer(
            payload, dtype=np.dtype([("k", self.dtype), ("c", np.uint32)]), count=total, offset=4
        )
        return pairs["k"], pairs["c"]

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        keys, counts = self._pairs(payload)
        return np.repeat(keys, counts.astype(np.int64))

    def gather(self, payload, positions, n):
        keys, counts = self._pairs(payload)
        cum = np.cumsum(counts.astype(np.int64))
        run = np.searchsorted(cum, np.asarray(positions, dtype=np.int64), side="right")
        return keys[run]

    def sum(self, payload: bytes, n: int) -> int:
        keys, counts = self._pairs(payload)
        return int((keys.astype(object) * counts.astype(object)).sum())

    def filter_gt(self, payload: bytes, n: int, v: int) -> np.ndarray:
        keys, counts = self._pairs(payload)
        counts = counts.astype(np.int64)
        ends = np.cumsum(counts)
        starts = ends - counts
        hit = keys > self.dtype.type(v)
        if not hit.any():
            return np.empty(0, dtype=np.int64)
        spans = [np.arange(s, e) for s, e in zip(starts[hit], ends[hit])]
        return np.concatenate(spans)

    def filter_mod_band(self, payload: bytes, n: int, base: int, lo: int, hi: int):
        """Run-domain band filter: test each RUN KEY once and expand the
        matching runs' position spans — touches n_runs values instead of n
        (the run-level analogue of ``FOR_integer_template.h:166-215``'s
        period pruning; the reference's RLE answers predicates per run the
        same way, ``headers/rle.h``)."""
        keys, counts = self._pairs(payload)
        counts = counts.astype(np.int64)
        ends = np.cumsum(counts)
        starts = ends - counts
        rem = as_signed64(keys) % np.int64(base)
        hit = (rem > lo) & (rem < hi)
        if not hit.any():
            return np.empty(0, dtype=np.int64), int(keys.size)
        spans = [np.arange(s, e) for s, e in zip(starts[hit], ends[hit])]
        return np.concatenate(spans), int(keys.size)
