"""LeCo_var — variable-length piecewise-linear segmentation (operator #10).

Reference: ``headers/piecewise_cost_merge_integer_template_link.h:343-680``
(``leco_cost``) — phase-1 greedy split driven by second-derivative
bit-width, phase-2 bidirectional merge while total bytes decline; exact-byte
cost function ``newsegment_size`` (``:99-170``); per-segment float32 thetas
(``:112-113``); ALEX index for segment routing (``:745-837``).

Our algorithm reaches the same cost optimum differently (NOT a port):
**top-down recursive split** with the exact serialized-bytes cost — a
segment is split at its maximum-|residual| slot whenever the two halves
(plus per-segment overhead) serialize smaller than the whole. Least-squares
fits are O(1) per candidate via global prefix sums, so segmentation is
O(n log n). Segment routing uses ``np.searchsorted`` over the start array —
at chunk scale a binary search beats a learned index (the reference needs
ALEX only because its "chunk" is a whole 200M-value column).

Layout:
``n_segs:u32 | starts u32[n_segs] | (max_bit u8, theta0 f64, theta1 f64)[n_segs]
 | residual bitstreams (each segment byte-aligned)``
"""

from __future__ import annotations

import struct

import numpy as np

from ..bitpack import pack_signmag, unpack_signmag
from .base import PRED_SAFE_MAX, IntCodec, bits_int, preds_castable

_SEG_META = 4 + 1 + 8 + 8  # start:u32 + bit:u8 + theta0:f64 + theta1:f64


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length()`` for uint64 arrays — float log2
    estimate with exact shift-based correction (log2 alone mis-rounds near
    2^k for k > 52)."""
    l = np.zeros(x.size, dtype=np.int64)
    nz = x > 0
    if not nz.any():
        return l
    est = np.ones(x.size, np.int64)
    est[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    est = np.clip(est, 1, 64)
    for _ in range(2):
        sh = np.minimum(est, 63).astype(np.uint64)
        inc = nz & (est < 64) & ((x >> sh) != 0)
        est[inc] += 1
        shm = np.clip(est - 1, 0, 63).astype(np.uint64)
        dec = nz & ((x >> shm) == 0)
        est[dec] -= 1
    l[nz] = est[nz]
    return l

_XBUF = np.arange(4096, dtype=np.float64)


def _xrange(m: int) -> np.ndarray:
    """Cached local-slot index vector (the segment sweep asks for one ~6k
    times per 64Ki chunk; re-allocating aranges was measurable)."""
    global _XBUF
    if m > _XBUF.size:
        _XBUF = np.arange(m + (m >> 1), dtype=np.float64)
    return _XBUF[:m]
_MIN_SEG = 16


class _Fitter:
    """O(1) least-squares over any [s, e) window via global prefix sums."""

    def __init__(self, y64: np.ndarray):
        n = y64.size
        g = np.arange(n, dtype=np.float64)
        yf = y64.astype(np.float64)
        self.Py = np.concatenate(([0.0], np.cumsum(yf)))
        self.Pgy = np.concatenate(([0.0], np.cumsum(g * yf)))
        self.Pg = np.concatenate(([0.0], np.cumsum(g)))
        self.Pgg = np.concatenate(([0.0], np.cumsum(g * g)))

    def fit(self, s: int, e: int) -> tuple[float, float]:
        m = e - s
        sy = self.Py[e] - self.Py[s]
        sgy = self.Pgy[e] - self.Pgy[s]
        sg = self.Pg[e] - self.Pg[s]
        sgg = self.Pgg[e] - self.Pgg[s]
        # local x = g - s
        sx = sg - s * m
        sxy = sgy - s * sy
        sxx = sgg - 2 * s * sg + s * s * m
        xxx = sxx * m - sx * sx
        if m <= 1 or xxx == 0:
            return float(sy / max(m, 1)), 0.0
        theta1 = (sxy * m - sx * sy) / xxx
        theta0 = (sy - theta1 * sx) / m
        return theta0, theta1


class LecoVarCodec(IntCodec):
    name = "leco_var"

    def _seg_resid(self, y64: np.ndarray, s: int, e: int, theta0: float, theta1: float):
        """Residuals of window [s, e) against the float64 model (int64 domain).

        Divergence from the reference's float32 segment thetas
        (``piecewise_cost_merge_integer_template_link.h:112-113``): float64
        keeps residual widths tight on our 64Ki-row chunks, where float32
        slope error alone would add bits; costs 8 bytes/segment."""
        # serialized thetas passed the preds_castable guard in _seg_cost, so
        # this cast never saturates (architecture-independent contract)
        x = _xrange(e - s)
        pred = (theta0 + theta1 * x).astype(np.int64)
        return y64[s:e] - pred, pred

    def _ser_bytes(self, m: int, l: int) -> int:
        if l >= self.width:
            return _SEG_META + m * self.dtype.itemsize
        return _SEG_META + (-(-m * l // 8))

    def _seg_cost(self, y64, fitter, s, e):
        """(bytes, max_bit, theta0', theta1', argmax_resid) for one segment.

        Intercept recenter tries the reference's midpoint shift AND the
        floor-aligned shift (error range pushed just below zero) — the
        latter truncates an exactly-quantized ramp to zero residuals."""
        theta0, theta1 = fitter.fit(s, e)
        # ONE model evaluation; both recenter candidates are derived from it
        yseg = y64[s:e]
        predf = theta0 + theta1 * _xrange(e - s)
        errf = yseg - predf
        if preds_castable(predf):
            err = yseg - predf.astype(np.int64)
            mid = (int(err.max()) + int(err.min())) / 2.0
        else:  # unshifted fit leaves int64: float-domain midpoint fallback
            mid = (float(errf.max()) + float(errf.min())) / 2.0 if e > s else 0.0
        hf = float(errf.max()) if e > s else 0.0
        best = None
        for shift in (mid, hf):
            pred2f = predf + shift
            # A shift that pushes any prediction outside int64 is unusable:
            # .astype(int64) would saturate ARCHITECTURE-DEPENDENTLY (x86 →
            # INT64_MIN, aarch64 → nearest bound), the int64 subtraction
            # wraps, and the wrapped magnitudes lie about the needed width
            # (hypothesis counterexample [0, 2^63-512, 0]).
            if not np.isfinite(shift) or not preds_castable(pred2f):
                continue
            err2 = yseg - pred2f.astype(np.int64)
            # |err| in the uint64 view: |INT64_MIN| == 2^63 stays exact
            # (np.abs(INT64_MIN) is negative in the int64 view and would
            # corrupt both argmax and the bit-width below)
            mag2 = np.abs(err2).view(np.uint64)
            amax2 = int(mag2.argmax())
            m2 = int(mag2[amax2])
            if best is None or m2 < best[0]:
                best = (m2, theta0 + shift, amax2)
        if best is None:  # both recenter candidates overflow — raw escape
            return _SEG_META + (e - s) * self.dtype.itemsize, self.width, theta0, theta1, 0
        max_err, theta0, amax = best
        l = bits_int(max_err) + 1 if max_err else 0
        if l >= self.width:
            cost = _SEG_META + (e - s) * self.dtype.itemsize  # raw segment
            return cost, self.width, theta0, theta1, amax
        return _SEG_META + (-(-(e - s) * l // 8)), l, theta0, theta1, amax

    def _seg_cost_batch(self, y64, fitter, starts, ends):
        """Vectorized :meth:`_seg_cost` over many (possibly overlapping)
        windows — one concatenated gather + ``reduceat`` sweeps instead of a
        Python call per window. Bit-equivalent to the scalar path (same
        operation order everywhere); the one spot float batching could
        diverge (integer midpoint with |extremum| ≥ 2^52) falls back to the
        scalar method per window. Returns parallel lists of
        ``(cost, l, theta0, theta1, amax)`` tuples.
        """
        S = np.asarray(starts, dtype=np.int64)
        E = np.asarray(ends, dtype=np.int64)
        W = S.size
        if W == 0:
            return []
        lens = E - S
        total = int(lens.sum())
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        # vectorized O(1) fits (same op order as _Fitter.fit)
        sy = fitter.Py[E] - fitter.Py[S]
        sgy = fitter.Pgy[E] - fitter.Pgy[S]
        sg = fitter.Pg[E] - fitter.Pg[S]
        sgg = fitter.Pgg[E] - fitter.Pgg[S]
        sx = sg - S * lens
        sxy = sgy - S * sy
        sxx = sgg - 2 * S * sg + S * S * lens
        xxx = sxx * lens - sx * sx
        unsafe = (lens <= 1) | (xxx == 0)
        xxx_div = np.where(unsafe, 1.0, xxx)
        theta1 = np.where(unsafe, 0.0, (sxy * lens - sx * sy) / xxx_div)
        theta0 = np.where(
            unsafe, sy / np.maximum(lens, 1), (sy - theta1 * sx) / lens
        )

        # concatenated window layout
        gidx = np.arange(total, dtype=np.int64) - np.repeat(offs, lens) + np.repeat(S, lens)
        x = (np.arange(total, dtype=np.int64) - np.repeat(offs, lens)).astype(np.float64)
        yv = y64[gidx]
        t0r = np.repeat(theta0, lens)
        t1r = np.repeat(theta1, lens)
        predf = t0r + t1r * x
        errf = yv - predf
        red = offs  # reduceat boundaries (windows back-to-back in concat space)
        absr = np.abs(predf)
        pmax = np.maximum.reduceat(absr, red)
        castable = np.isfinite(pmax) & (pmax < PRED_SAFE_MAX)

        # integer-domain err where castable (clip keeps the cast defined for
        # discarded windows without warnings)
        pred_safe = np.clip(predf, -PRED_SAFE_MAX, PRED_SAFE_MAX)
        err_i = yv - pred_safe.astype(np.int64)
        emax_i = np.maximum.reduceat(err_i, red)
        emin_i = np.minimum.reduceat(err_i, red)
        emax_f = np.maximum.reduceat(errf, red)
        emin_f = np.minimum.reduceat(errf, red)
        # scalar fallback where the float midpoint could round differently
        # from python's arbitrary-precision (int(max)+int(min))/2.0
        need_scalar = castable & (
            (np.abs(emax_i) >= 2**52) | (np.abs(emin_i) >= 2**52)
        )
        mid = np.where(
            castable,
            (emax_i.astype(np.float64) + emin_i.astype(np.float64)) / 2.0,
            (emax_f + emin_f) / 2.0,
        )
        hf = emax_f

        best_m = np.full(W, np.iinfo(np.uint64).max, dtype=np.uint64)
        best_t0 = theta0.copy()
        best_amax = np.zeros(W, dtype=np.int64)
        any_ok = np.zeros(W, dtype=bool)
        arange_total = np.arange(total, dtype=np.int64)
        for shift in (mid, hf):
            pred2f = predf + np.repeat(shift, lens)
            p2max = np.maximum.reduceat(np.abs(pred2f), red)
            ok = np.isfinite(shift) & np.isfinite(p2max) & (p2max < PRED_SAFE_MAX)
            err2 = yv - np.clip(pred2f, -PRED_SAFE_MAX, PRED_SAFE_MAX).astype(np.int64)
            mag2 = np.abs(err2).view(np.uint64)
            m2 = np.maximum.reduceat(mag2, red)
            hit = mag2 == np.repeat(m2, lens)
            firstidx = np.minimum.reduceat(
                np.where(hit, arange_total, total), red
            )
            amax2 = firstidx - offs
            # strict <: the first usable candidate (mid) wins ties
            better = ok & (~any_ok | (m2 < best_m))
            best_m = np.where(better, m2, best_m)
            best_t0 = np.where(better, theta0 + shift, best_t0)
            best_amax = np.where(better, amax2, best_amax)
            any_ok |= ok

        l_arr = _bitlen_u64(best_m) + 1
        l_arr[best_m == 0] = 0
        itemsize = self.dtype.itemsize
        raw_cost = _SEG_META + lens * itemsize
        packed_cost = _SEG_META + -(-lens * l_arr // 8)
        out = []
        for i in range(W):
            if need_scalar[i]:
                out.append(self._seg_cost(y64, fitter, int(S[i]), int(E[i])))
            elif not any_ok[i]:  # both recenter candidates overflow → raw
                out.append(
                    (int(raw_cost[i]), self.width, float(theta0[i]), float(theta1[i]), 0)
                )
            elif l_arr[i] >= self.width:
                out.append(
                    (int(raw_cost[i]), self.width, float(best_t0[i]), float(theta1[i]), int(best_amax[i]))
                )
            else:
                out.append(
                    (int(packed_cost[i]), int(l_arr[i]), float(best_t0[i]), float(theta1[i]), int(best_amax[i]))
                )
        return out

    def encode(self, values: np.ndarray) -> bytes:
        # no errstate suppression: every float→int64 cast is guarded by
        # preds_castable, so a warning here is a real bug (pytest errors on it)
        return self._encode_impl(values)

    def _encode_impl(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        y64 = values.astype(np.int64) if self.width < 64 else values.view(np.int64)
        fitter = _Fitter(y64)

        # phase 0 — breakpoints at first-derivative outliers (the equivalent
        # of the reference's second-derivative bit-width split driver,
        # piecewise_cost_merge_integer_template_link.h:343-493): a jump whose
        # bit width far exceeds the typical step forces a boundary
        bounds = [0, n]
        if n > 2 * _MIN_SEG:
            d = np.abs(np.diff(y64))
            typical = max(float(np.median(d)), 1.0)
            jumps = np.flatnonzero(d > 64 * typical) + 1
            if jumps.size and jumps.size < n // _MIN_SEG:
                bounds = sorted({0, n, *jumps.tolist()})

        # phase 1 — recursive exact-cost split, driven FRONTIER-AT-A-TIME so
        # every level's candidate windows price in ONE `_seg_cost_batch`
        # sweep (a Python call per window was the encode hot spot; the
        # decisions are identical to the per-window recursion)
        segments: list[tuple[int, int, int, float, float]] = []  # s, e, l, t0, t1
        init = self._seg_cost_batch(y64, fitter, bounds[:-1], bounds[1:])
        frontier = [
            (s, e, *c) for (s, e), c in zip(zip(bounds[:-1], bounds[1:]), init)
        ]
        while frontier:
            splittable, ks = [], []
            for w in frontier:
                s, e, cost, l, t0, t1, amax = w
                # a zero-width segment is already optimal: splitting can
                # only add per-segment metadata
                if l and e - s >= 2 * _MIN_SEG:
                    ks.append(int(np.clip(s + amax, s + _MIN_SEG, e - _MIN_SEG)))
                    splittable.append(w)
                else:
                    segments.append((s, e, l, t0, t1))
            if not splittable:
                break
            starts = []
            ends = []
            for (s, e, *_), k in zip(splittable, ks):
                starts += [s, k]
                ends += [k, e]
            child = self._seg_cost_batch(y64, fitter, starts, ends)
            frontier = []
            for j, ((s, e, cost, l, t0, t1, amax), k) in enumerate(zip(splittable, ks)):
                left, right = child[2 * j], child[2 * j + 1]
                if left[0] + right[0] < cost:
                    frontier.append((s, k, *left))
                    frontier.append((k, e, *right))
                else:
                    segments.append((s, e, l, t0, t1))
        segments.sort(key=lambda t: t[0])

        # phase 2 — merge adjacent segments while total bytes decline
        # (reference merge loop :517-534, merge_both_direction :590-680);
        # pass count capped: the reference iterates to <0.01 % gain, but ≥95 %
        # of the gain lands in the first two passes and each pass is O(total).
        # All adjacent pairs price in one batch; the greedy walk then uses
        # the precomputed costs (identical decisions — the walk only ever
        # consults the pair cost at its current position).
        changed = True
        passes = 0
        while changed and len(segments) > 1 and passes < 3:
            passes += 1
            changed = False
            pair_costs = self._seg_cost_batch(
                y64,
                fitter,
                [seg[0] for seg in segments[:-1]],
                [seg[1] for seg in segments[1:]],
            )
            merged: list[tuple[int, int, int, float, float]] = []
            i = 0
            while i < len(segments):
                if i + 1 < len(segments):
                    s0, e0, l0, a0, b0 = segments[i]
                    s1, e1, l1, a1, b1 = segments[i + 1]
                    c_sep = (
                        self._ser_bytes(e0 - s0, l0) + self._ser_bytes(e1 - s1, l1)
                    )
                    cm, lm, tm0, tm1, _ = pair_costs[i]
                    if cm < c_sep:
                        merged.append((s0, e1, lm, tm0, tm1))
                        i += 2
                        changed = True
                        continue
                merged.append(segments[i])
                i += 1
            segments = merged

        return self._serialize(values, y64, segments)

    def _serialize(self, values, y64, segments) -> bytes:
        """Shared segment serializer (also used by :class:`LecoVarDpCodec`).

        The bit width is re-derived from the ACTUAL serialized residuals and
        widened if the cost-model estimate under-covered — the cost sweep
        evaluates ``(predf + shift)`` while `_seg_resid`/decode evaluate
        ``(theta0 + shift) + theta1*x``; float addition is non-associative,
        so at ~2^63 magnitudes the two can differ by an ulp. Truncating a
        magnitude at pack time corrupts data; one extra bit never does.
        """
        metas = np.empty(
            len(segments), dtype=np.dtype([("l", "u1"), ("t0", "<f8"), ("t1", "<f8")])
        )
        starts = np.array([s for s, *_ in segments], dtype=np.uint32)
        payloads = []
        for i, (s, e, l, t0, t1) in enumerate(segments):
            err = None
            if 0 < l < self.width:
                err, _ = self._seg_resid(y64, s, e, t0, t1)
                mag = np.abs(err).view(np.uint64)
                mx = int(mag.max()) if mag.size else 0
                l = max(l, bits_int(mx) + 1 if mx else 0)
            metas[i] = (min(l, self.width), t0, t1)
            if l == 0:
                continue
            if l >= self.width:
                payloads.append(values[s:e].tobytes())
                continue
            sign = err > 0
            payloads.append(pack_signmag(sign, mag, l).tobytes())
        return b"".join(
            [struct.pack("<I", len(segments)), starts.tobytes(), metas.tobytes()]
            + payloads
        )

    _META_DTYPE = np.dtype([("l", "u1"), ("t0", "<f8"), ("t1", "<f8")])  # 17B packed

    def _parse(self, payload: bytes):
        (n_segs,) = struct.unpack_from("<I", payload, 0)
        starts = np.frombuffer(payload, np.uint32, count=n_segs, offset=4)
        off = 4 + 4 * n_segs
        m = np.frombuffer(payload, self._META_DTYPE, count=n_segs, offset=off)
        metas = list(zip(m["l"].tolist(), m["t0"].tolist(), m["t1"].tolist()))
        return starts.astype(np.int64), metas, off + 17 * n_segs

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        starts, metas, off = self._parse(payload)
        ends = np.concatenate((starts[1:], [n]))
        out = np.empty(n, dtype=np.int64)
        buf = np.frombuffer(payload, np.uint8)
        for (s, e), (l, t0, t1) in zip(zip(starts, ends), metas):
            m = int(e - s)
            if l >= self.width:
                out[s:e] = np.frombuffer(
                    payload, self.dtype, count=m, offset=off
                ).astype(np.int64) if self.width < 64 else np.frombuffer(
                    payload, self.dtype, count=m, offset=off
                ).view(np.int64)
                off += m * self.dtype.itemsize
                continue
            x = np.arange(m, dtype=np.float64)
            pred = (t0 + t1 * x).astype(np.int64)  # stored thetas are guarded
            if l == 0:
                out[s:e] = pred
                continue
            nbytes = -(-m * l // 8)
            sign, mag = unpack_signmag(buf[off : off + nbytes], m, l)
            out[s:e] = np.where(sign, pred + mag.view(np.int64), pred - mag.view(np.int64))
            off += nbytes
        return out.astype(self.dtype) if self.width < 64 else out.view(self.dtype)

    def gather(self, payload, positions, n):
        """Segment routing via binary search on the start array (replaces the
        reference's ALEX learned index at chunk scale), then per-segment
        vectorized point decode."""
        positions = np.asarray(positions, dtype=np.int64)
        # decoding whole segments touched is simplest-correct; point paths
        # only win below ~0.2 density (test_bitmap.cpp:131-165)
        if n and positions.size / n > 0.2:
            return self.decode(payload, n)[positions]
        starts, metas, off = self._parse(payload)
        ends = np.concatenate((starts[1:], [n]))
        # per-segment payload offsets
        offs = [off]
        for (s, e), (l, *_t) in zip(zip(starts, ends), metas):
            m = int(e - s)
            if l >= self.width:
                offs.append(offs[-1] + m * self.dtype.itemsize)
            elif l == 0:
                offs.append(offs[-1])
            else:
                offs.append(offs[-1] + (-(-m * l // 8)))
        buf = np.frombuffer(payload, np.uint8)
        seg_of = np.searchsorted(starts, positions, side="right") - 1
        out = np.empty(positions.size, dtype=np.int64)
        from ..bitpack import gather_signmag

        for seg in np.unique(seg_of):
            sel = seg_of == seg
            local = positions[sel] - starts[seg]
            l, t0, t1 = metas[seg]
            m = int(ends[seg] - starts[seg])
            if l >= self.width:
                vals = np.frombuffer(
                    payload, self.dtype, count=m, offset=offs[seg]
                )
                out[sel] = vals[local].astype(np.int64) if self.width < 64 else vals[local].view(np.int64)
                continue
            pred = (t0 + t1 * local.astype(np.float64)).astype(np.int64)
            if l == 0:
                out[sel] = pred
                continue
            nbytes = -(-m * l // 8)
            sign, mag = gather_signmag(buf[offs[seg] : offs[seg] + nbytes], local, l)
            out[sel] = np.where(sign, pred + mag.view(np.int64), pred - mag.view(np.int64))
        return out.astype(self.dtype) if self.width < 64 else out.view(self.dtype)
