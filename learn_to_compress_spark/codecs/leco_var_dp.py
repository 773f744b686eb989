"""LeCo_var_dp — windowed byte-optimal variable segmentation by DP.

Reference: ``headers/piecewise_cost_dp.h:219-299`` (``piecewise_cost_dp``) —
the classic segmentation DP: ``best[i] = min over j of best[j] + cost(j, i)``
where ``cost(j, i)`` is the EXACT serialized size of one LeCo segment
covering slots ``[j, i]`` (``newsegment`` re-encodes the candidate segment,
``:71-217``). The reference evaluates every O(n²) window, each at O(len)
encode cost, so the header is an offline/evaluation tool — no committed
experiment driver wires it up (verified: nothing under ``experiments/``
references ``piecewiseDp``), and the shipped path is the split+merge
heuristic (``leco_cost``).

Ours has the same role: certify how close the production ``leco_var``
split+merge heuristic lands to the byte optimum (the certification test
asserts bounded regret on short-segment data), and provide the optimum for
small high-value blocks. NOT raced in the per-chunk codec selection — the
DP is O(window³) element work per window; the certification test shows the
heuristic's regret does not justify that encode cost.

Unlike the reference's full-block O(n²) DP, ours is **windowed**: inputs
longer than ``window`` run the DP per contiguous window and concatenate the
segment lists, so no segment crosses a window boundary. That makes the
result *windowed-optimal*: exact for any data whose natural segments are
shorter than ``window``, pessimal (vs one long segment) on perfectly smooth
data — which is precisely where the heuristic already encodes near the
entropy floor, so the certification compares on short-segment shapes.

The all-pairs segment costs inside a window are computed fully vectorized:
one ``sliding_window_view`` pass per candidate length, with the same
LS-fit + dual-recenter (midpoint / floor-align) cost model as
``LecoVarCodec._seg_cost``. Chosen segments are re-priced through
``_seg_cost`` itself before serialization, so payload bytes are exact even
where the vectorized width estimate rounds (residual magnitudes ≥ 2⁵³).

Serialized layout is byte-identical to :class:`LecoVarCodec` (decode /
random access / segment routing are inherited unchanged):
``n_segs:u32 | starts u32[n_segs] | (max_bit u8, theta0 f64, theta1 f64)[n_segs]
 | residual bitstreams (each segment byte-aligned)``
"""

from __future__ import annotations

import numpy as np

from .base import PRED_SAFE_MAX
from .leco_var import _SEG_META, _Fitter, LecoVarCodec


class LecoVarDpCodec(LecoVarCodec):
    name = "leco_var_dp"

    #: DP window: segments never cross a window boundary. 256 bounds the
    #: O(window³) vectorized cost sweep to ~60 ms per window.
    window = 256
    #: longest candidate segment offered to the DP inside a window
    #: (None = window-exact DP over all O(window²) candidate segments).
    max_seg: int | None = None

    def _window_costs(self, yw: np.ndarray) -> np.ndarray:
        """Exact serialized byte cost of every candidate segment of one window.

        Returns ``C`` with ``C[s, e]`` = bytes of one segment covering local
        slots ``[s, e)``; vectorized mirror of ``LecoVarCodec._seg_cost``
        (LS fit via prefix sums, truncated predictions, midpoint and
        floor-align recenter candidates, raw escape at full width).
        """
        W = yw.size
        cap = W if self.max_seg is None else min(self.max_seg, W)
        g = np.arange(W, dtype=np.float64)
        yf = yw.astype(np.float64)
        Py = np.concatenate(([0.0], np.cumsum(yf)))
        Pgy = np.concatenate(([0.0], np.cumsum(g * yf)))
        Pg = np.concatenate(([0.0], np.cumsum(g)))
        Pgg = np.concatenate(([0.0], np.cumsum(g * g)))
        raw_item = self.dtype.itemsize
        C = np.full((W + 1, W + 1), np.inf)
        for L in range(1, cap + 1):
            s = np.arange(W - L + 1, dtype=np.float64)
            si = np.arange(W - L + 1)
            ei = si + L
            m = float(L)
            sy = Py[ei] - Py[si]
            sgy = Pgy[ei] - Pgy[si]
            sg = Pg[ei] - Pg[si]
            sgg = Pgg[ei] - Pgg[si]
            sx = sg - s * m
            sxy = sgy - s * sy
            sxx = sgg - 2 * s * sg + s * s * m
            xxx = sxx * m - sx * sx
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                theta1 = np.where(
                    (L <= 1) | (xxx == 0),
                    0.0,
                    (sxy * m - sx * sy) / np.where(xxx == 0, 1.0, xxx),
                )
                theta0 = (sy - theta1 * sx) / m
                xloc = np.arange(L, dtype=np.float64)
                Y = np.lib.stride_tricks.sliding_window_view(yw, L)
                modelf = theta0[:, None] + theta1[:, None] * xloc
                # int-domain midpoint only where the unshifted model casts
                # safely — out of [-2^63, 2^63) the float→int64 cast is
                # ARCHITECTURE-DEPENDENT (x86 saturates to INT64_MIN, aarch64
                # clamps to the nearest bound); unsafe rows fall back to the
                # float-domain midpoint, never touching a saturating cast
                mok = np.abs(modelf).max(axis=1) < PRED_SAFE_MAX
                modeli = np.zeros_like(modelf, dtype=np.int64)
                modeli[mok] = modelf[mok].astype(np.int64)
                err = Y - modeli
                errf = Y - modelf
                lo = np.where(mok, err.min(axis=1), errf.min(axis=1))
                hi = np.where(mok, err.max(axis=1), errf.max(axis=1))
                hf = errf.max(axis=1)
                best_m = None
                for shift in ((hi + lo) / 2.0, hf):
                    pred2f = (theta0 + shift)[:, None] + theta1[:, None] * xloc
                    # candidates whose predictions leave the castable range
                    # are unusable (saturation wraps the int64 subtraction and
                    # the wrapped magnitudes look falsely small — the width-64
                    # top-bit bug, repro [0, 2^63-512, 0]). Force such
                    # candidates to raw width instead; the masked cast below
                    # never saturates on ANY architecture.
                    finite = np.isfinite(pred2f).all(axis=1)
                    bad = ~finite | ~(np.abs(pred2f).max(axis=1) < PRED_SAFE_MAX)
                    pred2i = np.zeros_like(pred2f, dtype=np.int64)
                    ok = ~bad
                    pred2i[ok] = pred2f[ok].astype(np.int64)
                    err2 = Y - pred2i
                    # |err| via the uint64 view: |INT64_MIN| == 2^63 exact
                    m2 = np.abs(err2).view(np.uint64).max(axis=1)
                    m2 = np.where(bad, np.uint64(2**63), m2)
                    best_m = m2 if best_m is None else np.minimum(best_m, m2)
            # bit width: bits(|max|)+1 sign bit; frexp exponent == bit_length
            # for values exact in float64 (may round +1 bit beyond 2^53 —
            # near-raw segments where the estimate no longer matters)
            l = np.where(
                best_m > 0, np.frexp(best_m.astype(np.float64))[1] + 1, 0
            )
            cost = np.where(
                l >= self.width,
                _SEG_META + L * raw_item,
                _SEG_META + ((L * l + 7) // 8),
            )
            C[si, ei] = cost
        return C

    def _dp_segments(self, y64: np.ndarray, base: int, fitter: _Fitter):
        """Optimal segment list for one window (global-slot indices).

        ``best[e]`` = min serialized bytes for local slots ``[0, e)``;
        parent pointers recover the split (``piecewise_cost_dp.h:219-299``).
        Chosen segments are re-priced exactly via ``_seg_cost`` for their
        serialization metadata.
        """
        n = min(self.window, y64.size - base)
        C = self._window_costs(y64[base : base + n])
        best = np.full(n + 1, np.inf)
        best[0] = 0.0
        parent = np.zeros(n + 1, dtype=np.int64)
        for e in range(1, n + 1):
            tot = best[:e] + C[:e, e]
            s = int(np.argmin(tot))
            best[e] = tot[s]
            parent[e] = s
        segs: list[tuple[int, int, int, float, float]] = []
        e = n
        while e > 0:
            s = int(parent[e])
            _, l, t0, t1, _ = self._seg_cost(y64, fitter, base + s, base + e)
            segs.append((base + s, base + e, l, t0, t1))
            e = s
        segs.reverse()
        return segs

    def encode(self, values: np.ndarray) -> bytes:
        with np.errstate(invalid="ignore", over="ignore"):
            return self._encode_impl(values)

    def _encode_impl(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        n = values.size
        y64 = values.astype(np.int64) if self.width < 64 else values.view(np.int64)
        fitter = _Fitter(y64)

        segments: list[tuple[int, int, int, float, float]] = []
        for base in range(0, n, self.window):
            segments.extend(self._dp_segments(y64, base, fitter))
        return self._serialize(values, y64, segments)
