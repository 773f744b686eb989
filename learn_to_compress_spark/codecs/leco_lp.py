"""LeCo_LP — minimax (L∞ / Chebyshev) linear fit codec (operator #18).

Reference: ``scripts/leco_lp/leco_lp.py`` solves
``min max_i |y_i − (a + b·i)|`` with an LP solver to pick the line whose
WORST residual is smallest. That objective is exactly what decides the
stored bit width: LeCo's payload cost is ``n · (bits(max|residual|)+1)``,
so the L∞-optimal line is the width-optimal linear model, whereas the
least-squares line (``LecoFixCodec``) optimizes the wrong norm and can sit
a whole bit wider when one tail drifts.

No LP solver here (and none is baked into the image): for points on the
sorted axis ``x = 0..n−1`` the minimax line has a closed geometric form —
``f(s) = max_i(y_i − s·x_i) − min_i(y_i − s·x_i)`` is convex piecewise-
linear in the slope ``s``, its max/min terms are support functions of the
upper/lower convex hulls, and its minimum sits on a hull-edge slope. So:
build both hulls (vectorized simultaneous-elimination passes), evaluate
``f`` at every hull-edge slope via two ``searchsorted`` walks, take the
argmin — exact in O(n + h log h), all numpy.

Payload layout, decode, random access, and every pushdown (filter
inversion, streamed SUM, mod-band, gather) are inherited UNCHANGED from
``LecoFixCodec`` — only the fit differs, and the stored thetas replay
identically on decode. Raced under the same analytic-size-first gate as
poly2/spline; kept only when strictly smaller.
"""

from __future__ import annotations

import numpy as np

from ..bitpack import ref_tail_pad_signmag
from .base import bits_int
from .intcodecs import LecoFixCodec


def _hull_indices(y: np.ndarray, upper: bool) -> np.ndarray:
    """Indices of the upper/lower convex hull of ``(i, y[i])``, left→right.

    Simultaneous-elimination passes: an interior point strictly on the
    wrong side of the chord joining its current neighbours can never be a
    hull vertex, so each vectorized pass drops every violator at once and
    repeats until stable (collinear points are dropped too — fewer edge
    candidates, same support values).
    """
    idx = np.arange(y.size, dtype=np.int64)
    while idx.size > 2:
        xs = idx.astype(np.float64)
        ys = y[idx]
        cross = (xs[1:-1] - xs[:-2]) * (ys[2:] - ys[:-2]) - (ys[1:-1] - ys[:-2]) * (
            xs[2:] - xs[:-2]
        )
        # cross of (P1−P0)×(P2−P0) is ≥0 when the middle point sits on or
        # below the chord (x increasing) — a violator for the UPPER hull
        bad = cross >= 0 if upper else cross <= 0
        if not bad.any():
            break
        keep = np.ones(idx.size, dtype=bool)
        keep[1:-1] = ~bad
        idx = idx[keep]
    return idx


def chebyshev_line(y: np.ndarray) -> tuple[float, float]:
    """Exact minimax linear fit of ``y`` over ``x = 0..n−1``.

    Returns ``(theta0, theta1)`` minimizing ``max_i |y_i − (theta0 +
    theta1·i)|``; theta0 is the mid-line intercept (equal worst error both
    sides).
    """
    n = y.size
    if n == 0:
        return 0.0, 0.0
    if n == 1:
        return float(y[0]), 0.0
    if n == 2:
        return float(y[0]), float(y[1] - y[0])
    ui = _hull_indices(y, upper=True)
    li = _hull_indices(y, upper=False)
    xu, yu = ui.astype(np.float64), y[ui]
    xl, yl = li.astype(np.float64), y[li]
    eu = np.diff(yu) / np.diff(xu)  # upper-hull edge slopes, descending
    el = np.diff(yl) / np.diff(xl)  # lower-hull edge slopes, ascending
    cands = np.unique(np.concatenate([eu, el]))  # ascending; hull edges only
    # support argmax of (y − s·x) walks RIGHT along the upper hull as s
    # decreases, switching at edge slopes; argmin walks LEFT along the lower
    # hull — both positions come from one searchsorted per hull
    k = (eu.size) - np.searchsorted(eu[::-1], cands, side="right")
    j = np.searchsorted(el, cands, side="right")
    hi = yu[k] - cands * xu[k]
    lo = yl[j] - cands * xl[j]
    f = hi - lo  # convex piecewise-linear; min is at a hull-edge slope
    best = int(np.argmin(f))
    s = float(cands[best])
    b = float((hi[best] + lo[best]) / 2.0)
    return b, s


class LecoLpCodec(LecoFixCodec):
    """LeCo_fix with the minimax fit — everything else inherited."""

    name = "leco_lp"

    def _fit(self, values: np.ndarray):
        # same unsigned-float domain as LecoFixCodec._fit: _recenter then
        # re-optimizes the intercept exactly in the truncated-int domain
        return chebyshev_line(values.astype(np.float64))

    def size_bytes(self, values: np.ndarray) -> int:
        """Analytic compressed size without packing (for the race gate)."""
        values = np.ascontiguousarray(values, dtype=self.dtype)
        t0, t1 = self._fit(values)
        rec = self._recenter(values, t0, t1)
        if rec is None:
            return 1 + values.size * self.dtype.itemsize
        max_err = rec[3]
        max_bit = bits_int(max_err) + 1 if max_err else 0
        if max_bit >= self.width:
            return 1 + values.size * self.dtype.itemsize
        body = -(-values.size * max_bit // 8)
        return 17 + (body + ref_tail_pad_signmag(body) if max_bit else 0)
