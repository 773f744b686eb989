"""Linked (correlated-column) codec — operator: group-correlation encoding.

Reference: ``headers/piecewise_cost_merge_integer_template_link_colcor.h:21``
(``Leco_cost_merge_test_link_colcor``; group-correlation flag at ``:634``) —
encode one column's values RELATIVE to a correlated companion column instead
of the slot index. A column that is jumpy in chunk order (``event_id`` after
a (user_id, ts) sort) but linear in a companion (``event_id ≈ a + b·ts``)
compresses to the tiny residual stream; the slot-index models can't see the
correlation.

Layout (inside the normal int framing, after ``flags | codec_id``)::

    x0:f64 | t0:f64 | t1:f64 | <full framed int64 residual column>

``pred(x) = trunc(t0 + t1·(float(x) − x0))`` — the fit is centered on ``x0``
(catastrophic cancellation: at µs-timestamp magnitudes ``n·Σx² − (Σx)²``
loses all precision uncentered), and ``preds_castable`` guards the cast at
encode so decode replays it architecture-independently. Residuals are
``y − pred`` in WRAPPING int64 — modular arithmetic makes encode/decode
self-consistent even if the subtraction wraps: ``(y − p) + p ≡ y (mod 2^64)``.

The companion column is NOT embedded: it already lives in the same chunk-row
struct, so readers fetch its payload leaf alongside (the store schema's
``linked_cols`` map says which). This class only reserves the registry slot —
encode/decode live at the framing level (``select.encode_linked_framed`` /
the ``companion=`` paths of the column readers) because the codec API is
single-column by design.
"""

from __future__ import annotations

from .base import IntCodec


class LinkedCodec(IntCodec):
    name = "linked"

    def encode(self, values) -> bytes:
        raise NotImplementedError(
            "linked columns are encoded at the framing level with a companion "
            "column (select.encode_linked_framed)"
        )

    def decode(self, payload: bytes, n: int):
        raise ValueError(
            "linked payload needs its companion column — pass companion=(payload, "
            "logical) to the column reader (store schema's linked_cols names it)"
        )
