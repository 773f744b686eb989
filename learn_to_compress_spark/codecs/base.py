"""Codec protocol — Spark-side equivalent of the reference's ``IntegerCODEC``
plugin interface (``headers/codecs.h:18-67``) and ``CODECFactory``
(``headers/codecfactory.h:100-128``).

A codec encodes ONE column chunk (a numpy array delivered by Arrow inside a
pandas UDF) into an opaque ``bytes`` payload, and back. All methods are
vectorized — no per-row Python in any hot path.
"""

from __future__ import annotations

import numpy as np


class IntCodec:
    """Interface for fixed-width unsigned integer chunk codecs.

    Subclasses are parameterized by the unsigned numpy dtype (uint32/uint64),
    mirroring the reference's ``template <typename T>`` codecs.
    """

    name: str = "abstract"

    def __init__(self, dtype=np.uint64):
        self.dtype = np.dtype(dtype)
        self.width = self.dtype.itemsize * 8

    # --- required ---
    def encode(self, values: np.ndarray) -> bytes:
        raise NotImplementedError

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        raise NotImplementedError

    # --- optional fast paths (defaults decode-then-compute) ---
    def decode_many(self, payloads, ns) -> list:
        """Decode a batch of independent blocks in one call.

        Counterpart of the reference's full-array decode loop
        (``experiments/leco_int_template.cpp:112-131`` — its ``da_ns``
        benchmark decodes every block inside ONE timed call): subclasses
        override to amortize kernel launches across blocks, which is the
        difference between 200 ns/int and 2 ns/int at 100-value blocks.
        """
        return [self.decode(p, n) for p, n in zip(payloads, ns)]

    def gather(self, payload: bytes, positions: np.ndarray, n: int) -> np.ndarray:
        """Random access at a position list (``randomdecodeArray8`` analogue,
        vectorized over the whole list)."""
        return self.decode(payload, n)[np.asarray(positions, dtype=np.int64)]

    def sum(self, payload: bytes, n: int) -> int:
        """SUM pushdown (``summation`` analogue, ``headers/codecs.h:59``)."""
        return int(self.decode(payload, n).sum(dtype=object))

    def filter_gt(self, payload: bytes, n: int, v: int) -> np.ndarray:
        """Positions where value > v (``filter_range`` analogue,
        ``headers/piecewise_fix_integer_template.h:206-252``)."""
        return np.flatnonzero(self.decode(payload, n) > self.dtype.type(v))


# Largest |float64 prediction| that may be truncated with .astype(np.int64):
# outside [-2^63, 2^63) the cast is architecture-DEPENDENT (x86 cvttsd2si
# saturates to INT64_MIN for both overflow directions; aarch64 fcvtzs clamps
# to the nearest bound), so a store written on x86 would decode differently
# on ARM. The 2^14 margin (8 ulp at 2^63) absorbs float re-association between
# the encoder's `predf + shift` and decode's `(theta0+shift) + theta1*x`.
PRED_SAFE_MAX = 2.0**63 - 2.0**14


def preds_castable(predf: np.ndarray) -> bool:
    """True iff every float prediction truncates to int64 identically on
    every architecture (finite and safely inside [-2^63, 2^63))."""
    if predf.size == 0:
        return True
    m = float(np.abs(predf).max())
    return bool(np.isfinite(m)) and m < PRED_SAFE_MAX


def as_signed64(values: np.ndarray) -> np.ndarray:
    """C-style conversion to int64 (wraps for uint64 ≥ 2^63, widens others)."""
    if values.dtype == np.uint64:
        return values.view(np.int64)
    return values.astype(np.int64)


def bits_int(v: int) -> int:
    """Bit width of |v| — ``bits_int_T`` (``headers/lr.h:117-130``)."""
    v = int(v)
    if v < 0:
        v = -v
    return v.bit_length()
