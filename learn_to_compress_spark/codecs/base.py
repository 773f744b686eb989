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
