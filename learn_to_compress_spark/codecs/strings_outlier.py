"""LeCo-string outlier-detect codec (operator: string exception list).

Reference: ``headers/string/piecewise_fix_string_outlier_detect.h`` — the
LeCo-string rungs pad every suffix to the BLOCK max length, so one long
outlier row inflates the padded width for the whole block (or kicks it out
of the rung entirely). The reference strips such rows into an exception
list and models the rest; this codec is the same idea as a pure
composition: the longest ≤ n/32 rows (99th-length-percentile rule,
deterministic) are stored raw alongside their positions, and the inlier
subset goes through the engine's own uint64/wide LeCo-string rung.

Layout::

    rung:u8 (0 = uint64 rung, 1 = wide rung) | n_exc:u32 | exc_plen:u32 |
    exc_pos u32[n_exc] (sorted) | StrRaw exception sub-block |
    inner rung payload over the inliers (in original relative order)

Decode merges the two streams with ONE Arrow ``take`` over a permutation of
``concat(inliers, exceptions)`` — no per-row Python. Pushdowns fall back to
decode-and-compare (the framing's generic path).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .strings import (
    STRING_CODEC_CLASSES,
    LecoStringCodec,
    StrRawCodec,
    _as_binary_array,
)
from .strings_wide import LecoStringWideCodec


class LecoStringOutlierCodec:
    name = "leco_str_outlier"

    #: exceptions are capped at n/32 rows — more than that is not an
    #: "outlier" problem and the normal race (FSST/dict) handles it better
    MAX_EXC_DEN = 32

    @staticmethod
    def _plan(arr: pa.Array):
        """(exc_pos, inl_pos, rung) or None. Deterministic: rows longer than
        the 99th length percentile are exceptions, provided there are some,
        they are ≤ n/32, and the remaining inliers fit a LeCo-string rung."""
        n = len(arr)
        if n < 32 or arr.null_count:
            return None
        lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        mx = int(lens.max())
        bound = int(np.quantile(lens, 0.99))
        if bound >= mx:
            return None  # no long tail to strip
        exc_pos = np.flatnonzero(lens > bound)
        if exc_pos.size == 0 or exc_pos.size > max(1, n // LecoStringOutlierCodec.MAX_EXC_DEN):
            return None
        inl_pos = np.flatnonzero(lens <= bound)
        inliers = arr.take(pa.array(inl_pos))
        if LecoStringCodec.eligible(inliers):
            return exc_pos, inl_pos, 0
        if LecoStringWideCodec.eligible(inliers):
            return exc_pos, inl_pos, 1
        return None

    @staticmethod
    def eligible(arr) -> bool:
        return LecoStringOutlierCodec._plan(_as_binary_array(arr)) is not None

    def encode(self, strs) -> bytes:
        arr = _as_binary_array(strs)
        plan = self._plan(arr)
        if plan is None:
            raise ValueError("block not eligible for leco_str_outlier")
        exc_pos, inl_pos, rung = plan
        inner_codec = LecoStringCodec() if rung == 0 else LecoStringWideCodec()
        inner = inner_codec.encode(arr.take(pa.array(inl_pos)))
        exc_payload = StrRawCodec().encode(arr.take(pa.array(exc_pos)))
        return (
            bytes([rung])
            + struct.pack("<II", exc_pos.size, len(exc_payload))
            + exc_pos.astype(np.uint32).tobytes()
            + exc_payload
            + inner
        )

    def decode(self, payload: bytes, n: int) -> pa.Array:
        rung = payload[0]
        n_exc, exc_plen = struct.unpack_from("<II", payload, 1)
        off = 9
        exc_pos = np.frombuffer(payload, np.uint32, count=n_exc, offset=off).astype(
            np.int64
        )
        off += 4 * n_exc
        exc_arr = StrRawCodec().decode(payload[off : off + exc_plen], n_exc)
        off += exc_plen
        inner_codec = LecoStringCodec() if rung == 0 else LecoStringWideCodec()
        inl_arr = inner_codec.decode(payload[off:], n - n_exc)
        # merge streams: one permutation take over concat(inliers, exceptions)
        perm = np.empty(n, dtype=np.int64)
        mask = np.ones(n, dtype=bool)
        mask[exc_pos] = False
        perm[mask] = np.arange(n - n_exc, dtype=np.int64)
        perm[exc_pos] = (n - n_exc) + np.arange(n_exc, dtype=np.int64)
        both = pa.concat_arrays([inl_arr, exc_arr])
        return both.take(pa.array(perm))


STRING_CODEC_CLASSES[LecoStringOutlierCodec.name] = LecoStringOutlierCodec
