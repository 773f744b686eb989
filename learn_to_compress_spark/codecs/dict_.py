"""Dictionary codec for integers — codes compressed recursively.

Reference analogue: ``experiments/raw_test_dictionary.cpp:63-125`` +
``benchmark/dictionary_benchmark.sh`` — the column is dictionarized
externally, the code array is then LeCo/FOR-compressed, lookup is
``dictionary[code]``. Here both halves live in one payload:

``n_dict:u32 | dict values (n_dict × T) | inner_codec_id:u8 | inner payload``

Codes are uint32 in first-occurrence order (``pandas.factorize`` stable
semantics, implemented with numpy only).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import IntCodec


def factorize(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Stable first-occurrence factorize → (codes uint32, uniques)."""
    uniq, first_pos, inv = np.unique(values, return_index=True, return_inverse=True)
    order = np.argsort(first_pos, kind="stable")
    # remap sorted-unique codes to first-occurrence order
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    codes = rank[inv].astype(np.uint32)
    return codes, uniq[order]


class DictCodec(IntCodec):
    name = "dict"

    def __init__(self, dtype=np.uint64, code_codecs=None):
        super().__init__(dtype)
        if code_codecs is None:
            from . import int_candidates

            code_codecs = int_candidates(np.uint32, include_dict=False)
        self._code_codecs = code_codecs

    def encode(self, values: np.ndarray) -> bytes:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        codes, uniq = factorize(values)
        best_name, best_payload = None, None
        for codec in self._code_codecs:
            payload = codec.encode(codes)
            if best_payload is None or len(payload) < len(best_payload):
                best_name, best_payload = codec.name, payload
        from . import CODEC_IDS

        return b"".join(
            [
                struct.pack("<I", len(uniq)),
                uniq.tobytes(),
                bytes([CODEC_IDS[best_name]]),
                best_payload,
            ]
        )

    def _parts(self, payload: bytes):
        from . import CODEC_NAMES, int_codec

        n_dict = struct.unpack_from("<I", payload, 0)[0]
        uniq = np.frombuffer(payload, dtype=self.dtype, count=n_dict, offset=4)
        off = 4 + n_dict * self.dtype.itemsize
        inner = int_codec(CODEC_NAMES[payload[off]], np.uint32)
        return uniq, inner, payload[off + 1 :]

    def decode(self, payload: bytes, n: int) -> np.ndarray:
        uniq, inner, sub = self._parts(payload)
        codes = inner.decode(sub, n)
        return uniq[codes.astype(np.int64)]

    def gather(self, payload, positions, n):
        uniq, inner, sub = self._parts(payload)
        codes = inner.gather(sub, positions, n)
        return uniq[codes.astype(np.int64)]

    def sum(self, payload: bytes, n: int) -> int:
        uniq, inner, sub = self._parts(payload)
        codes = inner.decode(sub, n)
        counts = np.bincount(codes.astype(np.int64), minlength=len(uniq))
        return int((uniq.astype(object) * counts.astype(object)).sum())

    def filter_gt(self, payload: bytes, n: int, v: int) -> np.ndarray:
        uniq, inner, sub = self._parts(payload)
        codes = inner.decode(sub, n)
        hit = uniq > self.dtype.type(v)  # tiny dict-side predicate, then gather
        return np.flatnonzero(hit[codes.astype(np.int64)])
