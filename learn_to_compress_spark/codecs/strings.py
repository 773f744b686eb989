"""String chunk codecs: raw / FSST / dictionary (codes recursively encoded).

A string chunk is a list of non-null ``bytes`` (nulls are stripped by the
column framing layer, ``learn_to_compress_spark.select``). All codecs share
the offsets scheme of ``experiments/example_fsst.cpp:86-107``: per-row end
offsets form an int64 column that is itself compressed with the best integer
codec (composition, exactly like the reference delta-encodes FSST offsets).

Offsets sub-block layout: ``inner_id:u8 | sub_len:u64 | sub_payload``.
"""

from __future__ import annotations

import struct

import numpy as np

from . import fsst as fsst_mod


def _encode_ints_best(values: np.ndarray) -> bytes:
    from . import CODEC_IDS, int_candidates

    best_name, best = None, None
    for codec in int_candidates(np.uint64, include_dict=False):
        payload = codec.encode(values.astype(np.uint64))
        if best is None or len(payload) < len(best):
            best_name, best = codec.name, payload
    return bytes([CODEC_IDS[best_name]]) + struct.pack("<Q", len(best)) + best


def _decode_ints_best(buf: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    from . import CODEC_NAMES, int_codec

    name = CODEC_NAMES[buf[off]]
    (ln,) = struct.unpack_from("<Q", buf, off + 1)
    start = off + 9
    vals = int_codec(name, np.uint64).decode(bytes(buf[start : start + ln]), n)
    return vals, start + ln


def _lengths(strs: list[bytes]) -> np.ndarray:
    return np.fromiter(map(len, strs), dtype=np.int64, count=len(strs))


def _split_blob(blob: bytes, ends: np.ndarray) -> list[bytes]:
    starts = np.concatenate(([0], ends[:-1]))
    return [blob[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


class StrRawCodec:
    """Offsets + concatenated blob, no blob compression."""

    name = "str_raw"

    def encode(self, strs: list[bytes]) -> bytes:
        ends = np.cumsum(_lengths(strs))
        blob = b"".join(strs)
        return _encode_ints_best(ends) + blob

    def decode(self, payload: bytes, n: int) -> list[bytes]:
        if n == 0:
            return []
        ends_u, off = _decode_ints_best(payload, 0, n)
        ends = ends_u.astype(np.int64)
        return _split_blob(payload[off:], ends)


class FsstStringCodec:
    """FSST over the concatenated blob; uncompressed-domain offsets.

    Layout: ``offsets-sub-block | symtab | comp_len:u64 | compressed blob``.
    """

    name = "fsst"

    def encode(self, strs: list[bytes]) -> bytes:
        ends = np.cumsum(_lengths(strs))
        blob = b"".join(strs)
        symbols = fsst_mod.train(blob)
        comp = fsst_mod.compress(blob, symbols)
        return b"".join(
            [
                _encode_ints_best(ends),
                fsst_mod.serialize_table(symbols),
                struct.pack("<Q", len(comp)),
                comp,
            ]
        )

    def decode(self, payload: bytes, n: int) -> list[bytes]:
        if n == 0:
            return []
        ends_u, off = _decode_ints_best(payload, 0, n)
        symbols, off = fsst_mod.deserialize_table(payload, off)
        (comp_len,) = struct.unpack_from("<Q", payload, off)
        comp = payload[off + 8 : off + 8 + comp_len]
        blob = fsst_mod.decompress(bytes(comp), symbols)
        return _split_blob(blob, ends_u.astype(np.int64))


class DictStringCodec:
    """Dictionary of unique strings + int-codec-compressed codes.

    With run-structured inputs (roles/tools) the code column selects RLE,
    giving the reference's dict+RLE composition for low-cardinality strings
    (``experiments/raw_test_dictionary.cpp`` + ``headers/rle.h``).

    Layout: ``n_uniq:u32 | uniq-ends sub-block | uniq blob | codes sub-block``.
    """

    name = "str_dict"

    def encode(self, strs: list[bytes]) -> bytes:
        seen: dict[bytes, int] = {}
        codes = np.empty(len(strs), dtype=np.uint64)
        for i, s in enumerate(strs):  # dict build; O(n) hashing at C speed
            code = seen.get(s)
            if code is None:
                code = len(seen)
                seen[s] = code
            codes[i] = code
        uniqs = list(seen.keys())
        ends = np.cumsum(_lengths(uniqs)) if uniqs else np.zeros(0, np.int64)
        return b"".join(
            [
                struct.pack("<I", len(uniqs)),
                _encode_ints_best(ends),
                b"".join(uniqs),
                _encode_codes(codes),
            ]
        )

    def decode(self, payload: bytes, n: int) -> list[bytes]:
        if n == 0:
            return []
        (n_uniq,) = struct.unpack_from("<I", payload, 0)
        ends_u, off = _decode_ints_best(payload, 4, n_uniq)
        ends = ends_u.astype(np.int64)
        blob_len = int(ends[-1]) if n_uniq else 0
        uniqs = _split_blob(payload[off : off + blob_len], ends)
        codes, _ = _decode_ints_best(payload, off + blob_len, n)
        idx = codes.astype(np.int64)
        return [uniqs[i] for i in idx.tolist()]


def _encode_codes(codes: np.ndarray) -> bytes:
    return _encode_ints_best(codes)


class WordDictCodec:
    """Word-level dictionary coding for natural-language text.

    Split each string on the space byte (split/join is an exact identity, and
    0x20 never occurs inside a UTF-8 multibyte sequence), factorize the token
    stream chunk-wide, then compress token codes and per-row token counts
    with the integer codec chooser. On word-structured text this beats
    byte-level FSST in both ratio and speed; FSST remains in the candidate
    set and the cost model picks per chunk (our extension — the reference
    has no word-level codec).

    Layout: ``n_uniq:u32 | uniq-ends sub | uniq blob | counts sub | codes sub``.
    """

    name = "word_dict"

    def encode(self, strs: list[bytes]) -> bytes:
        toks_per = [s.split(b" ") for s in strs]
        counts = np.fromiter(map(len, toks_per), np.int64, len(strs))
        flat = np.empty(int(counts.sum()), dtype=object)
        pos = 0
        for toks in toks_per:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
        import pandas as pd

        codes, uniq = pd.factorize(flat, sort=False)
        uniqs = list(uniq)
        ends = np.cumsum(_lengths(uniqs)) if uniqs else np.zeros(0, np.int64)
        return b"".join(
            [
                struct.pack("<I", len(uniqs)),
                _encode_ints_best(ends),
                b"".join(uniqs),
                _encode_ints_best(counts.astype(np.uint64)),
                _encode_ints_best(codes.astype(np.uint64)),
            ]
        )

    def decode(self, payload: bytes, n: int) -> list[bytes]:
        if n == 0:
            return []
        (n_uniq,) = struct.unpack_from("<I", payload, 0)
        ends_u, off = _decode_ints_best(payload, 4, n_uniq)
        ends = ends_u.astype(np.int64)
        blob_len = int(ends[-1]) if n_uniq else 0
        uniqs = np.array(_split_blob(payload[off : off + blob_len], ends), dtype=object)
        counts, off2 = _decode_ints_best(payload, off + blob_len, n)
        counts = counts.astype(np.int64)
        codes, _ = _decode_ints_best(payload, off2, int(counts.sum()))
        toks = uniqs[codes.astype(np.int64)]
        bounds = np.cumsum(counts)[:-1]
        return [b" ".join(x) for x in np.split(toks, bounds)]


STRING_CODEC_CLASSES = {
    c.name: c for c in (StrRawCodec, FsstStringCodec, DictStringCodec, WordDictCodec)
}
