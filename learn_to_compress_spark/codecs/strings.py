"""String chunk codecs: raw / FSST / dictionary / word-dictionary.

Arrow-native: every hot-path kernel runs in pyarrow compute (C++ —
``split_pattern``, ``dictionary_encode``, ``binary_join``, ``take``), so
executors never churn Python object arrays; this is what keeps the encode
job memory-bandwidth-friendly at 32 concurrent workers.

A string chunk enters as a ``pyarrow`` binary/string array (nulls already
stripped by the column framing layer, ``learn_to_compress_spark.select``).
All codecs share the offsets scheme of ``experiments/example_fsst.cpp:86-107``:
per-row end offsets form an int64 column that is itself compressed with the
best integer codec (composition, exactly like the reference delta-encodes
FSST offsets).

Offsets/ints sub-block layout: ``inner_id:u8 | sub_len:u64 | sub_payload``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import fsst as fsst_mod


def _as_binary_array(strs) -> pa.Array:
    if isinstance(strs, pa.ChunkedArray):
        strs = strs.combine_chunks()
    if isinstance(strs, pa.Array):
        arr = strs
    else:
        arr = pa.array(strs, type=pa.large_binary())
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    return arr


def _blob_and_ends(arr: pa.Array) -> tuple[bytes, np.ndarray]:
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lens)
    # flatten via the value buffer (respecting the array's offset window)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)
    start = offs[arr.offset]
    end = offs[arr.offset + len(arr)]
    blob = arr.buffers()[2].to_pybytes()[start:end] if arr.buffers()[2] else b""
    return blob, ends


def _from_blob(blob: bytes, ends: np.ndarray) -> pa.Array:
    offsets = np.concatenate(([0], ends)).astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(ends),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
    )


def _encode_ints_best(values: np.ndarray) -> bytes:
    """Compress an int64 side-array (offsets / codes / counts) with the best
    fixed int codec — sized analytically, encoded once."""
    from . import CODEC_IDS, int_codec

    vals = values.astype(np.uint64)
    from ..select import int_codec_sizes

    # leco excluded: on dict codes / counts / offsets it ties FOR at best,
    # and its sizing needs a fit + residual scan per call
    sizes = int_codec_sizes(vals, np.uint64, candidates=("raw", "for", "delta", "rle"))
    name = min(sizes, key=sizes.get)
    best = int_codec(name, np.uint64).encode(vals)
    return bytes([CODEC_IDS[name]]) + struct.pack("<Q", len(best)) + best


def _decode_ints_best(buf: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    from . import CODEC_NAMES, int_codec

    name = CODEC_NAMES[buf[off]]
    (ln,) = struct.unpack_from("<Q", buf, off + 1)
    start = off + 9
    vals = int_codec(name, np.uint64).decode(bytes(buf[start : start + ln]), n)
    return vals, start + ln


class StrRawCodec:
    """Offsets + concatenated blob, no blob compression."""

    name = "str_raw"

    def encode(self, strs) -> bytes:
        arr = _as_binary_array(strs)
        blob, ends = _blob_and_ends(arr)
        return _encode_ints_best(ends) + blob

    def decode(self, payload: bytes, n: int) -> pa.Array:
        if n == 0:
            return pa.array([], type=pa.large_binary())
        ends_u, off = _decode_ints_best(payload, 0, n)
        return _from_blob(payload[off:], ends_u.astype(np.int64))


class FsstStringCodec:
    """FSST over the concatenated blob; uncompressed-domain offsets.

    Layout: ``offsets-sub-block | symtab | comp_len:u64 | compressed blob``.
    (Training/compression are Python over the blob — FSST has no Arrow
    kernel; the cost model rarely picks it when word_dict applies.)
    """

    name = "fsst"

    def encode(self, strs) -> bytes:
        arr = _as_binary_array(strs)
        blob, ends = _blob_and_ends(arr)
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

    def decode(self, payload: bytes, n: int) -> pa.Array:
        if n == 0:
            return pa.array([], type=pa.large_binary())
        ends_u, off = _decode_ints_best(payload, 0, n)
        symbols, off = fsst_mod.deserialize_table(payload, off)
        (comp_len,) = struct.unpack_from("<Q", payload, off)
        comp = payload[off + 8 : off + 8 + comp_len]
        blob = fsst_mod.decompress(bytes(comp), symbols)
        return _from_blob(blob, ends_u.astype(np.int64))


class DictStringCodec:
    """Dictionary of unique strings + int-codec-compressed codes
    (``pc.dictionary_encode`` — first-occurrence order, C++).

    With run-structured inputs (roles/tools) the code column selects RLE,
    giving the reference's dict+RLE composition for low-cardinality strings
    (``experiments/raw_test_dictionary.cpp`` + ``headers/rle.h``).

    Layout: ``n_uniq:u32 | uniq-ends sub-block | uniq blob | codes sub-block``.
    """

    name = "str_dict"

    def encode(self, strs) -> bytes:
        arr = _as_binary_array(strs)
        denc = pc.dictionary_encode(arr.cast(pa.large_string()))
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq = denc.dictionary.cast(pa.large_binary())
        blob, ends = _blob_and_ends(uniq)
        return b"".join(
            [
                struct.pack("<I", len(uniq)),
                _encode_ints_best(ends),
                blob,
                _encode_ints_best(codes),
            ]
        )

    def decode(self, payload: bytes, n: int) -> pa.Array:
        if n == 0:
            return pa.array([], type=pa.large_binary())
        (n_uniq,) = struct.unpack_from("<I", payload, 0)
        ends_u, off = _decode_ints_best(payload, 4, n_uniq)
        ends = ends_u.astype(np.int64)
        blob_len = int(ends[-1]) if n_uniq else 0
        uniq = _from_blob(payload[off : off + blob_len], ends)
        codes, _ = _decode_ints_best(payload, off + blob_len, n)
        return pc.take(uniq, pa.array(codes.view(np.int64)))


class WordDictCodec:
    """Word-level dictionary coding for natural-language text.

    ``split_pattern(' ')`` → flat token stream → ``dictionary_encode`` →
    token codes and per-row token counts through the integer codec chooser;
    decode is ``take`` + ``binary_join`` — every step a C++ Arrow kernel.
    Split/join on the space byte is an exact identity (0x20 never occurs
    inside a UTF-8 multibyte sequence). On word-structured text this beats
    byte-level FSST in ratio and speed; the cost model picks per chunk
    (our extension — the reference has no word-level codec).

    Layout: ``n_uniq:u32 | uniq-ends sub | uniq blob | counts sub | codes sub``.
    """

    name = "word_dict"

    def encode(self, strs) -> bytes:
        arr = _as_binary_array(strs)
        toks = pc.split_pattern(arr, pattern=" ")
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        denc = pc.dictionary_encode(flat.cast(pa.large_string()))
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq = denc.dictionary.cast(pa.large_binary())
        blob, ends = _blob_and_ends(uniq)
        return b"".join(
            [
                struct.pack("<I", len(uniq)),
                _encode_ints_best(ends),
                blob,
                _encode_ints_best(counts.astype(np.uint64)),
                _encode_ints_best(codes),
            ]
        )

    def decode(self, payload: bytes, n: int) -> pa.Array:
        if n == 0:
            return pa.array([], type=pa.large_binary())
        (n_uniq,) = struct.unpack_from("<I", payload, 0)
        ends_u, off = _decode_ints_best(payload, 4, n_uniq)
        ends = ends_u.astype(np.int64)
        blob_len = int(ends[-1]) if n_uniq else 0
        uniq = _from_blob(payload[off : off + blob_len], ends)
        counts, off2 = _decode_ints_best(payload, off + blob_len, n)
        counts = counts.astype(np.int64)
        codes, _ = _decode_ints_best(payload, off2, int(counts.sum()))
        toks = pc.take(uniq.cast(pa.large_string()), pa.array(codes.view(np.int64)))
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        lst = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), toks)
        joined = pc.binary_join(lst, pa.scalar(" ", pa.large_string()))
        return joined.cast(pa.large_binary())


STRING_CODEC_CLASSES = {
    c.name: c for c in (StrRawCodec, FsstStringCodec, DictStringCodec, WordDictCodec)
}
