"""Bit-pack / unpack kernels — the bit-identity substrate.

Re-expresses the reference's packed-slot layout (LeCo, SIGMOD'24;
yhliu918/Learn-to-Compress) in vectorized numpy:

* slots are ``l``-bit wide, packed LSB-first within the byte stream, i.e. the
  payload is the little-endian bitstream of the slot sequence
  (reference: ``headers/bit_write.h:258-323`` ``write_delta_int_T``,
  ``headers/bit_read.h:222-275`` ``read_all_bit_fix``);
* sign-magnitude slots carry the sign bit at position ``l-1`` with sign=1
  meaning the residual is ADDED to the prediction
  (``headers/bit_read.h:244-258``), magnitude masked to ``l-1`` bits;
* unsigned slots (FOR) are plain ``l``-bit values
  (``headers/bit_write.h:327-390`` ``write_FOR_int_T``);
* the writer emits ``ceil(n*l/8)`` payload bytes, then one extra zero byte
  from its flush loop, then a fixed zero tail pad:
  ``8 - ceil(n*l/8) % 8`` bytes for the sign-magnitude writer
  (``bit_write.h:316-322``) and ``(32 - l) // 8`` bytes for the unsigned
  writer (``bit_write.h:379-384`` — it uses ``sizeof(uint32_t)`` regardless
  of T, a quirk we reproduce for size parity).

All functions operate on numpy arrays only (no per-row Python); they are
called from inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = _U64(1)


def _mask(l: int) -> np.uint64:
    """All-ones mask of width l (0 <= l <= 64)."""
    if l >= 64:
        return _U64(0xFFFFFFFFFFFFFFFF)
    return _U64((1 << l) - 1)


def pack_unsigned(values: np.ndarray, l: int) -> np.ndarray:
    """Pack ``values`` (uint64, each < 2**l) into an LSB-first bitstream.

    Returns a uint8 array of exactly ``ceil(n*l/8)`` bytes (no tail pad —
    callers add the reference pad via :func:`ref_tail_pad_*`).
    """
    values = np.ascontiguousarray(values, dtype=_U64)
    n = values.size
    if l == 0 or n == 0:
        return np.zeros(0, dtype=np.uint8)
    if n * l <= 1 << 20:
        # small inputs (segment streams): one broadcast beats l python-level
        # column passes; the 8-byte/bit intermediate is ≤ 8 MiB here
        bits = (
            (values[:, None] >> np.arange(l, dtype=_U64)[None, :]) & _ONE
        ).astype(np.uint8)
        return np.packbits(bits.reshape(-1), bitorder="little")
    # column-wise bit extraction keeps the intermediate at 1 byte/bit
    # (a values[:,None] >> shifts broadcast would hold 8 bytes/bit)
    bits = np.empty((n, l), dtype=np.uint8)
    for j in range(l):
        bits[:, j] = (values >> _U64(j)).astype(np.uint8) & 1
    return np.packbits(bits.reshape(-1), bitorder="little")


def unpack_unsigned(buf: np.ndarray | bytes, n: int, l: int) -> np.ndarray:
    """Inverse of :func:`pack_unsigned`; returns uint64 array of length n."""
    if l == 0 or n == 0:
        return np.zeros(n, dtype=_U64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if 4 <= l <= 56:
        # 64-bit-window decode: each slot lives inside the little-endian
        # 8-byte window at its byte offset (bit offset ≤ 7, so bitoff + l
        # ≤ 63 + 1) — ONE unaligned-u64 gather + one shift instead of l
        # per-bit passes. The byte-strided u64 view makes every byte
        # offset addressable without materializing an (n, 8) window.
        # Below 4 bits the per-bit loop moves less memory and wins.
        bit0 = np.arange(n, dtype=np.int64) * l
        byte0 = bit0 >> 3
        shift = (bit0 & 7).astype(_U64)
        need = int(byte0[-1]) + 8
        if raw.size < need:
            pad = np.zeros(need, dtype=np.uint8)
            pad[: raw.size] = raw
            raw = pad
        raw = np.ascontiguousarray(raw)
        view = np.ndarray(
            buffer=raw.data, dtype=np.dtype("<u8"), shape=(raw.size - 7,), strides=(1,)
        )
        return (view[byte0] >> shift) & _mask(l)
    bits = np.unpackbits(raw, count=n * l, bitorder="little").reshape(n, l)
    out = np.zeros(n, dtype=_U64)
    for j in range(l):
        out |= bits[:, j].astype(_U64) << _U64(j)
    return out


def unpack_unsigned_ragged(
    flat: np.ndarray, starts: np.ndarray, ls: np.ndarray, n: int
) -> np.ndarray:
    """Batched :func:`unpack_unsigned` over B bitstreams packed in ONE buffer,
    each with its OWN slot width.

    ``flat`` is a contiguous uint8 buffer holding every stream back-to-back
    plus ≥8 zero tail bytes; stream ``b`` begins at byte ``starts[b]`` and
    holds ``n`` slots of ``ls[b]`` bits each. Returns ``(B, n)`` uint64.
    One strided-u64 gather over the whole buffer — with per-row shifts and
    masks — replaces B separate unpack calls, which is what makes tiny
    reference block sizes (100-value blocks,
    ``benchmark/fix_int_benchmark.py:16-26``) decode at full vector speed
    instead of paying numpy call overhead per block. Rows with ``ls == 0``
    come back all-zero, matching :func:`unpack_unsigned`.
    """
    B = int(starts.size)
    if n == 0 or B == 0:
        return np.zeros((B, n), dtype=_U64)
    # int32 index math when the buffer provably fits (half-width
    # temporaries matter — this kernel is memory-traffic bound); a joined
    # payload ≥ 2 GiB would silently wrap int32 offsets, so the worst-case
    # byte offset is checked in exact Python ints and the kernel widens to
    # int64 indexing when needed
    ls_arr = np.asarray(ls)
    worst = int(np.max(starts)) + ((n * int(ls_arr.max()) + 7) >> 3) + 16
    idt = np.int32 if worst < 2**31 else np.int64
    ls = ls_arr.astype(idt)
    bit0 = np.arange(n, dtype=idt)[None, :] * ls[:, None]
    byte0 = np.asarray(starts, dtype=idt)[:, None] + (bit0 >> 3)
    flat = np.ascontiguousarray(flat)
    if bool((ls <= 25).all()):
        # every slot fits a 4-byte window (bitoff ≤ 7, so 7+25 ≤ 32): the
        # u32 gather and u32 shift/mask temporaries move half the memory
        view32 = np.ndarray(
            buffer=flat.data, dtype=np.dtype("<u4"), shape=(flat.size - 3,), strides=(1,)
        )
        shift32 = (bit0 & 7).astype(np.uint32)
        masks32 = (np.uint32(1) << ls.astype(np.uint32)) - np.uint32(1)
        slots32 = (view32[byte0] >> shift32) & masks32[:, None]
        return slots32.astype(_U64)
    shift = (bit0 & 7).astype(_U64)
    view = np.ndarray(
        buffer=flat.data, dtype=np.dtype("<u8"), shape=(flat.size - 7,), strides=(1,)
    )
    slots = view[byte0] >> shift
    if bool((ls > 56).any()):
        # a >56-bit slot can straddle 9 bytes — merge the 9th byte exactly
        # like unpack_unsigned's wide path (cheap: only runs when present)
        hi = flat[byte0 + 8].astype(_U64)
        upshift = (_U64(64) - shift) & _U64(63)
        slots |= np.where(shift > 0, hi << upshift, _U64(0))
    lsc = np.where(ls >= 64, 0, ls).astype(_U64)
    masks = np.where(ls >= 64, ~_U64(0), (_ONE << lsc) - _ONE)
    return slots & masks[:, None]


def pack_signmag(sign: np.ndarray, mag: np.ndarray, l: int) -> np.ndarray:
    """Pack sign-magnitude slots: slot = (mag & mask(l-1)) | sign << (l-1).

    ``sign`` is boolean (True = residual added to prediction), ``mag`` uint64.
    Mirrors ``write_delta_int_T`` (``bit_write.h:287-295``) including the
    magnitude mask to ``l-1`` bits.
    """
    mag = np.ascontiguousarray(mag, dtype=_U64)
    slots = (mag & _mask(l - 1)) | (sign.astype(_U64) << _U64(l - 1))
    return pack_unsigned(slots, l)


def unpack_signmag(buf: np.ndarray | bytes, n: int, l: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_signmag` → (sign: bool[n], mag: uint64[n])."""
    slots = unpack_unsigned(buf, n, l)
    sign = ((slots >> _U64(l - 1)) & _ONE).astype(bool)
    mag = slots & _mask(l - 1)
    return sign, mag


def gather_unsigned(buf: np.ndarray | bytes, positions: np.ndarray, l: int) -> np.ndarray:
    """Random-access read of ``l``-bit slots at ``positions`` (vectorized).

    Equivalent of the reference's per-slot readers
    (``bit_read.h:1171-1199`` ``read_bit_fix_int_wo_round``,
    ``bit_read.h:1270-1291``) but over a whole position list at once —
    used by the bitmap/selective-decode path (``experiments/test_bitmap.cpp``).
    """
    if l == 0:
        return np.zeros(len(positions), dtype=_U64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    # pad so every 9-byte window read is in-bounds
    padded = np.zeros(raw.size + 16, dtype=np.uint8)
    padded[: raw.size] = raw
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    bit0 = pos * l
    byte0 = bit0 >> 3
    bitoff = (bit0 & 7).astype(_U64)
    view = np.ndarray(
        buffer=padded.data, dtype=np.dtype("<u8"), shape=(padded.size - 7,), strides=(1,)
    )
    word = view[byte0]
    hi = padded[byte0 + 8].astype(_U64)
    lo = word >> bitoff
    # avoid shift-by-64: only merge the 9th byte when bitoff > 0
    upshift = (_U64(64) - bitoff) & _U64(63)
    extra = np.where(bitoff > 0, hi << upshift, _U64(0))
    return (lo | extra) & _mask(l)


def gather_signmag(buf: np.ndarray | bytes, positions: np.ndarray, l: int) -> tuple[np.ndarray, np.ndarray]:
    """Random-access sign-magnitude read → (sign, mag) at positions."""
    slots = gather_unsigned(buf, positions, l)
    sign = ((slots >> _U64(l - 1)) & _ONE).astype(bool)
    mag = slots & _mask(l - 1)
    return sign, mag


def ref_tail_pad_signmag(payload_bytes: int) -> int:
    """Zero-byte tail the reference writer appends after a sign-magnitude
    payload of ``payload_bytes`` = ceil(n*l/8): one flush byte plus
    ``8 - payload_bytes % 8`` (``bit_write.h:279-322``)."""
    return 1 + (8 - payload_bytes % 8)


def ref_tail_pad_unsigned(l: int) -> int:
    """Zero-byte tail after an unsigned (FOR) payload: one flush byte plus
    ``(32 - l) // 8`` (``bit_write.h:340-384``; uses uint32 width for any T)."""
    return 1 + max(0, (32 - l) // 8)
