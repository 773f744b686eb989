"""Bitpack roundtrips across widths × lengths incl. ragged tails —
mirror of the reference's legacy unit matrix (``src/unit.cpp:14-60``)."""

import numpy as np
import pytest

from learn_to_compress_spark.bitpack import (
    gather_signmag,
    gather_unsigned,
    pack_signmag,
    pack_unsigned,
    unpack_signmag,
    unpack_unsigned,
)

RNG = np.random.default_rng(42)
LENGTHS = [1, 7, 8, 63, 64, 127, 128, 1000, 4096]


@pytest.mark.parametrize("l", [1, 2, 3, 5, 7, 8, 9, 13, 16, 21, 31, 32, 33, 47, 63, 64])
def test_unsigned_roundtrip(l):
    for n in LENGTHS:
        vals = RNG.integers(0, 2**64 - 1, size=n, dtype=np.uint64)
        if l < 64:
            vals &= np.uint64((1 << l) - 1)
        buf = pack_unsigned(vals, l)
        assert buf.size == -(-n * l // 8)  # exactly ceil(n*l/8) bytes
        out = unpack_unsigned(buf, n, l)
        np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("l", [2, 3, 8, 17, 33, 64])
def test_signmag_roundtrip(l):
    for n in LENGTHS:
        mag = RNG.integers(0, 2 ** (l - 1), size=n, dtype=np.uint64)
        sign = RNG.integers(0, 2, size=n).astype(bool)
        buf = pack_signmag(sign, mag, l)
        s, m = unpack_signmag(buf, n, l)
        np.testing.assert_array_equal(s, sign)
        np.testing.assert_array_equal(m, mag)


@pytest.mark.parametrize("l", [1, 5, 12, 20, 31, 33, 48, 64])
def test_gather_matches_full_unpack(l):
    n = 999
    vals = RNG.integers(0, 2**63, size=n, dtype=np.uint64) & np.uint64((1 << l) - 1 if l < 64 else 2**64 - 1)
    buf = pack_unsigned(vals, l)
    pos = RNG.integers(0, n, size=200)
    np.testing.assert_array_equal(gather_unsigned(buf, pos, l), vals[pos])


def test_gather_signmag():
    l = 11
    n = 500
    mag = RNG.integers(0, 2 ** (l - 1), size=n, dtype=np.uint64)
    sign = RNG.integers(0, 2, size=n).astype(bool)
    buf = pack_signmag(sign, mag, l)
    pos = RNG.integers(0, n, size=100)
    s, m = gather_signmag(buf, pos, l)
    np.testing.assert_array_equal(s, sign[pos])
    np.testing.assert_array_equal(m, mag[pos])


def test_known_vector_lsb_first():
    # 3-bit slots [1, 2, 3, 7], LSB-first per slot:
    # stream = 1,0,0 | 0,1,0 | 1,1,0 | 1,1,1 → byte0 = 0b11010001, byte1 = 0b1110
    buf = pack_unsigned(np.array([1, 2, 3, 7], dtype=np.uint64), 3)
    assert buf.tobytes() == bytes([0b11010001, 0b00001110])


@pytest.mark.parametrize("widths", [[0, 1, 4, 14, 40, 57, 63], [14, 15, 16], [0, 0]])
def test_unpack_unsigned_ragged_matches_per_row(widths):
    from learn_to_compress_spark.bitpack import unpack_unsigned_ragged

    n = 100
    rows, expect = [], []
    for l in widths:
        if l:
            vals = RNG.integers(0, 2**63, size=n, dtype=np.uint64) & np.uint64(
                (1 << l) - 1
            )
        else:
            vals = np.zeros(n, dtype=np.uint64)
        rows.append(pack_unsigned(vals, l).tobytes())
        expect.append(vals)
    flat = np.frombuffer(b"".join(rows) + b"\x00" * 16, dtype=np.uint8)
    lens = np.array([len(r) for r in rows], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[: len(rows)]
    got = unpack_unsigned_ragged(flat, starts, np.array(widths), n)
    for b, vals in enumerate(expect):
        np.testing.assert_array_equal(got[b], vals)
