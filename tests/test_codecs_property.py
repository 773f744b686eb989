"""Property-based fuzz of the codec layer (hypothesis).

The reference's tests are example-driven benchmark drivers
(``experiments/*.cpp`` assert roundtrip equality on fixed datasets); these
properties assert the same contracts — decode∘encode = id, gather = decode
then index, sum = exact Python-int sum, filter_gt = positions of x > v —
over adversarial generated inputs: extreme magnitudes (int64 min/max),
duplicates, sorted/reversed runs, single elements, and strings with nulls,
empties and 0xFF bytes (FSST escape).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from learn_to_compress_spark.codecs import INT_CODEC_CLASSES, int_codec

SLOW = {"leco_var_dp"}  # O(window³) encode: fewer examples below
# "linked" is a framing-level codec (needs a companion column); it has its
# own property test below and cannot run the single-column protocol
FAST_CODECS = sorted(set(INT_CODEC_CLASSES) - SLOW - {"linked"})


def _arrays(draw, min_size=1, max_size=400):
    """int64 arrays biased toward codec-relevant shapes."""
    shape = draw(st.sampled_from(["random", "sorted", "runs", "affine"]))
    n = draw(st.integers(min_size, max_size))
    elems = st.integers(-(2**63), 2**63 - 1)
    base = draw(
        st.lists(elems, min_size=n, max_size=n).map(
            lambda v: np.array(v, dtype=np.int64)
        )
    )
    if shape == "sorted":
        base = np.sort(base)
    elif shape == "runs":
        reps = draw(st.integers(1, 17))
        base = np.repeat(base, reps)[: max(n, 1)]
    elif shape == "affine":
        slope = draw(st.integers(-1000, 1000))
        noise = draw(st.integers(0, 5))
        idx = np.arange(base.size, dtype=np.int64)
        base = (
            draw(st.integers(-(2**40), 2**40)) + slope * idx + (base % (noise + 1))
        ).astype(np.int64)
    return base


int64_arrays = st.composite(_arrays)()


@pytest.mark.parametrize("codec_name", FAST_CODECS)
@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_roundtrip_gather_sum_filter_properties(codec_name, data):
    vals = data.draw(int64_arrays).view(np.uint64)
    n = vals.size
    codec = int_codec(codec_name, np.uint64)
    payload = codec.encode(vals)
    out = codec.decode(payload, n)
    np.testing.assert_array_equal(out, vals)
    pos = data.draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=50).map(
            lambda p: np.array(p, dtype=np.int64)
        )
    )
    np.testing.assert_array_equal(codec.gather(payload, pos, n), vals[pos])
    assert codec.sum(payload, n) == int(vals.sum(dtype=object))
    v = int(data.draw(st.sampled_from([int(vals.min()), int(vals.max()), 0, 2**63])))
    np.testing.assert_array_equal(
        np.sort(codec.filter_gt(payload, n, v)), np.flatnonzero(vals > v)
    )


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_leco_var_dp_roundtrip_property(data):
    vals = data.draw(int64_arrays).view(np.uint64)
    codec = int_codec("leco_var_dp", np.uint64)
    np.testing.assert_array_equal(
        codec.decode(codec.encode(vals), vals.size), vals
    )


strings = st.lists(
    st.one_of(
        st.none(),  # nulls: handled by the framing layer's validity bitmap
        st.text(max_size=50),  # arbitrary unicode incl. astral planes
        st.just("\xff" * 9),
        st.just(""),
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=30, deadline=None)
@given(rows=strings)
def test_string_framing_roundtrip_property(rows):
    """End-to-end column framing (validity bitmap + codec race) over
    adversarial unicode with nulls and empties — the exact surface the
    Spark encode kernel calls per chunk."""
    import pandas as pd

    from learn_to_compress_spark.select import (
        decode_string_column,
        encode_string_column,
    )

    ser = pd.Series(rows, dtype="object")
    _, payload = encode_string_column(ser)
    out = decode_string_column(payload, len(rows))
    assert [None if pd.isna(v) else v for v in out] == rows


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_int_framing_roundtrip_property(data):
    """Int framing with nulls + order-preserving sign flip."""
    import pandas as pd

    from learn_to_compress_spark.select import decode_int_column, encode_int_column

    vals = data.draw(int64_arrays)
    null_at = data.draw(
        st.lists(st.integers(0, vals.size - 1), max_size=20, unique=True)
    )
    ser = pd.Series(vals, dtype="Int64")
    ser.iloc[null_at] = pd.NA
    _, payload = encode_int_column(ser, "int64")
    out = decode_int_column(payload, len(ser), "int64")
    assert out.isna().equals(ser.isna())
    mask = ~ser.isna()
    assert (out[mask].astype("int64") == ser[mask].astype("int64")).all()


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.integers(-10**6, 10**6).map(lambda v: v / 100.0),  # decimal shapes
        ),
        min_size=1,
        max_size=300,
    )
)
def test_double_framing_roundtrip_property(vals):
    """Double framing is bitwise exact (decimal-scale fast path or raw
    bit-pattern fallback) for any finite/infinite float64 mix with nulls."""
    import pandas as pd

    from learn_to_compress_spark.select import (
        decode_double_column,
        encode_double_column,
    )

    ser = pd.Series(vals, dtype="float64")
    _, payload = encode_double_column(ser)
    out = decode_double_column(payload, len(ser))
    a = ser.to_numpy(dtype="float64")
    b = out.to_numpy(dtype="float64")
    assert np.array_equal(a.view(np.uint64), b.view(np.uint64)) or (
        np.array_equal(np.isnan(a), np.isnan(b))
        and np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
    )


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_string_positions_gt_property(data):
    """Range pushdown on framed string columns equals decode-then-compare
    for arbitrary blocks (any winning codec) and arbitrary needles —
    including needles outside the block alphabet, longer than the pad
    width, and on the 0xff boundary."""
    import pandas as pd

    from learn_to_compress_spark.select import (
        column_positions_gt_string,
        encode_string_column,
    )

    kind = data.draw(st.sampled_from(["ids", "cat", "text", "free"]))
    n = data.draw(st.integers(1, 300))
    if kind == "ids":
        start = data.draw(st.integers(0, 10**12))
        step = data.draw(st.integers(1, 999))
        rows = ["k%015d" % (start + i * step) for i in range(n)]
    elif kind == "cat":
        vocab = ["alpha", "beta", "gamma", "delta", ""]
        rows = [vocab[data.draw(st.integers(0, 4))] for _ in range(n)]
    elif kind == "text":
        rows = [" ".join(["tok%d" % data.draw(st.integers(0, 9)) for _ in range(3)]) for _ in range(n)]
    else:
        rows = data.draw(
            st.lists(st.text(max_size=12), min_size=n, max_size=n)
        )
    ser = pd.Series(rows, dtype="object")
    _, payload = encode_string_column(ser)
    needle_s = data.draw(
        st.one_of(
            st.sampled_from(rows),
            st.text(max_size=18),
            st.just("\xff" * 3),
            st.just(""),
        )
    )
    needle = needle_s.encode("utf-8")
    strict = data.draw(st.booleans())
    got = np.sort(column_positions_gt_string(payload, n, needle, strict))
    enc = [r.encode("utf-8") for r in rows]
    want = np.array(
        [i for i, r in enumerate(enc) if (r > needle if strict else r >= needle)],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_filter_mod_band_property(data):
    """filter_mod_band == decode-then-% for every codec exposing it (LeCo
    per-period inversion, FOR period-intersection, RLE run-domain), over
    sign-boundary-straddling and narrow-range blocks (the r2 DP bug proved
    the top-bit generator earns its keep)."""
    codec_name = data.draw(st.sampled_from(["leco", "for", "rle"]))
    shape = data.draw(st.sampled_from(["narrow", "affine", "runs", "topbit"]))
    n = data.draw(st.integers(1, 400))
    if shape == "narrow":
        lo0 = data.draw(st.integers(0, 2**40))
        span = data.draw(st.integers(1, 3000))
        vals = (lo0 + data.draw(st.lists(st.integers(0, span), min_size=n, max_size=n))
                * np.ones(1, np.int64)).astype(np.uint64)
    elif shape == "affine":
        start = data.draw(st.integers(0, 2**40))
        slope = data.draw(st.integers(-500, 500))
        vals = (start + slope * np.arange(n)).astype(np.int64).view(np.uint64)
    elif shape == "runs":
        keys = data.draw(st.lists(st.integers(0, 2**30), min_size=1, max_size=8))
        vals = np.repeat(np.array(keys, np.uint64), max(n // len(keys), 1))[:n]
        if vals.size == 0:
            vals = np.array(keys[:1], np.uint64)
    else:
        vals = (2**63 - 256 + np.asarray(
            data.draw(st.lists(st.integers(0, 512), min_size=n, max_size=n)),
            dtype=np.uint64,
        ))
    n = vals.size
    codec = int_codec(codec_name, np.uint64)
    payload = codec.encode(vals)
    base = data.draw(st.integers(2, 1000))
    lo = data.draw(st.integers(-2, base))
    hi = data.draw(st.integers(lo, base + 2))
    res = codec.filter_mod_band(payload, n, base, lo, hi)
    signed = vals.view(np.int64)
    want = np.flatnonzero(((signed % base) > lo) & ((signed % base) < hi))
    if res is not None:
        pos, n_dec = res
        np.testing.assert_array_equal(np.sort(pos), want)
        assert 0 <= n_dec <= n if codec_name != "rle" else n_dec >= 0


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_leco_string_rung_roundtrip_property(data):
    """Both LeCo-string rungs: roundtrip + gather on generated ID-like
    blocks (varying pad widths, alphabets, shared prefixes, duplicate and
    single-row blocks) — whichever rung the block lands on."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import LecoStringCodec
    from learn_to_compress_spark.codecs.strings_wide import LecoStringWideCodec

    n = data.draw(st.integers(1, 250))
    prefix = data.draw(st.sampled_from(["", "id-", "Customer#", "k"]))
    width = data.draw(st.integers(1, 24))
    base = data.draw(st.sampled_from([10, 16, 36]))
    start = data.draw(st.integers(0, base**min(width, 12) - 1))
    step = data.draw(st.integers(0, 9999))
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"

    def enc(v):
        out = []
        for _ in range(width):
            out.append(digits[v % base])
            v //= base
        return "".join(reversed(out))

    rows = [(prefix + enc(start + i * step)).encode() for i in range(n)]
    arr = pa.array(rows, type=pa.large_binary())
    codec = None
    if LecoStringCodec.eligible(arr):
        codec = LecoStringCodec()
    elif LecoStringWideCodec.eligible(arr):
        codec = LecoStringWideCodec()
    if codec is None:
        return  # block outside both rungs (framing would pick FSST/dict)
    payload = codec.encode(arr)
    out = [bytes(x) for x in codec.decode(payload, n).to_pylist()]
    assert out == rows
    pos = data.draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=30).map(
            lambda p: np.array(p, dtype=np.int64)
        )
    )
    if hasattr(codec, "gather"):
        g = [bytes(x) for x in codec.gather(payload, pos, n).to_pylist()]
        assert g == [rows[i] for i in pos]


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_int_framing_filter_gt_and_mod_band_property(data):
    """Framing-level pushdowns (sign-flip mapping + codec dispatch) equal
    decode-then-compare over adversarial blocks and thresholds — the
    signflip boundary (±2^63) is where two prior bugs lived."""
    from learn_to_compress_spark.select import (
        column_filter_gt,
        column_filter_mod_band,
        encode_int_values,
    )

    vals = data.draw(int64_arrays)
    _, payload = encode_int_values(vals, None, "int64")
    v = data.draw(
        st.one_of(
            st.integers(-(2**63), 2**63 - 1),
            st.sampled_from([int(vals.min()), int(vals.max()), 0, -1]),
        )
    )
    got = np.sort(column_filter_gt(payload, vals.size, "int64", v))
    np.testing.assert_array_equal(got, np.flatnonzero(vals > v))
    base = data.draw(st.integers(2, 500))
    lo = data.draw(st.integers(-2, base))
    hi = data.draw(st.integers(lo, base + 2))
    got = np.sort(column_filter_mod_band(payload, vals.size, "int64", base, lo, hi))
    rem = vals % base  # numpy floor semantics == the oracle's
    np.testing.assert_array_equal(got, np.flatnonzero((rem > lo) & (rem < hi)))


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_string_prefix_filter_property(data):
    """Prefix filter == startswith over arbitrary framed blocks, incl
    0xff-boundary prefixes (upper bound carries/overflows)."""
    import pandas as pd

    from learn_to_compress_spark.select import (
        column_positions_prefix_string,
        encode_string_column,
    )

    n = data.draw(st.integers(1, 200))
    rows = data.draw(st.lists(st.text(max_size=10), min_size=n, max_size=n))
    ser = pd.Series(rows, dtype="object")
    _, payload = encode_string_column(ser)
    prefix_s = data.draw(
        st.one_of(st.text(min_size=1, max_size=6), st.sampled_from([r[:3] for r in rows if r] or ["x"]))
    )
    prefix = prefix_s.encode("utf-8")
    got = np.sort(column_positions_prefix_string(payload, n, prefix))
    enc = [r.encode("utf-8") for r in rows]
    want = np.array([i for i, r in enumerate(enc) if r.startswith(prefix)], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_linked_framing_roundtrip_property(data):
    """Linked (correlated-column) framing: for ANY int64 target/companion
    pair — extreme magnitudes, wrap-prone residuals, anti-correlated,
    constant companions — either the link is refused (None) or the framed
    payload decodes bit-identically through every reader entry point."""
    from learn_to_compress_spark.select import (
        column_decode_i64,
        column_filter_gt,
        column_sum,
        decode_int_column,
        encode_int_values,
        encode_linked_framed,
    )

    n = data.draw(st.integers(min_value=1, max_value=400))
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    mode = data.draw(st.sampled_from(["correlated", "noisy", "random", "extreme"]))
    x = np.array(data.draw(st.lists(i64, min_size=n, max_size=n)), dtype=np.int64)
    if mode == "correlated":
        x = np.sort(np.abs(x) % (1 << 40))
        y = (x * 3 + 17).astype(np.int64)
    elif mode == "noisy":
        x = np.abs(x) % (1 << 30)
        y = x + np.array(
            data.draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n)),
            dtype=np.int64,
        )
    elif mode == "extreme":
        y = np.array(data.draw(st.lists(i64, min_size=n, max_size=n)), dtype=np.int64)
    else:
        y = np.array(data.draw(st.lists(i64, min_size=n, max_size=n)), dtype=np.int64)

    framed = encode_linked_framed(y, x)
    if framed is None:
        return  # link refused (tiny/constant/uncastable) — independent path
    _, comp = encode_int_values(x.copy(), None, "int64")
    ctx = (comp, "int64")
    out = decode_int_column(framed, n, "int64", companion=ctx)
    np.testing.assert_array_equal(out.to_numpy(), y)
    v64, valid = column_decode_i64(framed, n, "int64", companion=ctx)
    assert valid is None
    np.testing.assert_array_equal(v64, y)
    v = int(data.draw(i64))
    np.testing.assert_array_equal(
        column_filter_gt(framed, n, "int64", v, companion=ctx), np.flatnonzero(y > v)
    )
    assert column_sum(framed, n, "int64", companion=ctx) == int(y.sum(dtype=object))


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_leco_string_outlier_roundtrip_property(data):
    """String outlier-detect rung: for skewed-length ID blocks with a random
    long tail, the codec is either refused or roundtrips bit-identically
    (framing level, so the exception merge and rung dispatch are covered)."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings_outlier import LecoStringOutlierCodec

    n = data.draw(st.integers(min_value=32, max_value=600))
    width = data.draw(st.integers(min_value=4, max_value=20))
    rows = [b"k%0*d" % (width, i * 7) for i in range(n)]
    n_out = data.draw(st.integers(min_value=0, max_value=max(1, n // 40)))
    out_idx = data.draw(
        st.lists(st.integers(0, n - 1), min_size=n_out, max_size=n_out, unique=True)
    )
    for k in out_idx:
        rows[k] = bytes(
            data.draw(st.binary(min_size=width + 50, max_size=width + 300))
        )
    arr = pa.array(rows, type=pa.large_binary())
    codec = LecoStringOutlierCodec()
    if not codec.eligible(arr):
        return
    payload = codec.encode(arr)
    assert codec.decode(payload, n).to_pylist() == rows


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=8, max_size=400),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_position_list_algebra_matches_brute(data, va, vb):
    """The AND-intersection and OR-union over codec position lists must
    equal the brute-force row predicate for ANY framed encoding of two
    correlated columns (the kernels behind filter_gt_and_table /
    filter_gt_or_table, minus Spark)."""
    import numpy as np

    from learn_to_compress_spark.select import column_filter_gt, encode_int_values

    a = np.asarray(data, dtype=np.int64)
    b = (a[::-1] * 3 + 7) % 10_001  # correlated second column, same length
    _, pa_ = encode_int_values(a, None, "int64")
    _, pb_ = encode_int_values(b.astype(np.int64), None, "int64")
    n = a.size
    la = column_filter_gt(pa_, n, "int64", va)
    lb = column_filter_gt(pb_, n, "int64", vb)
    # AND: sorted searchsorted membership (the operator's exact code shape)
    if lb.size:
        idx = np.searchsorted(lb, la)
        hit = (idx < lb.size) & (lb[np.minimum(idx, lb.size - 1)] == la)
        both = la[hit]
    else:
        both = la[:0]
    np.testing.assert_array_equal(both, np.flatnonzero((a > va) & (b > vb)))
    np.testing.assert_array_equal(
        np.union1d(la, lb), np.flatnonzero((a > va) | (b > vb))
    )
