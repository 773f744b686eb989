"""Per-codec roundtrip / gather / sum / filter tests on reference-shaped
synthetic data (FIXTURES.md §2; seed 42, mirroring ``scripts/gen_norm.py``,
``scripts/generate_stepwise.py``, ``scripts/poisson_randomdie.py``)."""

import numpy as np
import pandas as pd
import pytest

from learn_to_compress_spark.codecs import INT_CODEC_CLASSES, int_codec
from learn_to_compress_spark.codecs.strings import (
    DictStringCodec,
    FsstStringCodec,
    StrRawCodec,
    WordDictCodec,
)
from learn_to_compress_spark.select import (
    decode_int_column,
    decode_string_column,
    encode_int_column,
    encode_string_column,
)

class _FreshRNG:
    """Order-independent determinism: every draw comes from a fresh
    fixed-seed stream keyed by the FULL method-name bytes (seeding by
    char-sum collided anagram/equal-sum names onto one stream and made
    consecutive same-method calls identical — ADVICE r2), so
    adding/removing earlier tests can never shift later fixtures while
    distinct methods still get distinct data."""

    def __init__(self, seed=42):
        self._seed = seed

    def __getattr__(self, name):
        return getattr(np.random.default_rng([self._seed, *name.encode()]), name)


RNG = _FreshRNG(42)


def fixtures_u32():
    n = 5000
    linear = (np.linspace(1000, 2**31, n) + RNG.uniform(-16, 16, n)).astype(np.uint32)
    stepwise = (3 + 5 * np.arange(n) + RNG.integers(-3, 4, n)).astype(np.uint32)
    runs = np.repeat(
        RNG.integers(0, 50, size=n), RNG.geometric(1 / 30, size=n)
    )[:n].astype(np.uint32)
    lowcard = RNG.integers(0, 12, size=n).astype(np.uint32) * 1000
    rand = RNG.integers(0, 2**32 - 1, size=n, dtype=np.uint64).astype(np.uint32)
    const = np.full(n, 77, dtype=np.uint32)
    return {
        "linear": linear,
        "stepwise": stepwise,
        "runs": runs,
        "lowcard": lowcard,
        "random": rand,
        "const": const,
    }


def fixtures_u64():
    n = 4000
    gaps = RNG.poisson(2e6, n).astype(np.uint64)
    poisson_ts = np.cumsum(gaps) + np.uint64(10**12)
    rand = RNG.integers(0, 2**63, size=n, dtype=np.uint64)
    return {"poisson_ts": poisson_ts, "random64": rand}


# "linked" is framing-level (needs a companion column) — covered by its own
# property test and the Spark end-to-end test, not the single-column protocol
ALL_CODECS = [c for c in INT_CODEC_CLASSES if c != "linked"]


@pytest.mark.parametrize("codec_name", ALL_CODECS)
@pytest.mark.parametrize("fixture", ["linear", "stepwise", "runs", "lowcard", "random", "const"])
def test_u32_roundtrip(codec_name, fixture):
    data = fixtures_u32()[fixture]
    for n in [len(data), len(data) - 1, len(data) - 7, 1, 2]:
        vals = data[:n]
        codec = int_codec(codec_name, np.uint32)
        payload = codec.encode(vals)
        np.testing.assert_array_equal(codec.decode(payload, n), vals)


@pytest.mark.parametrize("codec_name", ALL_CODECS)
@pytest.mark.parametrize("fixture", ["poisson_ts", "random64"])
def test_u64_roundtrip(codec_name, fixture):
    vals = fixtures_u64()[fixture]
    codec = int_codec(codec_name, np.uint64)
    payload = codec.encode(vals)
    np.testing.assert_array_equal(codec.decode(payload, len(vals)), vals)


@pytest.mark.parametrize("codec_name", ALL_CODECS)
def test_gather_sum_filter(codec_name):
    vals = fixtures_u32()["stepwise"]
    n = len(vals)
    codec = int_codec(codec_name, np.uint32)
    payload = codec.encode(vals)
    pos = RNG.integers(0, n, size=333)
    np.testing.assert_array_equal(codec.gather(payload, pos, n), vals[pos])
    assert codec.sum(payload, n) == int(vals.sum(dtype=object))
    v = int(np.quantile(vals, 0.9))
    np.testing.assert_array_equal(
        np.sort(codec.filter_gt(payload, n, v)), np.flatnonzero(vals > v)
    )


def test_leco_beats_for_on_linear():
    """Codec-selection sanity (shares pattern of ``best_compress.cpp:96-105``)."""
    f = fixtures_u32()
    leco = int_codec("leco", np.uint32)
    for_ = int_codec("for", np.uint32)
    rle = int_codec("rle", np.uint32)
    raw = int_codec("raw", np.uint32)
    assert len(leco.encode(f["linear"])) < len(for_.encode(f["linear"]))
    # U[-16,16] noise → 6-bit sign-magnitude residuals ≈ 19 % of 32-bit raw
    assert len(leco.encode(f["linear"])) < 0.25 * len(raw.encode(f["linear"]))
    assert len(rle.encode(f["runs"])) < len(leco.encode(f["runs"]))
    # random data escapes near-raw: no codec should blow up size
    assert len(leco.encode(f["random"])) <= 1.05 * len(raw.encode(f["random"]))


def test_leco_zero_bit_pure_model():
    vals = np.arange(1000, dtype=np.uint32) * 7 + 13  # exact line
    codec = int_codec("leco", np.uint32)
    payload = codec.encode(vals)
    assert len(payload) == 17  # max_bit + two thetas, no residuals
    np.testing.assert_array_equal(codec.decode(payload, 1000), vals)


STRING_CODECS = [StrRawCodec, FsstStringCodec, DictStringCodec, WordDictCodec]


@pytest.mark.parametrize("cls", STRING_CODECS)
def test_string_roundtrip(cls):
    words = ["the", "assistant", "tool_call", "α∂ß", "answer", ""]
    strs = [
        (" ".join(words[i % len(words)] for _ in range(i % 17))).encode("utf-8")
        for i in range(800)
    ]
    codec = cls()
    payload = codec.encode(strs)
    assert codec.decode(payload, len(strs)).to_pylist() == strs


def test_fsst_compresses_text():
    text = ("the quick brown assistant called the tool " * 500).encode()
    strs = [text[i : i + 80] for i in range(0, len(text) - 80, 80)]
    fsst = FsstStringCodec()
    raw = StrRawCodec()
    assert len(fsst.encode(strs)) < 0.6 * len(raw.encode(strs))


def test_int_column_framing_nulls_and_negatives():
    ser = pd.Series([5, None, -17, 1 << 40, None, 0], dtype="Int64")
    name, payload = encode_int_column(ser, "int64")
    out = decode_int_column(payload, len(ser), "int64")
    assert list(out) == [5, pd.NA, -17, 1 << 40, pd.NA, 0]


def test_timestamp_column_framing():
    ser = pd.Series(pd.to_datetime([1_700_000_000_000_000 + i * 20_000_000 for i in range(100)], unit="us"))
    name, payload = encode_int_column(ser, "timestamp_us")
    out = decode_int_column(payload, len(ser), "timestamp_us")
    assert (out.to_numpy() == ser.to_numpy()).all()


def test_string_column_framing_nulls():
    ser = pd.Series(["run", None, "run", "walk", None, "run"], dtype=object)
    name, payload = encode_string_column(ser)
    out = decode_string_column(payload, len(ser))
    assert list(out) == ["run", None, "run", "walk", None, "run"]


# ---------------------------------------------------------------------------
# poly2 (operator #16) and learned selection (operator #37)
# ---------------------------------------------------------------------------


def test_poly2_wins_on_quadratic():
    from learn_to_compress_spark.codecs.intcodecs import LecoFixCodec
    from learn_to_compress_spark.codecs.poly import Poly2Codec

    n = 4096
    x = np.arange(n, dtype=np.float64)
    y = (0.002 * x * x + 5 * x + 100 + RNG.integers(-3, 4, n)).astype(np.uint64)
    p2 = Poly2Codec(np.uint64)
    payload = p2.encode(y)
    assert np.array_equal(p2.decode(payload, n), y)
    assert len(payload) < len(LecoFixCodec(np.uint64).encode(y))
    # analytic size matches the encoded size
    assert p2.size_bytes(y) == len(payload)


def test_poly2_framed_selection():
    n = 4096
    x = np.arange(n, dtype=np.float64)
    vals = (0.001 * x * x + 3 * x).astype(np.int64)
    from learn_to_compress_spark.select import encode_int_values

    name, payload = encode_int_values(vals, None, "int64")
    assert name == "poly2"
    assert np.array_equal(decode_int_column(payload, n, "int64").to_numpy(), vals)


def test_learned_selector_accuracy_and_regret():
    """CART picks near-optimal codecs on held-out reference-shaped blocks
    (``experiments/predict_compress_accuracy.cpp:86-117`` analogue)."""
    from learn_to_compress_spark.learned import (
        _LABELS,
        CartTree,
        training_blocks,
    )
    from learn_to_compress_spark.select import int_codec_sizes

    X, y, blocks = training_blocks(n_per_kind=40)
    tree = CartTree().fit(X[::2], y[::2])
    pred = np.array([tree.predict_one(x) for x in X[1::2]])
    acc = float((pred == y[1::2]).mean())
    assert acc >= 0.75, acc
    regret = []
    for b, p in zip(blocks[1::2], pred):
        sizes = int_codec_sizes(b.view(np.uint64), np.uint64)
        regret.append(sizes[_LABELS[p]] / min(sizes.values()))
    assert float(np.mean(regret)) < 1.15


def test_learned_framing_roundtrip():
    from learn_to_compress_spark.select import encode_int_values

    n = 5000
    vals = (7 * np.arange(n) + RNG.integers(-5, 6, n)).astype(np.int64)
    name, payload = encode_int_values(vals, None, "int64", selection="learned")
    assert name in ("leco", "delta", "for")
    assert np.array_equal(decode_int_column(payload, n, "int64").to_numpy(), vals)


# ---------------------------------------------------------------------------
# LeCo-string, uint64 rung (operator #24)
# ---------------------------------------------------------------------------


def test_leco_string_roundtrip_and_wins_on_sorted_ids():
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import (
        DictStringCodec,
        LecoStringCodec,
    )

    strs = [f"id-{i:08d}".encode() for i in range(0, 40000, 7)]
    arr = pa.array(strs, pa.large_binary())
    assert LecoStringCodec.eligible(arr)
    c = LecoStringCodec()
    payload = c.encode(arr)
    assert c.decode(payload, len(strs)).cast(pa.large_binary()).to_pylist() == strs
    assert len(payload) < len(DictStringCodec().encode(arr))


def test_leco_string_ragged_and_empty_rows():
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import LecoStringCodec

    strs = [b"conv-1", b"conv-22", b"conv-333", b"conv-4444", b"conv-"]
    arr = pa.array(strs, pa.large_binary())
    c = LecoStringCodec()
    assert c.decode(c.encode(arr), len(strs)).cast(pa.large_binary()).to_pylist() == strs


def test_leco_string_ineligible_for_long_blocks():
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import LecoStringCodec

    arr = pa.array([b"x" * 40, b"y" * 30], pa.large_binary())
    assert not LecoStringCodec.eligible(arr)


def test_leco_string_selected_via_framing():
    from learn_to_compress_spark.select import encode_string_column

    ser = pd.Series([f"k{i:07d}" for i in range(5000)])
    name, payload = encode_string_column(ser)
    assert name == "leco_str"
    out = decode_string_column(payload, len(ser))
    assert list(out) == list(ser)


def test_delta_var_beats_fixed_delta_on_jumpy_data():
    """Operator #13 (``delta_cost``): segment boundaries isolate wide jumps
    so smooth regions keep narrow delta widths."""
    from learn_to_compress_spark.codecs.delta_var import DeltaVarCodec
    from learn_to_compress_spark.codecs.intcodecs import DeltaCodec

    n = 20000
    base = np.cumsum(RNG.integers(-3, 4, n))
    jumps = np.zeros(n, dtype=np.int64)
    jumps[RNG.integers(0, n, 15)] = 10**6
    y = (np.cumsum(jumps) + base + 10**7).astype(np.uint64)
    dv = DeltaVarCodec(np.uint64)
    payload = dv.encode(y)
    assert np.array_equal(dv.decode(payload, n), y)
    assert len(payload) < 0.3 * len(DeltaCodec(np.uint64).encode(y))


def test_double_decimal_scale_roundtrip():
    """Decimal-valued doubles take the scaled-int path (float-payload LeCo
    analogue, ``piecewise_cost_float.h``); decode is bitwise exact."""
    from learn_to_compress_spark.select import decode_double_column, encode_double_column

    prices = pd.Series((RNG.integers(90000, 200000, 6000) / 100.0))
    name, payload = encode_double_column(prices)
    assert name.startswith("dscale2:")
    assert len(payload) < 0.5 * 8 * len(prices)
    out = decode_double_column(payload, len(prices))
    assert np.array_equal(out.to_numpy().view(np.uint64), prices.to_numpy().view(np.uint64))


def test_double_decimal_scale_edge_fallback():
    """-0.0 / inf / irrational values must fall back to the bit-pattern path
    (the decimal check is bitwise, not tolerance-based)."""
    from learn_to_compress_spark.select import decode_double_column, encode_double_column

    edge = pd.Series([0.0, -0.0, 1.5, float("inf"), None, 2.25, 1 / 3])
    name, payload = encode_double_column(edge)
    assert not name.startswith("dscale")
    out = decode_double_column(payload, len(edge))
    got = out.to_numpy()
    assert got[1] == 0.0 and np.signbit(got[1])
    assert np.isinf(got[3]) and np.isnan(got[4])


# ---------------------------------------------------------------------------
# LeCo_outlier (operator #17: piecewise_ransac / piecewise_outlier_detect)
# ---------------------------------------------------------------------------


def _spiky_ramp(n=8192, n_spikes=12, dtype=np.uint64):
    """Sensor-timestamp shape: ~linear ramp with rare isolated corrupted
    readings (poisson random-die sensors, ``scripts/poisson_randomdie.py``
    + glitches) — the exact shape where one spike blows LeCo_fix's fixed
    residual width for the whole chunk."""
    rng = np.random.default_rng(7)
    vals = (10**12 + 2_000_000 * np.arange(n) + rng.integers(-500, 500, n)).astype(
        np.int64
    )
    pos = rng.choice(n, n_spikes, replace=False)
    vals[pos] += rng.integers(10**9, 10**10, n_spikes) * rng.choice([-1, 1], n_spikes)
    return vals.astype(dtype)


def test_leco_outlier_roundtrip_gather_sum():
    from learn_to_compress_spark.codecs.outlier import LecoOutlierCodec

    vals = _spiky_ramp()
    c = LecoOutlierCodec(np.uint64)
    payload = c.encode(vals)
    dec = c.decode(payload, vals.size)
    assert np.array_equal(dec, vals)
    pos = np.array([0, 1, 17, 4095, 8191, 5000])
    assert np.array_equal(c.gather(payload, pos, vals.size), vals[pos])
    assert c.sum(payload, vals.size) == int(vals.astype(object).sum())


def test_leco_outlier_beats_fixed_and_var_on_spikes():
    from learn_to_compress_spark.codecs.outlier import LecoOutlierCodec

    vals = _spiky_ramp()
    out_sz = len(LecoOutlierCodec(np.uint64).encode(vals))
    leco_sz = len(int_codec("leco", np.uint64).encode(vals))
    var_sz = len(int_codec("leco_var", np.uint64).encode(vals))
    assert out_sz < leco_sz / 2  # spikes blow the fixed width
    assert out_sz <= var_sz  # exception list beats extra segments here
    # analytic size is a faithful (close) predictor for selection
    est = LecoOutlierCodec(np.uint64).size_bytes(vals)
    assert abs(est - out_sz) <= 0.05 * out_sz


def test_leco_outlier_selected_in_framing_race():
    from learn_to_compress_spark.select import encode_int_values

    vals = _spiky_ramp().view(np.int64)
    name, payload = encode_int_values(vals, None, "int64")
    assert name == "leco_outlier", name
    got = decode_int_column(payload, vals.size, "int64").to_numpy()
    assert np.array_equal(got, vals)


def test_leco_outlier_escapes_on_random():
    from learn_to_compress_spark.codecs.outlier import LecoOutlierCodec

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**63, 4096).astype(np.uint64)
    c = LecoOutlierCodec(np.uint64)
    payload = c.encode(vals)
    assert len(payload) <= 1 + vals.nbytes
    assert np.array_equal(c.decode(payload, vals.size), vals)


# ---------------------------------------------------------------------------
# per-period mod-band inversion (operator #29 fast path)
# ---------------------------------------------------------------------------


def test_mod_band_inversion_decodes_fraction_and_matches():
    from learn_to_compress_spark import select as sel
    from learn_to_compress_spark.select import column_filter_mod_band, encode_int_values

    # smooth ramp -> leco with narrow residuals; base >> band width so the
    # inversion can skip most slots
    n = 20000
    rng = np.random.default_rng(11)
    vals = (1000 + 37 * np.arange(n) + rng.integers(-2, 3, n)).astype(np.int64)
    name, payload = encode_int_values(vals, None, "int64")
    assert name in ("leco", "leco_var", "delta", "for")
    base, lo, hi = 100000, 1000, 3000
    sel.MOD_BAND_STATS["slots_total"] = 0
    sel.MOD_BAND_STATS["slots_decoded"] = 0
    pos = column_filter_mod_band(payload, n, "int64", base, lo, hi)
    rem = vals % base
    want = np.flatnonzero((rem > lo) & (rem < hi))
    assert np.array_equal(pos, want)
    if name == "leco":  # the inversion fast path applies
        assert sel.MOD_BAND_STATS["slots_decoded"] < 0.5 * sel.MOD_BAND_STATS["slots_total"]


def test_mod_band_nulls_never_match():
    from learn_to_compress_spark.select import column_filter_mod_band, encode_int_column

    ser = pd.Series([10, None, 24, 38, None, 52, 66], dtype="Int64")
    _name, payload = encode_int_column(ser, "int64")
    pos = column_filter_mod_band(payload, len(ser), "int64", 14, 5, 13)
    vals = ser.to_numpy(dtype="float64", na_value=np.nan)
    want = [i for i, v in enumerate(vals) if not np.isnan(v) and 5 < int(v) % 14 < 13]
    assert list(pos) == want


# ---------------------------------------------------------------------------
# LeCo-string wide rungs (operator #24: uint128/uint256 ladder,
# experiments/leco_string_subset.cpp:108-133)
# ---------------------------------------------------------------------------


def _wide_ids(n=4096):
    import hashlib

    return sorted(
        f"item:{i:08d}:{hashlib.md5(str(i).encode()).hexdigest()[:24]}"
        for i in range(n)
    )


def test_leco_str_wide_roundtrip_and_beats_fsst():
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import FsstStringCodec, LecoStringCodec
    from learn_to_compress_spark.codecs.strings_wide import LecoStringWideCodec

    ids = _wide_ids()
    arr = pa.array([s.encode() for s in ids], type=pa.large_binary())
    assert not LecoStringCodec.eligible(arr)  # past the uint64 rung
    assert LecoStringWideCodec.eligible(arr)
    c = LecoStringWideCodec()
    payload = c.encode(arr)
    assert c.decode(payload, len(ids)).cast(pa.large_string()).to_pylist() == ids
    assert len(payload) < len(FsstStringCodec().encode(arr))


def test_leco_str_wide_selected_via_framing():
    import pyarrow as pa

    ids = _wide_ids()
    arr = pa.array(ids, type=pa.large_string())
    name, payload = encode_string_column(pd.Series(ids))
    assert name == "leco_str_wide", name
    out = decode_string_column(payload, len(ids))
    assert list(out) == ids


def test_leco_str_wide_ragged_lengths():
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings_wide import LecoStringWideCodec

    rng = np.random.default_rng(13)
    rows = []
    for i in range(2000):
        tail = "".join(rng.choice(list("0123456789abcdef"), size=rng.integers(12, 30)))
        rows.append(f"k{i:07d}-{tail}")
    rows.sort()
    arr = pa.array([s.encode() for s in rows], type=pa.large_binary())
    if LecoStringWideCodec.eligible(arr):
        c = LecoStringWideCodec()
        got = c.decode(c.encode(arr), len(rows)).cast(pa.large_string()).to_pylist()
        assert got == rows


# ---------------------------------------------------------------------------
# FSST per-string random access (operator #22, fsst_string.h:67-77)
# ---------------------------------------------------------------------------


def test_fsst_gather_matches_decode():
    import pyarrow as pa

    text = ("the quick brown assistant called the tool with args " * 300).encode()
    strs = [text[i : i + 60 + (i % 40)] for i in range(0, len(text) - 100, 97)]
    fsst = FsstStringCodec()
    payload = fsst.encode(strs)
    full = fsst.decode(payload, len(strs)).to_pylist()
    assert full == strs
    pos = np.array([0, 5, len(strs) - 1, 17, 17, 3])
    got = fsst.gather(payload, pos, len(strs)).to_pylist()
    assert got == [strs[p] for p in pos]


def test_string_framing_gather_sparse_and_dense():
    from learn_to_compress_spark.select import (
        STRING_CODEC_IDS,
        column_gather_string_arrow,
    )

    text = ("conversation about columnar compression " * 200).encode()
    strs = [text[i : i + 50] for i in range(0, 4000, 40)]
    # force the fsst codec through the framing layer by encoding directly
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import FsstStringCodec as FS

    payload = bytes([0, STRING_CODEC_IDS["fsst"]]) + FS().encode(strs)
    sparse = np.array([3, 50, 99])
    got = column_gather_string_arrow(payload, len(strs), sparse).to_pylist()
    assert got == [strs[p].decode() for p in sparse]
    dense = np.arange(len(strs))
    got = column_gather_string_arrow(payload, len(strs), dense).to_pylist()
    assert got == [s.decode() for s in strs]


def test_leco_var_dp_windowed_optimal_certifies_heuristic():
    """DP certification (``headers/piecewise_cost_dp.h:219-299``): on
    short-segment data the windowed-optimal DP must (a) roundtrip, (b) never
    exceed the split+merge heuristic's size, and (c) certify the heuristic's
    regret vs the byte optimum stays small."""
    rng = np.random.default_rng(7)
    # stepwise slopes with breaks every ~40 slots — segments << window=256
    n = 2048
    breaks = np.sort(rng.choice(np.arange(8, n - 8), size=50, replace=False))
    vals = np.zeros(n, dtype=np.int64)
    cur, slope = 1000, 3
    prev = 0
    for b in list(breaks) + [n]:
        ln = b - prev
        vals[prev:b] = cur + slope * np.arange(ln)
        cur = int(vals[b - 1]) + int(rng.integers(-500, 500))
        slope = int(rng.integers(-5, 6))
        prev = b
    vals = (vals - vals.min()).astype(np.uint64)
    dp = int_codec("leco_var_dp", np.uint64)
    heur = int_codec("leco_var", np.uint64)
    p_dp, p_h = dp.encode(vals), heur.encode(vals)
    np.testing.assert_array_equal(dp.decode(p_dp, n), vals)
    assert len(p_dp) <= len(p_h)
    # heuristic regret vs windowed optimum bounded (certification claim)
    assert len(p_h) <= 1.25 * len(p_dp)


def test_double_monotone_bitpattern_path():
    """Non-decimal doubles race the full int-codec set over the total-order-
    preserving float64→uint64 bijection (float-payload LeCo analogue,
    ``piecewise_cost_float.h``); smooth series beat raw bit patterns and
    decode is bitwise exact incl. ±0.0/±inf."""
    from learn_to_compress_spark.select import decode_double_column, encode_double_column

    rng = np.random.default_rng(3)
    smooth = pd.Series(np.cumsum(rng.normal(0, 0.01, 8000)) + 100.0)
    name, payload = encode_double_column(smooth)
    assert name.startswith("dmono:")
    assert len(payload) < 0.75 * 8 * len(smooth)
    out = decode_double_column(payload, len(smooth))
    assert np.array_equal(
        out.to_numpy().view(np.uint64), smooth.to_numpy().view(np.uint64)
    )
    specials = pd.Series([0.0, -0.0, np.inf, -np.inf, 1e-308, -1e308, np.nan, 3.14])
    _, p2 = encode_double_column(specials)
    got = decode_double_column(p2, len(specials)).to_numpy()
    a = specials.to_numpy()
    assert np.array_equal(np.isnan(a), np.isnan(got))
    assert np.array_equal(
        a[~np.isnan(a)].view(np.uint64), got[~np.isnan(got)].view(np.uint64)
    )


def test_dict_string_positions_eq_code_domain():
    """DictStringCodec.positions_eq answers equality in the code domain
    (``raw_test_dictionary.cpp:107-112`` predicate analogue)."""
    from learn_to_compress_spark.codecs.strings import DictStringCodec
    from learn_to_compress_spark.select import column_positions_eq_string, encode_string_column

    rows = (["assistant", "user", "tool"] * 300)[:800]
    codec = DictStringCodec()
    payload = codec.encode(rows)
    pos = codec.positions_eq(payload, len(rows), b"user")
    np.testing.assert_array_equal(pos, [i for i, r in enumerate(rows) if r == "user"])
    assert codec.positions_eq(payload, len(rows), b"absent").size == 0
    # framing level: nulls never match, non-dict codecs fall back to decode+equal
    ser = pd.Series(rows + [None, "user"], dtype="object")
    name, framed = encode_string_column(ser)
    got = column_positions_eq_string(framed, len(ser), b"user")
    np.testing.assert_array_equal(got, [i for i, r in enumerate(ser) if r == "user"])


def test_leco_filter_ops_top_bit_set_blocks():
    """Width-64 blocks whose stored values have the top bit set (signed-view
    negatives): filter_gt maps the unsigned threshold into the signed model
    domain and mod-band carries the float64 cancellation slack — both exact
    (regression for the inversion bug the property fuzz found)."""
    vals = (np.arange(329, dtype=np.int64) * 14 - 45651).view(np.uint64)
    codec = int_codec("leco", np.uint64)
    payload = codec.encode(vals)
    for v in [0, 2**63, int(vals.min()), int(vals.max()), 2**64 - 1]:
        np.testing.assert_array_equal(
            np.sort(codec.filter_gt(payload, len(vals), v)),
            np.flatnonzero(vals > v),
        )
    res = codec.filter_mod_band(payload, len(vals), 97, 10, 60)
    signed = vals.view(np.int64)
    want = np.flatnonzero(((signed % 97) > 10) & ((signed % 97) < 60))
    if res is not None:
        np.testing.assert_array_equal(np.sort(res[0]), want)


@pytest.mark.parametrize("codec_name", ["leco_var", "leco_var_dp"])
def test_leco_var_recenter_overflow_regression(codec_name):
    """The floor-align recenter shift can push float predictions past 2^63;
    .astype(int64) saturates, the int64 subtraction wraps, and
    |INT64_MIN| stays negative — the wrapped max-error looked tiny, so a
    too-small bit width won and pack truncated 2^63 magnitudes (hypothesis
    counterexample from round 2's VERDICT). Pins the falsifying block plus
    neighboring boundary shapes for both the heuristic and the DP codec."""
    blocks = [
        np.array([0, 2**63 - 512, 0], dtype=np.uint64),
        np.array([0, 2**63 - 512, 0, 2**63 - 512], dtype=np.uint64),
        np.array([2**64 - 1, 0, 2**64 - 1], dtype=np.uint64),
        np.array([2**63, 2**63 - 1, 2**63], dtype=np.uint64),
        np.repeat(np.array([0, 2**63 - 512], dtype=np.uint64), 40),
    ]
    codec = int_codec(codec_name, np.uint64)
    for vals in blocks:
        payload = codec.encode(vals)
        np.testing.assert_array_equal(codec.decode(payload, vals.size), vals)
        pos = np.arange(vals.size, dtype=np.int64)[::2]
        np.testing.assert_array_equal(codec.gather(payload, pos, vals.size), vals[pos])
        assert codec.sum(payload, vals.size) == int(vals.sum(dtype=object))


# Inputs whose fitted-line/quadratic predictions leave int64: the unguarded
# float->int64 cast saturates ARCHITECTURE-DEPENDENTLY (x86 cvttsd2si ->
# INT64_MIN both directions, aarch64 fcvtzs -> nearest bound), so a store
# written on x86 would decode differently on ARM. The contract (matching the
# truncation convention of headers/piecewise_fix_integer_template.h:54) is:
# reject uncastable recenter candidates, and raw-escape when none survives.
_OVERFLOW_BLOCKS = {
    "spike": np.array([0, 2**63 - 512, 0], dtype=np.uint64),
    "alt": np.repeat(np.array([0, 2**63 - 512], dtype=np.uint64), 40),
    "steep": np.arange(300, dtype=np.uint64) * np.uint64((2**64 - 1) // 300),
    "topband": np.array([2**64 - 1, 0, 2**64 - 1, 2**63, 2**63 - 1], dtype=np.uint64),
}

# sha256[:16] of the exact serialized payloads — byte-level golden vectors so
# any drift in the escape/guard behavior (not just roundtrip self-consistency)
# fails loudly. leco/poly2/leco_outlier raw-escape every block (identical
# payload: max_bit=64 | raw values); the segmented codecs keep guarded models.
_OVERFLOW_GOLDEN = {
    ("leco", "spike"): "2a9fe9ead92584f6",
    ("leco", "alt"): "8a98c3511e61f9f1",
    ("leco", "steep"): "4fdddb9b28fdf0d9",
    ("leco", "topband"): "1d040f794c3283d8",
    ("poly2", "spike"): "2a9fe9ead92584f6",
    ("poly2", "alt"): "8a98c3511e61f9f1",
    ("poly2", "steep"): "4fdddb9b28fdf0d9",
    ("poly2", "topband"): "1d040f794c3283d8",
    ("leco_outlier", "spike"): "2a9fe9ead92584f6",
    ("leco_outlier", "alt"): "8a98c3511e61f9f1",
    ("leco_outlier", "steep"): "4fdddb9b28fdf0d9",
    ("leco_outlier", "topband"): "1d040f794c3283d8",
    ("leco_var", "spike"): "fe4f6fa7ecb17410",
    ("leco_var", "alt"): "94b51e75eeb418b2",
    ("leco_var", "steep"): "3c9957816138438b",
    ("leco_var", "topband"): "ae014dc2325cd494",
    ("leco_var_dp", "spike"): "fe4f6fa7ecb17410",
    ("leco_var_dp", "alt"): "94b51e75eeb418b2",
    ("leco_var_dp", "steep"): "7915b40d518e8fc7",
    ("leco_var_dp", "topband"): "d91db7dfbeeec276",
    ("spline", "spike"): "2a9fe9ead92584f6",
    ("spline", "alt"): "8a98c3511e61f9f1",
    ("spline", "steep"): "4fdddb9b28fdf0d9",
    ("spline", "topband"): "1d040f794c3283d8",
}


@pytest.mark.parametrize(
    "codec_name", ["leco", "poly2", "leco_outlier", "leco_var", "leco_var_dp", "spline"]
)
def test_prediction_cast_overflow_golden_bytes(codec_name):
    """Stored BYTES (not just roundtrip) are pinned for overflow inputs —
    encode never performs a saturating cast (pytest.ini errors the warning),
    so both the payload and its decode are architecture-independent."""
    import hashlib

    codec = int_codec(codec_name, np.uint64)
    for bname, vals in _OVERFLOW_BLOCKS.items():
        payload = codec.encode(vals)
        got = hashlib.sha256(payload).hexdigest()[:16]
        assert got == _OVERFLOW_GOLDEN[(codec_name, bname)], (codec_name, bname, got)
        np.testing.assert_array_equal(codec.decode(payload, vals.size), vals)
    # the fixed-width families raw-escape all four blocks: max_bit==width
    if codec_name in ("leco", "poly2", "leco_outlier", "spline"):
        for vals in _OVERFLOW_BLOCKS.values():
            assert codec.encode(vals)[0] == 64


def test_forced_selection_seam():
    """selection="force:<codec>" pins the framed codec (the per-codec
    verification seam, VERDICT r3 item 3): the pinned name must serialize
    and roundtrip for every int codec family; string forces pin the string
    codec, with LeCo rungs falling back to the race when ineligible."""
    import pyarrow as pa

    from learn_to_compress_spark.select import (
        decode_int_column,
        decode_string_column,
        encode_int_values,
        encode_string_column_arrow,
    )

    vals = (RNG.normal(1e6, 1000, 3000)).astype(np.int64)
    vals.sort()
    for codec in ["leco_var", "leco_var_dp", "delta_var", "poly2", "leco_outlier",
                  "for", "delta", "leco", "rle", "dict", "raw"]:
        name, payload = encode_int_values(vals.copy(), None, "int64", f"force:{codec}")
        assert name == codec
        out = decode_int_column(payload, vals.size, "int64")
        np.testing.assert_array_equal(out.to_numpy(), vals)
    with pytest.raises(ValueError):
        encode_int_values(vals, None, "int64", "force:nope")

    rows = pa.array([b"id-%06d" % i for i in range(500)], type=pa.large_binary())
    for codec in ["word_dict", "fsst", "str_dict", "str_raw", "leco_str"]:
        name, payload = encode_string_column_arrow(rows, f"force:{codec}")
        assert name == codec
        out = decode_string_column(payload, len(rows))
        assert list(out) == [r.decode() for r in rows.to_pylist()] or list(out) == [
            r.as_py().decode() for r in rows
        ]
    # ineligible LeCo rung falls back to the race instead of corrupting:
    # 200-char strings exceed every rung's width
    blob = pa.array(["x" * 200, "y"], type=pa.large_string()).cast(pa.large_binary())
    name, payload = encode_string_column_arrow(blob, "force:leco_str")
    assert name != "leco_str"
    out = decode_string_column(payload, 2)
    assert list(out) == ["x" * 200, "y"]


def _gt_want(rows, needle, strict):
    return np.array(
        [i for i, r in enumerate(rows) if (r > needle if strict else r >= needle)],
        dtype=np.int64,
    )


def test_string_positions_gt_codecs():
    """Range filter on compressed string chunks (operator: sorted-string
    binary search, leco_string_subset.cpp:186-193 + binary_search.cpp:63-122):
    LeCo rungs invert the model in the big-int domain, dict compares unique
    values only — exact vs decode-and-compare for in-domain, out-of-alphabet,
    longer-than-padded, prefix-of-prefix and extreme needles."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import (
        DictStringCodec,
        LecoStringCodec,
    )
    from learn_to_compress_spark.codecs.strings_wide import LecoStringWideCodec

    rng = np.random.default_rng(11)
    cases = []
    rows = [b"id-%05d" % i for i in range(0, 3000, 3)]
    cases.append(
        (LecoStringCodec(), rows,
         [b"id-00100", b"id-001", b"id-00100x", b"id-", b"id", b"zz", b"aa",
          b"id-99999", rows[0], rows[-1], b"", b"id-0010\xff"])
    )
    wrows = sorted({b"key-%020x" % (int(rng.integers(0, 2**62)) * 200003) for _ in range(900)})
    cases.append(
        (LecoStringWideCodec(), wrows,
         [wrows[400], wrows[0], wrows[-1], wrows[200][:-3], wrows[200] + b"z",
          b"key-", b"kez", b"", b"key-000000000000000000zz", b"\xff"])
    )
    drows = [b"click", b"view", b"purchase", b"click", b"scroll"] * 40
    cases.append((DictStringCodec(), drows, [b"click", b"a", b"z", b"pur", b"scrollx", b""]))
    for codec, rows, needles in cases:
        payload = codec.encode(pa.array(rows, type=pa.large_binary()))
        for needle in needles:
            for strict in (True, False):
                got = np.sort(codec.positions_gt(payload, len(rows), needle, strict))
                np.testing.assert_array_equal(
                    got, _gt_want(rows, needle, strict), err_msg=f"{codec.name} {needle} {strict}"
                )


def test_string_filter_framing_gt_and_prefix():
    """Framing-level range/prefix filter: nulls never match, LeCo/dict chunks
    decode ZERO row strings (STR_FILTER_STATS), fallback codecs count."""
    from learn_to_compress_spark.select import (
        STR_FILTER_STATS,
        column_positions_gt_string,
        column_positions_prefix_string,
        encode_string_column,
    )

    rows = ["id-%05d" % i for i in range(500)]
    ser = pd.Series(rows[:250] + [None, None] + rows[250:], dtype="object")
    name, payload = encode_string_column(ser)
    assert name in ("leco_str", "leco_str_wide"), name
    STR_FILTER_STATS.update(rows_total=0, rows_decoded=0)
    pos = column_positions_gt_string(payload, len(ser), b"id-00250")
    want = [i for i, r in enumerate(ser) if r is not None and r > "id-00250"]
    np.testing.assert_array_equal(np.sort(pos), want)
    assert STR_FILTER_STATS["rows_total"] == 500
    assert STR_FILTER_STATS["rows_decoded"] == 0  # model inversion: no strings

    pos = column_positions_prefix_string(payload, len(ser), b"id-001")
    want = [i for i, r in enumerate(ser) if r is not None and r.startswith("id-001")]
    np.testing.assert_array_equal(np.sort(pos), want)
    assert STR_FILTER_STATS["rows_decoded"] == 0

    # fallback codec (word-structured text -> word_dict/fsst): still exact,
    # counted as decoded
    txt = pd.Series([f"w{i % 7} common tail" for i in range(300)], dtype="object")
    _, fp = encode_string_column(txt)
    STR_FILTER_STATS.update(rows_total=0, rows_decoded=0)
    pos = column_positions_gt_string(fp, len(txt), b"w3")
    want = [i for i, r in enumerate(txt) if r > "w3"]
    np.testing.assert_array_equal(np.sort(pos), want)
    assert STR_FILTER_STATS["rows_total"] == 300


def test_prefix_upper_bound():
    from learn_to_compress_spark.select import prefix_upper_bound

    assert prefix_upper_bound(b"abc") == b"abd"
    assert prefix_upper_bound(b"ab\xff") == b"ac"
    assert prefix_upper_bound(b"\xff\xff") is None
    assert prefix_upper_bound(b"a\xff\xff") == b"b"


def test_for_rle_mod_band_pruning():
    """Model-less mod-band pruning (FOR_integer_template.h:166-215): FOR
    blocks decide header-only when the band misses or covers their exact
    (min,max) range; RLE tests run keys only. The framing counter proves
    <100% of slots decoded on prunable blocks."""
    from learn_to_compress_spark.select import (
        MOD_BAND_STATS,
        column_filter_mod_band,
        encode_int_values,
    )

    forc = int_codec("for", np.uint64)
    # one period, range [1000, 1040], base 100: band (50, 90) misses -> empty
    vals = np.arange(1000, 1041, dtype=np.uint64)
    p = forc.encode(vals)
    res = forc.filter_mod_band(p, vals.size, 100, 50, 90)
    assert res is not None and res[0].size == 0 and res[1] == 0
    # band (-1, 100) covers everything
    res = forc.filter_mod_band(p, vals.size, 100, -1, 100)
    np.testing.assert_array_equal(res[0], np.arange(vals.size))
    assert res[1] == 0
    # band (5, 30) straddles the range [0,40] -> decode (None = caller decodes)
    assert forc.filter_mod_band(p, vals.size, 100, 5, 30) is None
    # two periods, both windows inside their bands -> all
    vals2 = np.arange(1095, 1106, dtype=np.uint64)  # [95..105]: windows [95,99],[0,5]
    p2 = forc.encode(vals2)
    res = forc.filter_mod_band(p2, vals2.size, 100, 90, 100)
    assert res is None or res[0].size < vals2.size  # window2 misses (90,100)
    res = forc.filter_mod_band(p2, vals2.size, 100, -1, 7)
    assert res is None  # window1 [95,99] misses, window2 [0,5] inside -> mixed

    rle = int_codec("rle", np.uint64)
    rvals = np.repeat(np.array([3, 17, 23, 42], dtype=np.uint64), 50)
    rp = rle.encode(rvals)
    pos, n_dec = rle.filter_mod_band(rp, rvals.size, 10, 2, 8)
    want = np.flatnonzero((rvals % 10 > 2) & (rvals % 10 < 8))
    np.testing.assert_array_equal(np.sort(pos), want)
    assert n_dec == 4  # run keys only

    # framing level: FOR-coded column, header-only skip counts 0 decoded
    MOD_BAND_STATS.update(slots_total=0, slots_decoded=0)
    import pandas as pd
    rng = np.random.default_rng(3)
    fvals = rng.integers(1000, 1041, size=300).astype(np.int64)  # unsorted: FOR wins
    name, payload = encode_int_values(fvals, None, "int64")
    assert name == "for", name
    got = column_filter_mod_band(payload, fvals.size, "int64", 100, 50, 90)
    assert got.size == 0
    assert MOD_BAND_STATS["slots_total"] == fvals.size
    assert MOD_BAND_STATS["slots_decoded"] == 0


def test_leco_sum_never_reconstructs_values(monkeypatch):
    """The compressed-domain SUM parity path (piecewise_fix_op.h:167-284)
    must sum model + residual streams separately — decode() raising proves
    the value array is never rebuilt, and the result still equals the exact
    value sum (incl. width-64 blocks whose predictions wrap mod 2^64)."""
    from learn_to_compress_spark.codecs.intcodecs import LecoFixCodec

    rng = np.random.default_rng(9)
    blocks = [
        (np.arange(10_000, dtype=np.uint64) * 37 + 5),
        (np.arange(4096, dtype=np.int64) * -13 + 99).view(np.uint64),  # wrapping preds
        rng.integers(0, 2**40, 5000).astype(np.uint64),
        np.array([2**63, 2**63 - 1, 2**63 + 5], dtype=np.uint64),
    ]
    codec = LecoFixCodec(np.uint64)
    expected = [
        (int(v.sum(dtype=object)), codec.encode(v), v.size) for v in blocks
    ]
    monkeypatch.setattr(
        LecoFixCodec, "decode", lambda *a, **k: (_ for _ in ()).throw(AssertionError("decode called"))
    )
    for want, payload, n in expected:
        assert codec.sum(payload, n) == want


def test_framing_filter_gt_out_of_domain_thresholds():
    """Thresholds outside the column's signed domain must clamp BEFORE the
    unsigned codec compare (fuzz counterexample: block [0] with v=-1 wrapped
    to 2^64-1 and returned empty instead of all)."""
    from learn_to_compress_spark.select import column_filter_gt, encode_int_values

    for vals, logical, width in [
        (np.array([0], dtype=np.int64), "int64", 64),
        (np.array([5, -3, 7], dtype=np.int64), "int64", 64),  # signflip path
        (np.array([0, 1, 2], dtype=np.int32), "int32", 32),
    ]:
        _, payload = encode_int_values(vals, None, logical)
        n = vals.size
        for v in [-1, -(1 << (width - 1)), -(1 << (width - 1)) - 5,
                  (1 << (width - 1)) - 1, 1 << (width - 1), 0]:
            got = np.sort(column_filter_gt(payload, n, logical, v))
            np.testing.assert_array_equal(
                got, np.flatnonzero(vals.astype(object) > v), err_msg=f"{vals} v={v}"
            )


def test_dict_and_worddict_sparse_gather():
    """Code-domain sparse gather (no n-row string materialization): equals
    decode-then-index for dict and word-dict chunks, incl repeated and
    unsorted positions and empty rows."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import DictStringCodec, WordDictCodec

    rows = [b"click", b"view", b"", b"purchase", b"click"] * 60
    wrows = [b"alpha beta", b"", b"gamma", b"alpha beta gamma delta", b"beta"] * 60
    for cls, data in [(DictStringCodec, rows), (WordDictCodec, wrows)]:
        codec = cls()
        payload = codec.encode(pa.array(data, type=pa.large_binary()))
        dec = [bytes(x) for x in codec.decode(payload, len(data)).to_pylist()]
        assert dec == data
        for pos in [np.array([0]), np.array([7, 3, 3, 299, 0]), np.arange(0, 300, 17)]:
            got = [bytes(x) for x in codec.gather(payload, pos, len(data)).to_pylist()]
            assert got == [data[i] for i in pos], cls.__name__


def test_leco_string_sparse_gather():
    """LeCo-string rungs: gather == decode-then-index, via the inner int
    codec's random access + selected-rows-only digit peel."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import LecoStringCodec
    from learn_to_compress_spark.codecs.strings_wide import LecoStringWideCodec

    rng = np.random.default_rng(21)
    rows = [b"id-%05d" % i for i in range(0, 2400, 3)]
    wrows = sorted({b"key-%020x" % (int(rng.integers(0, 2**62)) * 200003) for _ in range(700)})
    for codec, data in [(LecoStringCodec(), rows), (LecoStringWideCodec(), wrows)]:
        if not hasattr(codec, "gather"):
            continue
        payload = codec.encode(pa.array(data, type=pa.large_binary()))
        for pos in [np.array([0]), np.array([7, 3, 3, len(data) - 1, 0]), np.arange(0, len(data), 13)]:
            got = [bytes(x) for x in codec.gather(payload, pos, len(data)).to_pylist()]
            assert got == [data[i] for i in pos], type(codec).__name__


def test_leco_string_outlier_codec():
    """String exception list (piecewise_fix_string_outlier_detect.h): a few
    very long rows must not inflate the rung's padded width — the outlier
    codec strips them, models the inliers, and WINS the race on this shape."""
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings_outlier import LecoStringOutlierCodec
    from learn_to_compress_spark.select import (
        decode_string_column,
        encode_string_column_arrow,
    )

    rows = [b"id-%06d" % i for i in range(2000)]
    long = b"X" * 400
    for k in range(0, 2000, 211):  # ~10 outliers scattered through the block
        rows[k] = long + b"-%d" % k
    arr = pa.array(rows, type=pa.large_binary())

    codec = LecoStringOutlierCodec()
    assert codec.eligible(arr)
    payload = codec.encode(arr)
    out = codec.decode(payload, len(rows))
    assert out.to_pylist() == rows
    # CR win: the stripped block beats every non-rung codec on this shape
    from learn_to_compress_spark.codecs.strings import (
        DictStringCodec,
        FsstStringCodec,
        StrRawCodec,
    )

    others = {
        c.name: len(c.encode(arr))
        for c in (DictStringCodec(), FsstStringCodec(), StrRawCodec())
    }
    assert len(payload) < min(others.values()), (len(payload), others)

    # framing race picks it end-to-end (valid UTF-8 variant) and roundtrips
    urows = pa.array(
        [r.decode() for r in rows], type=pa.large_string()
    ).cast(pa.large_binary())
    name, framed = encode_string_column_arrow(urows)
    assert name == "leco_str_outlier"
    got = decode_string_column(framed, len(rows))
    assert list(got) == [r.decode() for r in rows]
    # forced seam: pin it explicitly; ineligible block falls back
    name2, framed2 = encode_string_column_arrow(urows, "force:leco_str_outlier")
    assert name2 == "leco_str_outlier"
    uniform = pa.array(["abc"] * 100, type=pa.large_string()).cast(pa.large_binary())
    name3, _ = encode_string_column_arrow(uniform, "force:leco_str_outlier")
    assert name3 != "leco_str_outlier"


def test_spline_wins_on_cubic():
    """Spline/cubic model (spline_fix.h + spline_lr.h): beats both the line
    and the quadratic on cubic-shaped data, roundtrips exactly, and joins
    the framed race."""
    from learn_to_compress_spark.codecs.intcodecs import LecoFixCodec
    from learn_to_compress_spark.codecs.poly import Poly2Codec
    from learn_to_compress_spark.codecs.spline import SplineCodec

    n = 4096
    x = np.arange(n, dtype=np.float64)
    y = (2e-6 * x**3 - 0.009 * x * x + 14 * x + 1000 + RNG.integers(-3, 4, n)).astype(
        np.uint64
    )
    assert (np.diff(y.view(np.int64)) > -100).all()  # monotone-ish, no wrap
    sp = SplineCodec(np.uint64)
    payload = sp.encode(y)
    np.testing.assert_array_equal(sp.decode(payload, n), y)
    assert len(payload) < len(Poly2Codec(np.uint64).encode(y))
    assert len(payload) < len(LecoFixCodec(np.uint64).encode(y))
    assert sp.size_bytes(y) == len(payload)
    pos = RNG.integers(0, n, 200)
    np.testing.assert_array_equal(sp.gather(payload, pos, n), y[pos])
    assert sp.sum(payload, n) == int(y.sum(dtype=object))
    # framed race picks it end-to-end on this shape
    from learn_to_compress_spark.select import decode_int_column, encode_int_values

    name, framed = encode_int_values(y.view(np.int64).copy(), None, "int64")
    assert name == "spline"
    out = decode_int_column(framed, n, "int64")
    np.testing.assert_array_equal(out.to_numpy().view(np.uint64), y)


def test_spline_recenter_reassociation_regression():
    """Pinned hypothesis counterexample: constant -11264 viewed as uint64
    (~2^64, float ulp 2048). The recenter must price candidates with the
    DECODE expression ((t0+shift) + t1·x + …), not (predf + shift) — float
    re-association at that magnitude shifted predictions by ulps and the
    stored residuals disagreed with decode by up to 4010."""
    from learn_to_compress_spark.codecs.spline import SplineCodec

    vals = np.full(137, np.int64(-11264)).view(np.uint64)
    codec = SplineCodec(np.uint64)
    payload = codec.encode(vals)
    np.testing.assert_array_equal(codec.decode(payload, vals.size), vals)
    assert codec.sum(payload, vals.size) == int(vals.sum(dtype=object))


def test_race_memo_benches_losing_candidates(monkeypatch):
    """Adaptive race pruning: a candidate that keeps losing on a column is
    benched after RACE_PATIENCE tries and only re-raced every RACE_RECHECK
    chunks — memo-less callers still get the exhaustive race."""
    from learn_to_compress_spark import select as S
    from learn_to_compress_spark.codecs.poly import Poly2Codec

    calls = {"n": 0}
    orig = Poly2Codec.size_bytes

    def counting(self, vals):
        calls["n"] += 1
        return orig(self, vals)

    monkeypatch.setattr(Poly2Codec, "size_bytes", counting)
    rng = np.random.default_rng(3)
    # uniform noise: 'for' wins at ~62% CR (gate passes), poly2 always loses
    chunks = [rng.integers(0, 2**40, 8192, dtype=np.uint64) for _ in range(40)]

    for ch in chunks:
        name, _ = S.encode_int_values(ch, None, "int64")
    assert calls["n"] == 40  # no memo → every chunk races

    calls["n"] = 0
    memo: dict = {}
    for ch in chunks:
        S.encode_int_values(ch, None, "int64", memo=memo)
    # PATIENCE initial tries + one recheck per RECHECK benched chunks
    assert calls["n"] <= S.RACE_PATIENCE + 40 // S.RACE_RECHECK + 1
    assert calls["n"] >= S.RACE_PATIENCE


def test_race_memo_recovers_after_distribution_shift():
    """A benched candidate is re-raced at the recheck boundary, so a
    mid-column shift to poly2-shaped data is picked up within RACE_RECHECK
    chunks and sticks thereafter."""
    from learn_to_compress_spark import select as S

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 2**40, 8192, dtype=np.uint64)
    x = np.arange(8192, dtype=np.float64)
    quad = ((x * x) / 3.0 + rng.integers(0, 7, 8192)).astype(np.uint64)

    memo: dict = {}
    names = []
    for _ in range(S.RACE_PATIENCE + 2):  # bench the nonlinear candidates
        names.append(S.encode_int_values(noise, None, "int64", memo=memo)[0])
    for _ in range(2 * S.RACE_RECHECK):
        names.append(S.encode_int_values(quad, None, "int64", memo=memo)[0])
    # memo-less race on the quad chunk must pick a nonlinear codec…
    exhaustive = S.encode_int_values(quad, None, "int64")[0]
    assert exhaustive in ("poly2", "spline", "leco_var", "leco_var_dp")
    # …and the memo'd stream recovers it within one recheck period, then
    # keeps it (the win resets the loss streak)
    tail = names[S.RACE_PATIENCE + 2 + S.RACE_RECHECK :]
    assert exhaustive in tail
    assert names[-1] == exhaustive


def test_bitlen_u64_exact():
    from learn_to_compress_spark.codecs.leco_var import _bitlen_u64

    vals = [0, 1, 2, 3, 4, 7, 8, (1 << 52) - 1, 1 << 52, (1 << 52) + 1,
            (1 << 53) - 1, 1 << 53, (1 << 63) - 1, 1 << 63, (1 << 64) - 1]
    rng = np.random.default_rng(2)
    vals += [int(x) for x in rng.integers(0, 2**63, 200, dtype=np.uint64)]
    arr = np.array(vals, dtype=np.uint64)
    got = _bitlen_u64(arr)
    exp = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert (got == exp).all(), np.flatnonzero(got != exp)


def test_leco_var_batch_cost_matches_scalar():
    """_seg_cost_batch must reproduce the scalar _seg_cost exactly —
    (cost, l, theta0, theta1, amax) per window — on ramps, jumps, noise and
    near-2^63 magnitudes."""
    from learn_to_compress_spark.codecs.leco_var import LecoVarCodec, _Fitter

    rng = np.random.default_rng(17)
    n = 20000
    parts = [
        (np.arange(0, 4000, dtype=np.int64) * 37 + rng.integers(-5, 6, 4000)),
        rng.integers(-(2**40), 2**40, 4000),
        np.full(4000, 123456789),
        (2**62 + np.arange(4000, dtype=np.int64) * 1001),
        rng.integers(-(2**62), 2**62, 4000),
    ]
    y64 = np.concatenate(parts).astype(np.int64)
    assert y64.size == n
    c = LecoVarCodec(np.uint64)
    fitter = _Fitter(y64)
    # windows of many sizes at many offsets, including overlapping ones
    starts, ends = [], []
    for size in (1, 2, 16, 63, 300, 4096):
        for s in range(0, n - size, max(n // 37, size)):
            starts.append(s)
            ends.append(s + size)
    batch = c._seg_cost_batch(y64, fitter, starts, ends)
    for (s, e), got in zip(zip(starts, ends), batch):
        exp = c._seg_cost(y64, fitter, s, e)
        assert got == exp, (s, e, got, exp)


def test_leco_var_roundtrip_after_batch_rewrite():
    from learn_to_compress_spark.codecs.leco_var import LecoVarCodec

    rng = np.random.default_rng(23)
    base = np.cumsum(rng.integers(0, 50, 65536, dtype=np.int64))
    jumps = np.repeat(rng.integers(0, 2**40, 64, dtype=np.int64), 1024)
    v = (base + jumps).astype(np.uint64)
    c = LecoVarCodec(np.uint64)
    p = c.encode(v)
    assert (c.decode(p, v.size) == v).all()
    pos = rng.integers(0, v.size, 500)
    assert (c.gather(p, pos, v.size) == v[pos]).all()


def test_lookahead_codec_roundtrip_and_race_value():
    """leco_var_lookahead (piecewise_cost_lookahead.h role): decodes
    byte-compatibly with the leco_var layout; the exact race picks the
    min of both segmenters per chunk — lookahead's uniform horizon wins
    on drift-shaped random walks, the split+merge heuristic wins on
    jump-segmented / smooth data."""
    from learn_to_compress_spark.codecs import int_codec
    from learn_to_compress_spark.select import encode_int_values

    rng = np.random.default_rng(9)
    shapes = {
        "linear": (np.arange(65536, dtype=np.uint64) * 977 + 13),
        "noisy_ramp": (np.arange(30000, dtype=np.int64) * 500 + 100
                       + rng.integers(-40, 40, 30000)).astype(np.uint64),
        "conv_ts": (np.cumsum(rng.integers(0, 3_000_000, 40000))
                    + np.repeat(rng.integers(0, 2**41, 40), 1000)).astype(np.uint64),
        "sensor": np.cumsum(rng.poisson(2_000_000, 20000)).astype(np.uint64),
    }
    la = int_codec("leco_var_lookahead", np.uint64)
    lv = int_codec("leco_var", np.uint64)
    winners = {}
    for name, v in shapes.items():
        p = la.encode(v)
        assert (la.decode(p, v.size) == v).all(), name
        pos = rng.integers(0, v.size, 200)
        assert (la.gather(p, pos, v.size) == v[pos]).all(), name
        # the exact race never does worse than either segmenter alone
        raced_name, raced = encode_int_values(v, None, "int64")
        assert len(raced) <= min(len(lv.encode(v)), len(p)) + 2, name
        winners[name] = raced_name
    # lookahead carries its weight: it wins at least one realistic shape
    assert winners["sensor"] == "leco_var_lookahead", winners


def test_leco_decode_many_bit_identical_to_per_block():
    """`decode_many` must return exactly what per-block `decode` returns —
    same values, same dtype — across residual widths incl. the mb=0 (pure
    model), raw-escape, >56-bit-residual, and mixed-length cases. This is
    the batched twin of the reference's timed full-decode loop
    (experiments/leco_int_template.cpp:112-131)."""
    from learn_to_compress_spark.codecs.intcodecs import LecoFixCodec

    rng = np.random.default_rng(1234)
    for dtype in (np.uint32, np.uint64):
        codec = LecoFixCodec(np.dtype(dtype))
        blocks = []
        for n in (100, 100, 37, 1, 2000, 64):
            base = int(rng.integers(0, 1000))
            noise = rng.integers(0, 7, size=n)
            blocks.append((np.arange(n) * 3 + base + noise).astype(dtype))
        blocks.append(np.full(100, 5, dtype=dtype))  # mb = 0
        blocks.append(rng.integers(0, np.iinfo(dtype).max, size=100, dtype=dtype))
        if dtype is np.uint64:
            blocks.append(rng.integers(0, 1 << 62, size=100, dtype=dtype))  # mb > 56
            blocks.append(np.array([2**63, 2**63 + 5, 2**63 - 5], dtype=dtype))
        payloads = [codec.encode(v) for v in blocks]
        ns = [len(v) for v in blocks]
        ref = [codec.decode(p, n) for p, n in zip(payloads, ns)]
        got = codec.decode_many(payloads, ns)
        assert len(got) == len(ref)
        for r, g, v in zip(ref, got, blocks):
            assert g.dtype == r.dtype
            np.testing.assert_array_equal(g, r)
            np.testing.assert_array_equal(g, v)
    assert LecoFixCodec(np.dtype(np.uint64)).decode_many([], []) == []


def test_leco_lp_minimax_fit_is_exact():
    """The convex-hull Chebyshev fit must match a dense slope scan: no line
    has a smaller max |residual| (the LP objective of scripts/leco_lp/
    leco_lp.py, solved here without a solver)."""
    from learn_to_compress_spark.codecs.leco_lp import chebyshev_line

    rng = np.random.default_rng(99)
    for trial in range(60):
        n = int(rng.integers(3, 250))
        kind = trial % 5
        if kind == 0:
            y = rng.normal(0, 100, n)
        elif kind == 1:
            y = np.arange(n) * 3.7 + rng.normal(0, 5, n)
        elif kind == 2:
            y = np.cumsum(rng.normal(0, 10, n))
        elif kind == 3:
            y = np.full(n, 42.0)
        else:
            y = rng.integers(0, 10, n).astype(float)
        t0, t1 = chebyshev_line(y)
        x = np.arange(n)
        err = np.abs(y - (t0 + t1 * x)).max()
        ss = np.linspace(t1 - 5, t1 + 5, 2001)
        r = y[None, :] - ss[:, None] * x[None, :]
        best = ((r.max(1) - r.min(1)) / 2).min()
        assert err <= best + 1e-6, (trial, err, best)


def test_leco_lp_roundtrip_size_and_race():
    """leco_lp roundtrips bit-exactly, its analytic size_bytes equals the
    real payload, its CONTINUOUS max residual never exceeds the LS line's
    (minimax optimality), and the framed race only ever swaps it in when
    strictly smaller."""
    from learn_to_compress_spark.codecs.intcodecs import LecoFixCodec
    from learn_to_compress_spark.codecs.leco_lp import LecoLpCodec
    from learn_to_compress_spark.select import encode_int_values, decode_int_column

    rng = np.random.default_rng(4)
    for dtype in (np.uint32, np.uint64):
        lp, ls = LecoLpCodec(np.dtype(dtype)), LecoFixCodec(np.dtype(dtype))
        for trial in range(40):
            n = int(rng.integers(256, 3000))
            kind = trial % 3
            if kind == 0:
                v = (np.arange(n) * 7 + rng.integers(0, 50, n)).astype(dtype)
            elif kind == 1:
                v = (np.arange(n) * 3 + (rng.pareto(2.0, n) * 20).astype(int)).astype(
                    dtype
                )
            else:
                v = np.cumsum(rng.integers(0, 9, n)).astype(dtype)
            p = lp.encode(v)
            np.testing.assert_array_equal(lp.decode(p, n), v)
            assert lp.size_bytes(v) == len(p)
            x = np.arange(n, dtype=np.float64)
            yf = v.astype(np.float64)
            t0_lp, t1_lp = lp._fit(v)
            t0_ls, t1_ls = ls._fit(v)
            e_lp = np.abs(yf - (t0_lp + t1_lp * x)).max()
            e_ls = np.abs(yf - (t0_ls + t1_ls * x)).max()
            assert e_lp <= e_ls + 1e-6 * max(1.0, e_ls)
    # forced seam roundtrips through the framing
    v = (np.arange(1000) * 5 + np.random.default_rng(0).integers(0, 9, 1000)).astype(
        np.int64
    )
    name, payload = encode_int_values(v, None, "int64", selection="force:leco_lp")
    assert name == "leco_lp"
    out = decode_int_column(payload, 1000, "int64")
    np.testing.assert_array_equal(out.to_numpy(), v)


def test_baseline_codecs_roundtrip_and_shape_wins():
    """vbyte and elias_fano (operator #19 — comparison-only baselines in the
    reference, real raced codecs here) roundtrip bit-exactly, report exact
    analytic sizes, and each WINS on the shape it exists for: vbyte on
    heavy-tailed magnitudes (per-value sizing vs fixed width), Elias-Fano on
    monotone ids with irregular gaps (2+log2(u/n) bits amortized vs
    bits(max gap) per value)."""
    from learn_to_compress_spark.codecs.baseline import EliasFanoCodec, VbyteCodec
    from learn_to_compress_spark.codecs.intcodecs import DeltaCodec, ForCodec
    from learn_to_compress_spark.select import decode_int_column, encode_int_values

    rng = np.random.default_rng(6)
    for dtype in (np.uint32, np.uint64):
        vb, ef = VbyteCodec(np.dtype(dtype)), EliasFanoCodec(np.dtype(dtype))
        mx = np.iinfo(dtype).max
        shapes = [
            rng.integers(0, 128, 1000).astype(dtype),
            rng.integers(0, mx, 1000, dtype=dtype),
            np.zeros(100, dtype=dtype),
            np.array([0, 1, 127, 128, 129, 16383, 16384, mx], dtype=dtype),
            np.array([7], dtype=dtype),
            (rng.pareto(1.0, 2000) * 100).astype(dtype),
        ]
        for v in shapes:
            p = vb.encode(v)
            assert len(p) == vb.size_bytes(v)
            out = vb.decode(p, len(v))
            assert out.dtype == v.dtype
            np.testing.assert_array_equal(out, v)
            # EF: escape path on arbitrary data, real path on sorted
            np.testing.assert_array_equal(ef.decode(ef.encode(v), len(v)), v)
            sv = np.sort(v)
            pe = ef.encode(sv)
            assert len(pe) == ef.size_bytes(sv)
            np.testing.assert_array_equal(ef.decode(pe, len(sv)), sv)
            for val in (0, int(sv[len(sv) // 2]), int(sv[-1])):
                got = ef.filter_gt(pe, len(sv), val)
                np.testing.assert_array_equal(
                    got, np.flatnonzero(sv > np.array(val).astype(dtype))
                )
    # the shapes they were built for
    u64 = np.dtype(np.uint64)
    ids = np.sort(rng.choice(10_000_000, size=60_000, replace=False)).astype(np.uint64)
    assert EliasFanoCodec(u64).size_bytes(ids) < len(DeltaCodec(u64).encode(ids))
    tail = (rng.pareto(0.7, 60_000) * 10).astype(np.uint64)
    assert VbyteCodec(u64).size_bytes(tail) < len(ForCodec(u64).encode(tail))
    # forced seam roundtrips through the framing
    for force in ("vbyte", "elias_fano"):
        v = np.sort(rng.integers(0, 10**9, 5000)).astype(np.int64)
        name, payload = encode_int_values(v, None, "int64", selection=f"force:{force}")
        assert name == force
        np.testing.assert_array_equal(
            decode_int_column(payload, 5000, "int64").to_numpy(), v
        )


def test_new_codec_golden_layout_vectors():
    """Stored-byte pins for the r4 codecs: a chunk store is durable data, so
    layout changes must be deliberate (new codec id), never accidental.
    vbyte/elias_fano bytes are hand-verified against the docstring layouts;
    leco_lp shares LecoFixCodec's layout with its own fit (theta0=10,
    theta1=3 for the pinned ramp)."""
    from learn_to_compress_spark.codecs.baseline import EliasFanoCodec, VbyteCodec
    from learn_to_compress_spark.codecs.leco_lp import LecoLpCodec

    u64 = np.dtype(np.uint64)
    assert (
        VbyteCodec(u64).encode(np.array([0, 1, 127, 128, 300, 16384], dtype=np.uint64)).hex()
        == "00017f8001ac02808001"
    )
    assert (
        EliasFanoCodec(u64).encode(np.array([3, 4, 7, 13, 14, 15, 21, 43], dtype=np.uint64)).hex()
        == "020300000000000000030000006b05028423"
    )
    assert (
        LecoLpCodec(u64).encode(np.array([10, 13, 15, 19, 22, 24, 28, 31], dtype=np.uint64)).hex()
        == "0200000000000024400000000000000840100400000000000000"
    )


def test_string_positions_in_matches_brute_force():
    """IN-list membership across every string codec: dict chunks answer in
    the CODE domain (DictStringCodec.positions_in, no row string
    materializes), everything else through one Arrow is_in kernel — both
    must agree with a brute-force scan, including null handling and an
    empty / no-hit list."""
    import pandas as pd

    from learn_to_compress_spark.select import (
        column_positions_in_string,
        encode_string_column,
    )

    rng = np.random.default_rng(11)
    cats = ["click", "view", "purchase", "scroll", None]
    rows = [cats[i] for i in rng.integers(0, len(cats), 700)]
    # high-cardinality rows force a non-dict codec on a second column
    uniq_rows = [f"row-{i:05d}-{rng.integers(0, 10)}" for i in range(700)]
    for data in (rows, uniq_rows):
        ser = pd.Series(data, dtype="object")
        name, payload = encode_string_column(ser)
        for needles in (
            [b"click", b"purchase"],
            [b"row-00001-0", b"row-00699-0", b"absent"],
            [b"absent"],
        ):
            got = column_positions_in_string(payload, len(ser), needles)
            want = np.flatnonzero(
                ser.map(lambda s: s is not None and s.encode() in needles).to_numpy(
                    dtype=bool
                )
            )
            np.testing.assert_array_equal(got, want), (name, needles)
