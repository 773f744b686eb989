"""Metadata-only aggregates (MIN/MAX from zone maps, AVG from vsum/nvalid)
and the code-domain GROUP BY count — correctness against Spark's own
aggregates over the same input, plus null handling.

Reference parity: the chunk header carries exact per-block min/max/sum
(``experiments/leco_int_fix_template.cpp:222-249`` zone fields), so these
aggregates are header scans there too; GROUP BY count over dict chunks is
the aggregate analogue of ``experiments/raw_test_dictionary.cpp:107-112``.
"""

import pandas as pd
from pyspark.sql import functions as F

from learn_to_compress_spark.jobs import encode_table
from learn_to_compress_spark.operators import (
    avg_column,
    count_distinct_string,
    group_count_string_table,
    group_sum_string_table,
    minmax_column,
    sum_filtered_column,
)
from learn_to_compress_spark.sources.transcripts import transcripts_df


def _store(spark, tmp_path, name="agg_store"):
    store = str(tmp_path / name)
    tdf = transcripts_df(spark, 80, parallelism=2)
    encode_table(tdf, store, num_parts=4)
    return store, tdf


def test_minmax_int_and_string_and_ts(spark, tmp_path):
    store, tdf = _store(spark, tmp_path)
    exp = tdf.agg(
        F.min("turn_idx"), F.max("turn_idx"),
        F.min("conv_id"), F.max("conv_id"),
        F.min("ts"), F.max("ts"),
    ).collect()[0]

    got_i = minmax_column(spark, store, "turn_idx").collect()[0]
    assert (got_i.min_turn_idx, got_i.max_turn_idx) == (exp[0], exp[1])

    got_s = minmax_column(spark, store, "conv_id").collect()[0]
    assert (got_s.min_conv_id, got_s.max_conv_id) == (exp[2], exp[3])

    got_t = minmax_column(spark, store, "ts").collect()[0]
    assert (got_t.min_ts, got_t.max_ts) == (exp[4], exp[5])


def test_avg_matches_and_handles_nulls(spark, tmp_path):
    store, tdf = _store(spark, tmp_path, "agg_store_avg")
    exp = tdf.agg(
        (F.sum("turn_idx").cast("double") / F.count("turn_idx")).alias("a")
    ).collect()[0].a
    got = avg_column(spark, store, "turn_idx").collect()[0][0]
    assert got == exp  # same double division of exactly-representable ints

    # null-bearing int column: AVG must divide by the NON-NULL count
    df = spark.createDataFrame(
        [("c0", 0, 10), ("c0", 1, None), ("c0", 2, 20), ("c1", 0, None), ("c1", 1, 30)],
        "conv_id string, turn_idx int, v long",
    )
    store2 = str(tmp_path / "agg_store_nulls")
    encode_table(df, store2, num_parts=2)
    got2 = avg_column(spark, store2, "v").collect()[0][0]
    assert got2 == (10 + 20 + 30) / 3.0


def test_group_count_dict_and_null_groups(spark, tmp_path):
    store, tdf = _store(spark, tmp_path, "agg_store_gc")
    for col in ("role", "tool"):  # role: dict code-domain; tool: 85% null
        got = {
            r[0]: r[1] for r in group_count_string_table(spark, store, col).collect()
        }
        exp = {r[0]: r[1] for r in tdf.groupBy(col).count().collect()}
        assert got == exp, (col, got, exp)


def test_sum_filtered_hybrid_matches(spark, tmp_path):
    """SUM WHERE filter_col > v across thresholds that exercise all three
    chunk tiers (all-pruned, all-interior, straddling)."""
    store, tdf = _store(spark, tmp_path, "agg_store_sf")
    lo, hi = tdf.agg(F.min("turn_idx"), F.max("turn_idx")).collect()[0]
    for v in (lo - 1, (lo + hi) // 2, hi):  # all-interior / mixed / all-pruned
        got = sum_filtered_column(spark, store, "turn_idx", "turn_idx", v).collect()[0][0]
        exp = tdf.filter(F.col("turn_idx") > v).agg(F.sum("turn_idx")).collect()[0][0]
        assert (None if got is None else int(got)) == exp, (v, got, exp)

    # timestamp filter over an int measure (the driver-query shape)
    cut = tdf.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).collect()[0][0]
    cut_us = int(cut * 1_000_000)
    got = sum_filtered_column(spark, store, "turn_idx", "ts", cut_us).collect()[0][0]
    exp = (
        tdf.filter(F.col("ts").cast("double") * 1_000_000 > cut_us)
        .agg(F.sum("turn_idx"))
        .collect()[0][0]
    )
    assert int(got) == exp


def test_sum_filtered_null_filter_rows_never_match(spark, tmp_path):
    """Chunks with nulls in the filter column must NOT take the
    metadata-only interior path (vsum would count rows the predicate
    drops)."""
    df = spark.createDataFrame(
        [("c0", 0, 100, 7), ("c0", 1, None, 9), ("c0", 2, 300, 4), ("c1", 0, 200, 1)],
        "conv_id string, turn_idx int, f long, v long",
    )
    store = str(tmp_path / "agg_store_sf_nulls")
    encode_table(df, store, num_parts=2)
    got = sum_filtered_column(spark, store, "v", "f", 50).collect()[0][0]
    assert int(got) == 7 + 4 + 1  # the null-f row (v=9) is excluded
    # no qualifying row → SQL NULL, not 0
    assert sum_filtered_column(spark, store, "v", "f", 10**9).collect()[0][0] is None


def test_group_sum_matches_spark(spark, tmp_path):
    store, tdf = _store(spark, tmp_path, "agg_store_gs")
    for key in ("role", "tool"):  # role: dict code-domain; tool: 85% null keys
        got = {
            r[0]: (None if r[1] is None else int(r[1]))
            for r in group_sum_string_table(spark, store, key, "turn_idx").collect()
        }
        exp = {
            r[0]: r[1]
            for r in tdf.groupBy(key).agg(F.sum("turn_idx")).collect()
        }
        assert got == exp, (key, got, exp)


def test_group_sum_null_measures_and_exactness(spark, tmp_path):
    """All-null measure groups sum to NULL; near-int64-extreme values sum
    exactly (no float64 weights anywhere)."""
    big = (1 << 62) + 12345
    df = spark.createDataFrame(
        [
            ("c0", 0, "a", big),
            ("c0", 1, "a", big),
            ("c0", 2, "b", None),
            ("c1", 0, "b", None),
            ("c1", 1, None, -big),
        ],
        "conv_id string, turn_idx int, k string, v long",
    )
    store = str(tmp_path / "agg_store_gs_nulls")
    encode_table(df, store, num_parts=2)
    got = {
        r[0]: (None if r[1] is None else int(r[1]))
        for r in group_sum_string_table(spark, store, "k", "v").collect()
    }
    assert got == {"a": 2 * big, "b": None, None: -big}


def test_count_distinct_string(spark, tmp_path):
    store, tdf = _store(spark, tmp_path, "agg_store_ndv")
    for col in ("role", "tool"):
        got = count_distinct_string(spark, store, col).collect()[0][0]
        exp = tdf.agg(F.count_distinct(F.col(col))).collect()[0][0]
        assert got == exp, (col, got, exp)


def test_column_sum_at_exact_and_null_skipping():
    """Kernel seam: exact gathered sum at int64 extremes + null positions
    skipped, against a brute-force python-int oracle."""
    import numpy as np

    from learn_to_compress_spark.jobs.encode import _encode_one
    from learn_to_compress_spark.select import column_sum_at

    rng = np.random.default_rng(11)
    vals = list(rng.integers(-(2**62), 2**62, size=500))
    vals[3] = None
    vals[77] = -(2**63)
    vals[78] = 2**63 - 1
    ser = pd.Series(vals, dtype="Int64")
    _, payload, _ = _encode_one(ser, "int64")
    pos = np.arange(0, 500, 3)
    s, nn = column_sum_at(payload, 500, "int64", pos)
    want = [int(ser.iloc[int(p)]) for p in pos if ser.iloc[int(p)] is not pd.NA]
    assert s == sum(want) and nn == len(want)


def test_column_codes_string_non_dict_codec():
    """Factorize path: a raw/FSST-coded chunk still yields (uniques, codes)
    consistent with the decoded strings."""
    import numpy as np

    from learn_to_compress_spark.jobs.encode import _encode_one
    from learn_to_compress_spark.select import column_codes_string, decode_string_column_arrow

    rows = [f"row-{i:04d}-{i % 3}" for i in range(300)]  # high-cardinality
    ser = pd.Series(rows)
    _, payload, _ = _encode_one(ser, "string")
    uniq, codes, valid = column_codes_string(payload, len(rows))
    assert valid is None
    rebuilt = [uniq[int(c)].as_py() for c in codes]
    assert rebuilt == decode_string_column_arrow(payload, len(rows)).to_pylist()


def test_group_count_code_domain_seam():
    """The dict codec's value_counts counts in the CODE domain and agrees
    with a full decode + pandas value_counts."""
    import numpy as np
    import pyarrow as pa

    from learn_to_compress_spark.codecs.strings import DictStringCodec

    rng = np.random.default_rng(7)
    rows = [f"v{int(k)}" for k in rng.integers(0, 9, size=4000)]
    codec = DictStringCodec()
    payload = codec.encode(pa.array(rows, pa.large_string()))
    uniq, counts = codec.value_counts(payload, len(rows))
    got = dict(zip([u.decode() for u in uniq.to_pylist()], counts.tolist()))
    exp = pd.Series(rows).value_counts().to_dict()
    assert got == exp
