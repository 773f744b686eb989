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
    group_count_string_table,
    minmax_column,
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
