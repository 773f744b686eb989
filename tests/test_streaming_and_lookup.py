"""Structured-Streaming encode ingestion + equality point-lookup operator."""

import os

import pytest
from pyspark.sql import functions as F

from learn_to_compress_spark.jobs import decode_table, encode_table
from learn_to_compress_spark.operators import filter_mod_band_table, lookup_eq_table
from learn_to_compress_spark.sources.transcripts import SCHEMA, transcripts_df
from learn_to_compress_spark.streaming import encode_stream


def test_streaming_encode_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "stream_store")
    df = transcripts_df(spark, 80, parallelism=2)
    # two source files → two micro-batches (maxFilesPerTrigger=1)
    df.filter(F.col("conv_id") < "conv-0000000040").coalesce(1).write.parquet(f"{src}/b0")
    df.filter(F.col("conv_id") >= "conv-0000000040").coalesce(1).write.parquet(f"{src}/b1")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = encode_stream(stream, store, num_parts=4, chunk_rows=512)
    q.awaitTermination(120)

    from learn_to_compress_spark.chunkstore import read_lineage

    lin = read_lineage(spark, store).toPandas()
    assert lin.run_id.str.startswith("stream-").all()
    assert lin.run_id.nunique() >= 2  # one commit per micro-batch

    dec = decode_table(spark, store)
    assert dec.count() == df.count()
    a = df.orderBy("conv_id", "turn_idx").toPandas()
    b = dec.orderBy("conv_id", "turn_idx").toPandas()
    assert a["text"].equals(b["text"])
    assert (a["ts"].to_numpy() == b["ts"].to_numpy()).all()


def test_lookup_eq(spark, tmp_path):
    store = str(tmp_path / "eq_store")
    df = transcripts_df(spark, 150, parallelism=2)
    encode_table(df, store, num_parts=4, chunk_rows=512)
    expect = (
        df.filter(F.col("turn_idx") == 7)
        .select("conv_id", "turn_idx")
        .orderBy("conv_id")
        .toPandas()
    )
    got = (
        lookup_eq_table(spark, store, "turn_idx", 7, ["conv_id", "turn_idx"])
        .orderBy("conv_id")
        .toPandas()
    )
    assert len(expect) > 0
    assert expect.reset_index(drop=True).equals(got.reset_index(drop=True))


def test_filter_mod_band(spark, tmp_path):
    store = str(tmp_path / "band_store")
    df = transcripts_df(spark, 100, parallelism=2)
    encode_table(df, store, num_parts=4, chunk_rows=512)
    expect = (
        df.filter((F.col("turn_idx") % 8 > 2) & (F.col("turn_idx") % 8 < 6))
        .select("conv_id", "turn_idx")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    got = (
        filter_mod_band_table(spark, store, "turn_idx", 8, 2, 6, ["conv_id", "turn_idx"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(expect) > 0
    assert expect.reset_index(drop=True).equals(got.reset_index(drop=True))
