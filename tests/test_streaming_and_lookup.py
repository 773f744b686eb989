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


def test_windowed_aggregation_with_watermark(spark, tmp_path):
    """Watermarked tumbling-window counts over a file stream equal the batch
    groupBy on the same data."""
    from learn_to_compress_spark.sources.transcripts import transcripts_df
    from learn_to_compress_spark.streaming.windows import turns_per_window

    src = str(tmp_path / "win_src")
    out = str(tmp_path / "win_out")
    df = transcripts_df(spark, 50, parallelism=2)
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        turns_per_window(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window.start, r.window.end): r.n_turns
        for r in spark.sql("select * from win_agg").collect()
    }
    want = {
        (r.w.start, r.w.end): r.c
        for r in df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == want


def test_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState keeps running per-conversation counters; final
    update rows match the batch aggregate."""
    from learn_to_compress_spark.sources.transcripts import transcripts_df
    from learn_to_compress_spark.streaming.windows import conversation_progress

    src = str(tmp_path / "state_src")
    df = transcripts_df(spark, 40, parallelism=2)
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from conv_state where not closed").collect()
    # latest update per conv
    latest = {}
    for r in rows:
        if r.conv_id not in latest or r.n_turns > latest[r.conv_id].n_turns:
            latest[r.conv_id] = r
    want = {
        r.conv_id: (r.n, r.mx)
        for r in df.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    assert {k: (v.n_turns, v.max_turn_idx) for k, v in latest.items()} == want
