"""Encode job — the distributed equivalent of the reference's encode drivers
(``experiments/fix_int.cpp:52-96``, ``experiments/leco_int_template.cpp:66-207``).

Plan shape (one shuffle, then embarrassingly-parallel map):

    input DataFrame
      → part_id = pmod(xxhash64(conv_id, turn_idx // salt_block), P)   [salted]
      → [resume: anti-filter against committed lineage part_ids]
      → repartition(P, part_id)                                        [shuffle]
      → sortWithinPartitions(part_id, *key_cols)                       [stable order]
      → mapInPandas(encode kernel)  — Arrow batch == one column chunk
      → append Parquet chunk files, then append lineage rows           [commit]

The salt splits a long conversation into ``salt_block``-turn ranges so a
hot conversation cannot hot-spot one partition (north_star skew clause);
the per-conv order invariant is restored at decode time by sorting on the
decoded ``(conv_id, turn_idx)``. Partition assignment is a pure function of
the keys, so a resumed run recomputes identical part_ids and re-encodes only
uncommitted partitions. At 10^12 turns nothing here is driver-bound: the
part_id set (P ints) is the only driver-side state.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..chunkstore import (
    CHUNK_RUN_SCHEMA,
    chunks_path,
    lineage_path,
    read_lineage,
)
from ..select import (
    encode_double_column,
    encode_int_column,
    encode_string_column,
)
from ..sources.session import DEFAULT_CHUNK_ROWS

_LOGICAL_OF_SPARK = {
    "integer": "int32",
    "long": "int64",
    "timestamp": "timestamp_us",
    "timestamp_ntz": "timestamp_ntz_us",
    "string": "string",
    "double": "double",
}

MAX_CHUNKS_PER_PART = 1 << 20  # chunk_id = part_id * 2^20 + seq


def colspecs_of(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    specs = []
    for f in df.schema.fields:
        if f.name in exclude:
            continue
        logical = _LOGICAL_OF_SPARK.get(f.dataType.typeName())
        if logical is None:
            raise TypeError(f"unsupported column type {f.dataType} for {f.name}")
        specs.append((f.name, logical))
    return specs


def _encode_one(ser: pd.Series, logical: str) -> tuple[str, bytes, dict]:
    if logical == "string":
        import pyarrow.compute as pc
        import pyarrow as pa

        name, payload = encode_string_column(ser)
        lens = pc.binary_length(pa.Array.from_pandas(ser, type=pa.large_string()))
        raw = int(pc.sum(lens).as_py() or 0)
        meta = {}
    elif logical == "double":
        name, payload = encode_double_column(ser)
        raw = 8 * int(ser.notna().sum())
        meta = {}
    else:
        name, payload = encode_int_column(ser, logical)
        nn = ser.dropna()
        raw = (4 if logical == "int32" else 8) * len(nn)
        if len(nn):
            if logical.startswith("timestamp"):
                vals = nn.to_numpy().astype("datetime64[us]").view(np.int64)
            else:
                vals = nn.to_numpy()
            meta = {"min": str(int(vals.min())), "max": str(int(vals.max()))}
        else:
            meta = {}
    meta["raw_bytes"] = str(raw)
    meta["enc_bytes"] = str(len(payload))
    return name, payload, meta


def _make_kernel(colspecs, chunk_rows, run_id):
    out_cols = [f.name for f in CHUNK_RUN_SCHEMA.fields]

    def kernel(batches):
        seqs: dict[int, int] = {}
        for pdf in batches:
            rows = []
            # rows are sorted by _part_id: consecutive groups, order preserved
            for part_id, g in pdf.groupby("_part_id", sort=False):
                part_id = int(part_id)
                for start in range(0, len(g), chunk_rows):
                    sl = g.iloc[start : start + chunk_rows]
                    seq = seqs.get(part_id, 0)
                    if seq >= MAX_CHUNKS_PER_PART:
                        raise RuntimeError("chunk seq overflow; raise num_parts")
                    seqs[part_id] = seq + 1
                    chunk_id = part_id * MAX_CHUNKS_PER_PART + seq
                    for name, logical in colspecs:
                        codec, payload, meta = _encode_one(sl[name], logical)
                        rows.append(
                            (part_id, chunk_id, name, codec, len(sl), payload, meta, run_id)
                        )
            yield pd.DataFrame(rows, columns=out_cols)

    return kernel


def encode_table(
    df: DataFrame,
    store: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    num_parts: int | None = None,
    salt_block: int = 1 << 16,
    resume: bool = True,
    run_id: str | None = None,
) -> dict:
    """Encode ``df`` into the chunk store; returns job metrics.

    ``key_cols``: (partition key, order keys...) — ``(conv_id, turn_idx)``
    for transcripts. All other columns ride along and are chunked in the
    same stable order.
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    colspecs = colspecs_of(df)

    first_key = key_cols[0]
    salt_parts = [F.col(first_key)]
    if len(key_cols) > 1:
        second = df.schema[key_cols[1]].dataType.typeName()
        if second in ("integer", "long"):
            salt_parts.append((F.col(key_cols[1]) / F.lit(salt_block)).cast("long"))
    part_col = F.pmod(F.xxhash64(*salt_parts), F.lit(num_parts)).cast("int")
    work = df.withColumn("_part_id", part_col)

    if resume:
        done = [r.part_id for r in read_lineage(spark, store).select("part_id").distinct().collect()]
        if done:
            work = work.filter(~F.col("_part_id").isin(done))

    t0 = time.monotonic()
    out_schema = CHUNK_RUN_SCHEMA
    encoded = (
        work.repartition(num_parts, "_part_id")
        .sortWithinPartitions("_part_id", *key_cols)
        .mapInPandas(_make_kernel(colspecs, chunk_rows, run_id), schema=out_schema)
    )
    encoded.write.mode("append").parquet(chunks_path(store))
    wall_ms = (time.monotonic() - t0) * 1000

    # persist the table schema so decode is self-describing
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "_schema.json"), "w") as fh:
        json.dump({"colspecs": colspecs, "key_cols": list(key_cols)}, fh)

    # lineage commit: aggregate this run's chunk rows into per-part metrics
    mine = spark.read.parquet(chunks_path(store)).filter(F.col("run_id") == run_id)
    per_col = len(colspecs)
    lineage = mine.groupBy("part_id").agg(
        F.lit(run_id).alias("run_id"),
        F.count("*").alias("n_chunks"),
        (F.sum("n_rows") / per_col).cast("long").alias("n_rows"),
        F.sum(F.element_at("meta", "raw_bytes").cast("long")).alias("raw_bytes"),
        F.sum(F.element_at("meta", "enc_bytes").cast("long")).alias("enc_bytes"),
        F.lit(float(wall_ms)).alias("wall_ms"),
    )
    lineage.write.mode("append").parquet(lineage_path(store))

    stats = (
        read_lineage(spark, store)
        .agg(
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
        )
        .collect()[0]
    )
    return {
        "run_id": run_id,
        "wall_ms": wall_ms,
        "rows": stats.rows,
        "raw_bytes": stats.raw,
        "enc_bytes": stats.enc,
        "ratio": (stats.enc / stats.raw) if stats.raw else None,
    }
