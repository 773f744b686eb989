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
    CHUNK_SCHEMA,
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
    """pandas-entry wrapper (tests/profiling); the job kernel uses the
    Arrow-native `_encode_one_arrow`."""
    import pyarrow as pa

    if logical == "string":
        col = pa.Array.from_pandas(ser, type=pa.large_string())
    elif logical == "double":
        col = pa.Array.from_pandas(ser, type=pa.float64())
    elif logical.startswith("timestamp"):
        col = pa.Array.from_pandas(ser, type=pa.timestamp("us"))
    else:
        col = pa.Array.from_pandas(
            ser, type=pa.int32() if logical == "int32" else pa.int64()
        )
    return _encode_one_arrow(col, logical)


def _encode_one_arrow(col, logical: str, selection: str = "exact") -> tuple[str, bytes, dict]:
    """Encode one Arrow column chunk — no Python objects on the hot path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..select import encode_double_column, encode_int_values, encode_string_column_arrow

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    has_nulls = col.null_count > 0
    mask = col.is_null().to_numpy(zero_copy_only=False) if has_nulls else None
    nonnull = col.drop_null() if has_nulls else col

    if logical == "string":
        name, payload = encode_string_column_arrow(col)
        raw = int(
            pc.sum(pc.binary_length(nonnull.cast(pa.large_binary()))).as_py() or 0
        )
        meta = {}
    elif logical == "double":
        name, payload = encode_double_column(
            pd.Series(col.to_numpy(zero_copy_only=False))
        )
        raw = 8 * len(nonnull)
        meta = {}
    else:
        raw_vals = nonnull.to_numpy(zero_copy_only=False)
        name, payload = encode_int_values(raw_vals, mask, logical, selection)
        raw = (4 if logical == "int32" else 8) * len(nonnull)
        if len(nonnull):
            if logical.startswith("timestamp"):
                v64 = raw_vals.astype("datetime64[us]").view(np.int64)
            else:
                v64 = raw_vals
            meta = {"min": str(int(v64.min())), "max": str(int(v64.max()))}
        else:
            meta = {}
    meta["raw_bytes"] = str(raw)
    meta["enc_bytes"] = str(len(payload))
    return name, payload, meta


def _make_kernel(colspecs, chunk_rows, selection="exact"):
    """Arrow-native encode kernel (mapInArrow): RecordBatch slices are
    zero-copy, string columns never materialize as Python objects."""
    import pyarrow as pa

    out_type = pa.schema(
        [
            pa.field("part_id", pa.int32()),
            pa.field("chunk_id", pa.int64()),
            pa.field("column", pa.string()),
            pa.field("codec", pa.string()),
            pa.field("n_rows", pa.int32()),
            pa.field("payload", pa.binary()),
            pa.field("meta", pa.map_(pa.string(), pa.string())),
        ]
    )

    def kernel(batches):
        seqs: dict[int, int] = {}
        for rb in batches:
            parts_np = rb.column(rb.schema.get_field_index("_part_id")).to_numpy(
                zero_copy_only=False
            )
            # rows sorted by _part_id: consecutive groups, order preserved
            change = np.flatnonzero(parts_np[1:] != parts_np[:-1]) + 1
            bounds = [0, *change.tolist(), len(rb)]
            rows = {k: [] for k in ("part_id", "chunk_id", "column", "codec", "n_rows", "payload", "meta")}
            for s, e in zip(bounds[:-1], bounds[1:]):
                part_id = int(parts_np[s])
                for cs in range(s, e, chunk_rows):
                    sl = rb.slice(cs, min(chunk_rows, e - cs))
                    seq = seqs.get(part_id, 0)
                    if seq >= MAX_CHUNKS_PER_PART:
                        raise RuntimeError("chunk seq overflow; raise num_parts")
                    seqs[part_id] = seq + 1
                    chunk_id = part_id * MAX_CHUNKS_PER_PART + seq
                    for name, logical in colspecs:
                        col = sl.column(sl.schema.get_field_index(name))
                        codec, payload, meta = _encode_one_arrow(col, logical, selection)
                        rows["part_id"].append(part_id)
                        rows["chunk_id"].append(chunk_id)
                        rows["column"].append(name)
                        rows["codec"].append(codec)
                        rows["n_rows"].append(len(sl))
                        rows["payload"].append(payload)
                        rows["meta"].append(list(meta.items()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["part_id"], pa.int32()),
                    pa.array(rows["chunk_id"], pa.int64()),
                    pa.array(rows["column"], pa.string()),
                    pa.array(rows["codec"], pa.string()),
                    pa.array(rows["n_rows"], pa.int32()),
                    pa.array(rows["payload"], pa.binary()),
                    pa.array(rows["meta"], pa.map_(pa.string(), pa.string())),
                ],
                schema=out_type,
            )

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
    selection: str = "exact",
    shuffle_width: int | None = None,
) -> dict:
    """Encode ``df`` into the chunk store; returns job metrics.

    ``key_cols``: (partition key, order keys...) — ``(conv_id, turn_idx)``
    for transcripts. All other columns ride along and are chunked in the
    same stable order.
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    if num_parts is None:
        # logical commit units = 4× the shuffle width: repartition() routes
        # part_ids to tasks by murmur3, and with a 1:1 domain ~1/e of the
        # tasks land empty while others get doubled (observed 14/32 empty);
        # a 4× domain gives every task ~4 parts and bounds the straggler
        # ratio, and finer parts also mean finer resume granularity
        num_parts = 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
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
    if shuffle_width is None:
        shuffle_width = max(1, num_parts // 4)
    encoded = (
        work.repartition(shuffle_width, "_part_id")
        .sortWithinPartitions("_part_id", *key_cols)
        .mapInArrow(_make_kernel(colspecs, chunk_rows, selection), schema=CHUNK_SCHEMA)
    )
    # per-run partition directory (Hive-style): readers discover ``run_id``
    # as a partition column, the lineage metrics job lists ONLY this run's
    # files (at 10^12 rows a metrics pass must not scan the whole store),
    # and a killed run's orphans are one directory. Uncompressed parquet:
    # payloads are already entropy-coded, so snappy on top costs CPU at
    # every write AND read for ~no size gain.
    run_dir = os.path.join(chunks_path(store), f"run_id={run_id}")
    encoded.write.mode("append").option("compression", "uncompressed").parquet(run_dir)
    wall_ms = (time.monotonic() - t0) * 1000

    # persist the table schema so decode is self-describing
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "_schema.json"), "w") as fh:
        json.dump({"colspecs": colspecs, "key_cols": list(key_cols)}, fh)

    # lineage commit: aggregate this run's chunk rows into per-part metrics
    mine = spark.read.schema(CHUNK_SCHEMA).parquet(run_dir)
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
