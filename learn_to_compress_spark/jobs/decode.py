"""Decode job — distributed ``decodeArray8`` sweep with roundtrip checking.

Reads visible chunk rows (lineage-committed only), groups the per-column
payloads of each chunk, and reassembles table rows inside one vectorized
pandas kernel per chunk. Row order within a chunk is positional (all columns
of a chunk were sliced from the same sorted batch), so per-conv ordering is
restored globally by sorting on the decoded key columns — which is exactly
the invariant the driver checks (per-turn text equality under stable
(conv_id, turn_idx) ordering).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..chunkstore import read_chunks
from ..select import (
    decode_double_column,
    decode_int_column,
    decode_string_column,
)

_SPARK_OF_LOGICAL = {
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "timestamp_us": T.TimestampType(),
    "timestamp_ntz_us": T.TimestampNTZType(),
    "string": T.StringType(),
    "double": T.DoubleType(),
}


def load_schema(store: str) -> tuple[list[tuple[str, str]], list[str]]:
    with open(os.path.join(store, "_schema.json")) as fh:
        doc = json.load(fh)
    return [tuple(cs) for cs in doc["colspecs"]], doc["key_cols"]


def decode_column(payload: bytes, n: int, logical: str) -> pd.Series:
    if logical == "string":
        return decode_string_column(payload, n)
    if logical == "double":
        return decode_double_column(payload, n)
    return decode_int_column(payload, n, logical)


def decode_column_arrow(payload: bytes, n: int, logical: str):
    from ..select import (
        decode_double_column_arrow,
        decode_int_column_arrow,
        decode_string_column_arrow,
    )

    if logical == "string":
        return decode_string_column_arrow(payload, n)
    if logical == "double":
        return decode_double_column_arrow(payload, n)
    return decode_int_column_arrow(payload, n, logical)


def decode_table(
    spark: SparkSession, store: str, columns: list[str] | None = None
) -> DataFrame:
    """Reassembled table DataFrame from the chunk store (column-prunable).

    The kernel is Arrow-native (``applyInArrow``): decoded columns return to
    the JVM as Arrow buffers — strings never materialize as Python objects."""
    import pyarrow as pa

    colspecs, _key_cols = load_schema(store)
    if columns is not None:
        colspecs = [cs for cs in colspecs if cs[0] in columns]
    out_schema = T.StructType(
        [T.StructField(n, _SPARK_OF_LOGICAL[lg], True) for n, lg in colspecs]
    )
    logical_of = dict(colspecs)
    names = [n for n, _ in colspecs]

    # Spark's Arrow bridge wants exact types: string (not large_string) and
    # tz-aware timestamps for TimestampType (session tz is pinned to UTC)
    _PA_OF_LOGICAL = {
        "int32": pa.int32(),
        "int64": pa.int64(),
        "timestamp_us": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz_us": pa.timestamp("us"),
        "string": pa.string(),
        "double": pa.float64(),
    }

    def kernel(_key: tuple, tbl: pa.Table) -> pa.Table:
        n = int(tbl.column("n_rows")[0].as_py())
        by_col = dict(
            zip(tbl.column("column").to_pylist(), tbl.column("payload").to_pylist())
        )
        arrays = [
            decode_column_arrow(by_col[name], n, logical_of[name]).cast(
                _PA_OF_LOGICAL[logical_of[name]]
            )
            for name in names
        ]
        return pa.Table.from_arrays(arrays, names=names)

    chunks = read_chunks(spark, store, columns=names)
    # run_id is part of the chunk identity: streaming commits one run per
    # micro-batch into the same part_ids, so chunk_id alone can collide
    return chunks.groupBy("part_id", "run_id", "chunk_id").applyInArrow(kernel, out_schema)
