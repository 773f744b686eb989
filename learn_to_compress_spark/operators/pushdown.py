"""Query operators over the compressed chunk store (SURVEY.md §2.3).

All three operators follow the partial+final aggregation shape: a vectorized
kernel computes per-chunk partials from the payloads (no full-table
materialization), and a built-in Spark aggregate finishes — so Catalyst
handles distribution/AQE while the codec-level pushdowns (zone-map skipping,
model-inversion filtering, compressed-domain SUM) run inside the kernel,
mirroring ``headers/piecewise_fix_op.h:167-284`` (SUM),
``piecewise_fix_integer_template.h:206-252`` (range filter) and
``experiments/leco_int_fix_template.cpp:222-249`` (zone maps).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..chunkstore import read_chunks, read_lineage
from ..jobs.decode import decode_column, load_schema
from ..select import column_filter_gt, column_gather, column_sum


def count_rows(spark: SparkSession, store: str) -> int:
    """COUNT(*) straight from lineage metadata — no payload touched
    (the reference's COUNT is trivially ``n_rows`` per chunk header)."""
    row = read_lineage(spark, store).agg(F.sum("n_rows").alias("n")).collect()[0]
    return int(row.n or 0)


def sum_column(spark: SparkSession, store: str, column: str) -> DataFrame:
    """SUM(column) via per-chunk compressed-domain partials.

    Scans ONLY the target column's chunk rows (the ``column = X`` predicate
    is pushed to the Parquet scan) and never materializes the values.
    Timestamp columns sum in µs since epoch.
    """
    colspecs, _ = load_schema(store)
    logical = dict(colspecs)[column]
    chunks = read_chunks(spark, store, columns=[column])

    from decimal import Decimal

    def kernel(batches):
        for pdf in batches:
            sums = [
                Decimal(column_sum(bytes(p), int(n), logical))
                for p, n in zip(pdf["payload"], pdf["n_rows"])
            ]
            yield pd.DataFrame({"partial": sums})

    # decimal(38,0): µs-timestamp sums overflow int64 at ~5k rows already
    partials = chunks.mapInPandas(
        kernel, T.StructType([T.StructField("partial", T.DecimalType(38, 0))])
    )
    return partials.agg(F.sum("partial").cast(T.DecimalType(38, 0)).alias(f"sum_{column}"))


def filter_gt_table(
    spark: SparkSession,
    store: str,
    column: str,
    value: int,
    out_cols: list[str],
) -> DataFrame:
    """SELECT out_cols WHERE column > value, answered from the chunk store.

    Three-level pushdown before any row materializes:
    1. Parquet scan reads only the needed columns' chunk rows;
    2. zone-map pruning drops whole chunks with ``meta.max <= value``
       (broadcast semi-join — no shuffle of payload bytes for dead chunks);
    3. inside the kernel, the codec's model-inversion ``filter_gt`` decodes
       only candidate slots, and out_cols are gathered at match positions.

    ``value``: signed domain of the column (µs since epoch for timestamps).
    """
    colspecs, _ = load_schema(store)
    logical_of = dict(colspecs)
    need = list(dict.fromkeys([column] + out_cols))
    chunks = read_chunks(spark, store, columns=need)

    # zone-map chunk pruning on the filter column's meta
    tgt = chunks.filter(F.col("column") == column).select(
        "run_id", "chunk_id", F.element_at("meta", "max").cast("long").alias("zmax")
    )
    alive = tgt.filter(F.col("zmax").isNull() | (F.col("zmax") > F.lit(int(value)))).select(
        "run_id", "chunk_id"
    )
    pruned = chunks.join(F.broadcast(alive), ["run_id", "chunk_id"], "left_semi")

    out_schema = T.StructType(
        [
            f
            for f in _decode_schema(colspecs, out_cols).fields
        ]
    )

    def kernel(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n_rows"].iloc[0])
        rows = {r["column"]: r for _, r in pdf.iterrows()}
        pos = column_filter_gt(bytes(rows[column]["payload"]), n, logical_of[column], int(value))
        data = {}
        for name in out_cols:
            payload = bytes(rows[name]["payload"])
            lg = logical_of[name]
            if lg in ("string", "double"):
                data[name] = decode_column(payload, n, lg).iloc[pos].reset_index(drop=True)
            else:
                data[name] = column_gather(payload, n, lg, pos)
        return pd.DataFrame(data, columns=out_cols)

    return pruned.groupBy("part_id", "run_id", "chunk_id").applyInPandas(kernel, out_schema)


def filter_mod_band_table(
    spark: SparkSession,
    store: str,
    column: str,
    base: int,
    lo: int,
    hi: int,
    out_cols: list[str],
) -> DataFrame:
    """SELECT out_cols WHERE lo < column % base < hi — the periodic band
    filter (``headers/piecewise_fix_integer_template.h:254-303``, sensor
    use case). Zone maps cannot prune a modular predicate, so every chunk
    decodes the filter column once inside the kernel and gathers matches;
    the reference's per-period model inversion is a micro-optimization we
    skip (documented divergence)."""
    colspecs, _ = load_schema(store)
    logical_of = dict(colspecs)
    need = list(dict.fromkeys([column] + out_cols))
    chunks = read_chunks(spark, store, columns=need)
    out_schema = _decode_schema(colspecs, out_cols)

    def kernel(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = int(pdf["n_rows"].iloc[0])
        rows = {r["column"]: r for _, r in pdf.iterrows()}
        lg = logical_of[column]
        vals = decode_column(bytes(rows[column]["payload"]), n, lg)
        v64 = (
            vals.to_numpy().astype("datetime64[us]").view("int64")
            if lg.startswith("timestamp")
            else vals.to_numpy().astype("int64")
        )
        rem = v64 % base
        pos = np.flatnonzero((rem > lo) & (rem < hi))
        data = {}
        for name in out_cols:
            p = bytes(rows[name]["payload"])
            nlg = logical_of[name]
            if nlg in ("string", "double"):
                data[name] = decode_column(p, n, nlg).iloc[pos].reset_index(drop=True)
            else:
                data[name] = column_gather(p, n, nlg, pos)
        return pd.DataFrame(data, columns=out_cols)

    return chunks.groupBy("part_id", "run_id", "chunk_id").applyInPandas(kernel, out_schema)


def select_bitmap_table(
    spark: SparkSession,
    store: str,
    bitmap_col: str,
    base: int,
    rem: int,
    out_cols: list[str],
) -> DataFrame:
    """Selective decode under a selection bitmap (operator #31,
    ``experiments/test_bitmap.cpp:116-165``; bitmaps generated at selectivity
    p by ``scripts/gen_bitmap.py``).

    The bitmap is the set of rows with ``bitmap_col % base == rem`` —
    materialized per chunk by decoding the (cheap) bitmap column once; the
    projected ``out_cols`` are then decoded ONLY at set positions via the
    codec gather kernels, switching to full-block decode above the ~0.2
    density threshold the reference measured (density-adaptive hybrid,
    ``test_bitmap.cpp:131-165`` — implemented in ``select.column_gather``).
    """
    colspecs, _ = load_schema(store)
    logical_of = dict(colspecs)
    need = list(dict.fromkeys([bitmap_col] + out_cols))
    chunks = read_chunks(spark, store, columns=need)
    out_schema = _decode_schema(colspecs, out_cols)

    def kernel(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = int(pdf["n_rows"].iloc[0])
        rows = {r["column"]: r for _, r in pdf.iterrows()}
        lg = logical_of[bitmap_col]
        vals = decode_column(bytes(rows[bitmap_col]["payload"]), n, lg)
        v64 = (
            vals.to_numpy().astype("datetime64[us]").view("int64")
            if lg.startswith("timestamp")
            else vals.to_numpy().astype("int64")
        )
        pos = np.flatnonzero(v64 % base == rem)  # the selection vector
        data = {}
        for name in out_cols:
            p = bytes(rows[name]["payload"])
            nlg = logical_of[name]
            if nlg in ("string", "double"):
                data[name] = decode_column(p, n, nlg).iloc[pos].reset_index(drop=True)
            else:
                data[name] = column_gather(p, n, nlg, pos)
        return pd.DataFrame(data, columns=out_cols)

    return chunks.groupBy("part_id", "run_id", "chunk_id").applyInPandas(kernel, out_schema)


def lookup_eq_table(
    spark: SparkSession,
    store: str,
    column: str,
    value: int,
    out_cols: list[str],
) -> DataFrame:
    """SELECT out_cols WHERE column = value — the point-lookup / binary-search
    operator (``experiments/binary_search.cpp:63-122``,
    ``randomdecodeArray8`` position gather). Zone maps prune chunks whose
    [min, max] excludes the value; inside the kernel the model-inversion
    filter narrows to candidates ``> value-1`` and an exact equality gather
    keeps matches."""
    colspecs, _ = load_schema(store)
    logical_of = dict(colspecs)
    need = list(dict.fromkeys([column] + out_cols))
    chunks = read_chunks(spark, store, columns=need)

    tgt = chunks.filter(F.col("column") == column).select(
        "run_id",
        "chunk_id",
        F.element_at("meta", "min").cast("long").alias("zmin"),
        F.element_at("meta", "max").cast("long").alias("zmax"),
    )
    v = int(value)
    alive = tgt.filter(
        (F.col("zmin").isNull() | (F.col("zmin") <= F.lit(v)))
        & (F.col("zmax").isNull() | (F.col("zmax") >= F.lit(v)))
    ).select("run_id", "chunk_id")
    pruned = chunks.join(F.broadcast(alive), ["run_id", "chunk_id"], "left_semi")

    out_schema = _decode_schema(colspecs, out_cols)

    def kernel(_key, pdf):
        import numpy as np

        n = int(pdf["n_rows"].iloc[0])
        rows = {r["column"]: r for _, r in pdf.iterrows()}
        lg = logical_of[column]
        payload = bytes(rows[column]["payload"])
        cand = column_filter_gt(payload, n, lg, v - 1)
        vals = column_gather(payload, n, lg, cand)
        vals64 = (
            vals.to_numpy().astype("datetime64[us]").view("int64")
            if lg.startswith("timestamp")
            else vals.to_numpy()
        )
        pos = cand[np.asarray(vals64 == v)]
        data = {}
        for name in out_cols:
            p = bytes(rows[name]["payload"])
            nlg = logical_of[name]
            if nlg in ("string", "double"):
                data[name] = decode_column(p, n, nlg).iloc[pos].reset_index(drop=True)
            else:
                data[name] = column_gather(p, n, nlg, pos)
        return pd.DataFrame(data, columns=out_cols)

    return pruned.groupBy("part_id", "run_id", "chunk_id").applyInPandas(kernel, out_schema)


def _decode_schema(colspecs, names):
    from ..jobs.decode import _SPARK_OF_LOGICAL

    logical_of = dict(colspecs)
    return T.StructType(
        [T.StructField(n, _SPARK_OF_LOGICAL[logical_of[n]], True) for n in names]
    )
