"""Chunk store + lineage catalog — the Iceberg-style table layer.

The reference keeps compressed blocks as in-process ``uint8_t*`` descriptors
(``experiments/fix_int.cpp:58-79``); our descriptors are rows of a chunk-store
table (SURVEY.md §1.2):

``(part_id int, chunk_id long, column string, codec string, n_rows int,
  payload binary, meta map<string,string>)``

written as Parquet, with a **lineage** side table providing Iceberg-like
commit semantics in this sandbox (no Iceberg jars): a partition's chunks are
visible only if a lineage row ``(part_id, run_id, metrics...)`` exists. Data
files are written before lineage, so a killed job leaves orphan chunk rows
that readers never see, and a resumed job re-encodes only parts without
lineage — idempotent, atomic per partition. On a real deployment this maps
1:1 to Iceberg table commits + a metrics table; only this module would change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n_rows", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# chunk rows as read back (data columns + the run_id partition column from
# the Hive-style ``run_id=<id>`` directory the run wrote into);
# note StructType.add mutates, so build a fresh StructType here
CHUNK_RUN_SCHEMA = T.StructType(
    list(CHUNK_SCHEMA.fields) + [T.StructField("run_id", T.StringType(), True)]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("n_chunks", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)


def chunks_path(store: str) -> str:
    return os.path.join(store, "chunks")


def lineage_path(store: str) -> str:
    return os.path.join(store, "lineage")


def read_lineage(spark: SparkSession, store: str) -> DataFrame:
    path = lineage_path(store)
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def committed_parts(spark: SparkSession, store: str) -> DataFrame:
    """(part_id, run_id) pairs that are visible.

    Every lineage row is a commit: batch resume never re-encodes a committed
    part (so at most one batch run per part), while streaming appends commit
    one run per micro-batch into the same parts. Chunks from a run that died
    before its lineage write have no pair here and stay invisible — that is
    the Iceberg-style atomicity contract."""
    return read_lineage(spark, store).select("part_id", "run_id").distinct()


def read_chunks(
    spark: SparkSession, store: str, columns: list[str] | None = None
) -> DataFrame:
    """Visible chunk rows (semi-joined against committed lineage).

    ``columns`` prunes to the named table columns — this predicate reaches
    the Parquet scan (row-group pruning on the ``column`` field), so a
    single-column pushdown query never reads other columns' payload bytes.
    """
    # chunk files live in Hive-style ``run_id=<id>`` partition dirs; with an
    # explicit schema Spark fills ``run_id`` from the directory names, and a
    # filter on it prunes whole run directories at the file listing
    df = spark.read.schema(CHUNK_RUN_SCHEMA).parquet(chunks_path(store))
    if columns is not None:
        df = df.filter(F.col("column").isin(columns))
    commits = committed_parts(spark, store)
    return df.join(F.broadcast(commits), ["part_id", "run_id"], "left_semi")
