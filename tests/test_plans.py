"""Assert the physical-plan properties the scale design depends on:
column-predicate pushdown to the chunk-store Parquet scan, and column
pruning (payload bytes unread for metadata-only paths)."""

from pyspark.sql import functions as F

from learn_to_compress_spark.chunkstore import read_chunks, read_lineage
from learn_to_compress_spark.jobs import encode_table
from learn_to_compress_spark.plans import pushed_filters, scan_read_schema
from learn_to_compress_spark.sources.transcripts import transcripts_df


def test_column_filter_reaches_parquet_scan(spark, tmp_path):
    store = str(tmp_path / "plan_store")
    encode_table(transcripts_df(spark, 60, parallelism=2), store, num_parts=4)

    one_col = read_chunks(spark, store, columns=["turn_idx"])
    pushed = pushed_filters(one_col)
    assert any("column" in p for p in pushed), pushed

    # lineage-only COUNT plan must not read the payload column
    lin = read_lineage(spark, store).agg(F.sum("n_rows"))
    for fields in scan_read_schema(lin):
        assert "payload" not in fields, fields


def test_sum_scan_prunes_payloadless_columns(spark, tmp_path):
    """The sum operator's scan reads only the target column's chunk rows:
    the `column = X` predicate appears in PushedFilters."""
    store = str(tmp_path / "plan_store2")
    encode_table(transcripts_df(spark, 60, parallelism=2), store, num_parts=4)
    from learn_to_compress_spark.operators import sum_column

    plan = sum_column(spark, store, "turn_idx")
    pushed = pushed_filters(plan)
    assert any("turn_idx" in p or "column" in p for p in pushed), pushed
