"""Compaction + vacuum (Iceberg rewrite_data_files / expire_snapshots
analogue): fragmentation detection from metadata, bit-identical rows across
the atomic lineage swap, crash-invisibility of staged runs, and vacuum of
unreferenced bytes. (SURVEY.md §2 sink/lineage rows; the reference has no
store layer at all — this is north-rule checkpoint/lineage surface.)"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from learn_to_compress_spark.chunkstore import read_lineage
from learn_to_compress_spark.jobs import (
    compact_store,
    decode_table,
    encode_table,
    fragmented_parts,
    vacuum_store,
)

CHUNK = 2048  # >> rows-per-part-per-run, so every part registers as fragmented


def _multi_run_store(spark, tmp_path, n_runs=4) -> str:
    """Micro-batch-style store: each run appends a disjoint slice of a
    synthetic transcript-shaped table into the same parts."""
    from learn_to_compress_spark.sources.transcripts import transcripts_df

    df = transcripts_df(spark, 60).cache()
    store = str(tmp_path / "store")
    for i in range(n_runs):
        sl = df.filter(F.col("turn_idx") % n_runs == i)
        encode_table(sl, store, num_parts=4, resume=False, chunk_rows=CHUNK)
    return store


def _rows(spark, store):
    return (
        decode_table(spark, store)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_compact_roundtrip_and_vacuum(spark, tmp_path):
    store = _multi_run_store(spark, tmp_path)
    before = _rows(spark, store)
    chunks_before = read_lineage(spark, store).agg(F.sum("n_chunks")).collect()[0][0]
    victims = fragmented_parts(spark, store, chunk_rows=CHUNK)
    assert victims, "micro-batch appends must register as fragmented"

    res = compact_store(spark, store, chunk_rows=CHUNK)
    assert res["compacted_parts"] == len(victims)
    after = _rows(spark, store)
    assert before.equals(after)
    chunks_after = read_lineage(spark, store).agg(F.sum("n_chunks")).collect()[0][0]
    assert chunks_after < chunks_before

    # vacuum removes the compacted-away run dirs and the stale lineage;
    # decode unchanged
    v = vacuum_store(spark, store)
    assert len(v["removed_runs"]) >= 1
    assert before.equals(_rows(spark, store))
    run_dirs = [d for d in os.listdir(f"{store}/chunks") if d.startswith("run_id=")]
    lineage_runs = {
        r.run_id for r in read_lineage(spark, store).select("run_id").distinct().collect()
    }
    assert {d.split("=", 1)[1] for d in run_dirs} == lineage_runs

    # already-compact store: no-op, nothing written
    assert compact_store(spark, store, chunk_rows=CHUNK)["compacted_parts"] == 0


def test_staged_run_invisible_until_swap(spark, tmp_path):
    """Crash-safety: chunk files from commit=False are invisible to every
    reader until the pointer swap — a compaction that dies mid-flight leaves
    the store byte-identical (the staged run is vacuumable garbage)."""
    store = _multi_run_store(spark, tmp_path, n_runs=2)
    before = _rows(spark, store)
    staged = encode_table(
        decode_table(spark, store),
        store,
        num_parts=4,
        resume=False,
        chunk_rows=CHUNK,
        commit=False,
    )
    assert staged["committed"] is False
    # the staged run dir exists on disk…
    assert os.path.isdir(f"{store}/chunks/run_id={staged['run_id']}")
    # …but rows, counts and lineage are unchanged (no duplicate visibility)
    assert before.equals(_rows(spark, store))
    assert staged["run_id"] not in {
        r.run_id for r in read_lineage(spark, store).select("run_id").collect()
    }
    # vacuum reclaims the orphan
    v = vacuum_store(spark, store)
    assert staged["run_id"] in v["removed_runs"]
    assert before.equals(_rows(spark, store))


def test_metadata_operators_after_compaction(spark, tmp_path):
    """COUNT (lineage-only) and SUM (vsum metadata) stay exact across the
    lineage version swap."""
    from learn_to_compress_spark.operators import count_rows, sum_column

    store = _multi_run_store(spark, tmp_path)
    n = count_rows(spark, store)
    s = sum_column(spark, store, "turn_idx").collect()[0][0]
    compact_store(spark, store, chunk_rows=CHUNK)
    assert count_rows(spark, store) == n
    assert sum_column(spark, store, "turn_idx").collect()[0][0] == s


def test_presorted_store_rejected(spark, tmp_path):
    from learn_to_compress_spark.sources.transcripts import transcripts_df

    store = str(tmp_path / "pre")
    encode_table(
        transcripts_df(spark, 30), store, resume=False, chunk_rows=CHUNK, presorted=True
    )
    with pytest.raises(NotImplementedError):
        compact_store(spark, store, chunk_rows=CHUNK)


def test_compact_recovers_from_orphan_version_dir(spark, tmp_path):
    """A compaction that crashed after writing lineage_v/<N> but before the
    pointer swap leaves an orphan dir; the next compaction must pick N+1
    (deriving from the pointer would collide with errorifexists and wedge
    every future compaction — ADVICE r2)."""
    store = _multi_run_store(spark, tmp_path)
    before = _rows(spark, store)
    # simulate the crash artifact: an orphan version dir the pointer ignores
    orphan = os.path.join(store, "lineage_v", f"{0:010d}")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.txt"), "w") as fh:
        fh.write("crashed compaction leftover")
    res = compact_store(spark, store, chunk_rows=CHUNK)
    assert res["compacted_parts"] > 0
    after = _rows(spark, store)
    assert before.equals(after)
    # committed version skipped the orphan
    from learn_to_compress_spark.chunkstore import lineage_current_dir

    assert lineage_current_dir(store).endswith(f"{1:010d}")


def test_compact_preserves_linked_store(spark, tmp_path):
    """Compacting a store encoded with linked_cols must keep the map (the
    staged re-encode reuses the persisted schema) and decode identically —
    the compaction rewrite races the linked codec again on the merged
    chunks."""
    import json

    from learn_to_compress_spark.sources.transcripts import transcripts_df

    df = transcripts_df(spark, 60).cache()
    store = str(tmp_path / "lnk_store")
    for i in range(3):
        sl = df.filter(F.col("turn_idx") % 3 == i)
        encode_table(
            sl, store, num_parts=4, resume=False, chunk_rows=CHUNK,
            linked_cols={"ts": "turn_idx"},
        )
    before = _rows(spark, store)
    assert compact_store(spark, store)["compacted_parts"] > 0
    vacuum_store(spark, store)
    with open(os.path.join(store, "_schema.json")) as fh:
        assert json.load(fh)["linked_cols"] == {"ts": "turn_idx"}
    after = _rows(spark, store)
    assert before["ts"].equals(after["ts"])
    assert before["text"].equals(after["text"])


def test_snapshot_time_travel_across_append_and_compaction(spark, tmp_path):
    """Iceberg-snapshot semantics: a snapshot pins the committed rows —
    later appends are invisible to it, a compaction (which rewrites into
    new runs) leaves it intact, vacuum keeps its runs alive, and only
    drop_snapshot + vacuum reclaims them."""
    import pandas as pd

    from learn_to_compress_spark.chunkstore import (
        drop_snapshot,
        list_snapshots,
        snapshot_store,
    )
    from learn_to_compress_spark.sources.transcripts import transcripts_df

    df = transcripts_df(spark, 40).cache()
    store = str(tmp_path / "snap_store")
    evens = df.filter(F.col("turn_idx") % 2 == 0)
    odds = df.filter(F.col("turn_idx") % 2 == 1)
    encode_table(evens, store, num_parts=4, resume=False, chunk_rows=CHUNK)
    sid = snapshot_store(spark, store)
    assert list_snapshots(store) == [sid]

    def sorted_pdf(sdf):
        return (
            sdf.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
        )

    before = sorted_pdf(decode_table(spark, store))

    # later append: invisible at the snapshot, visible at head
    encode_table(odds, store, num_parts=4, resume=False, chunk_rows=CHUNK)
    pd.testing.assert_frame_equal(
        sorted_pdf(decode_table(spark, store, snapshot=sid)), before
    )
    assert decode_table(spark, store).count() == df.count()

    # compaction rewrites runs; the snapshot still reads the OLD ones, and
    # vacuum must not reclaim them while the snapshot lives
    compact_store(spark, store)
    vacuum_store(spark, store)
    pd.testing.assert_frame_equal(
        sorted_pdf(decode_table(spark, store, snapshot=sid)), before
    )
    assert decode_table(spark, store).count() == df.count()

    # expire: drop_snapshot + vacuum reclaims the pinned runs
    drop_snapshot(store, sid)
    removed = vacuum_store(spark, store)
    assert removed["removed_runs"], removed
    assert decode_table(spark, store).count() == df.count()  # head unaffected
