"""Training-pipeline operator tests: dedup, similarity search, multimodal
plumbing, text analysis (`learn_to_compress_spark.functions`). These are
first-class engine components for the 100 TB pipeline use case; the driver
contract cross-checks the SQL-expressible ones against DuckDB, and these
tests pin the non-SQL semantics (LSH recall, Hamming verification, batch
shapes of the stubbed media kernels)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def _docs_df(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest where nobody ever goes at night"
    )
    near = base.replace("lazy", "sleepy")  # one-token change → high Jaccard
    other = "completely different content about spark columnar compression engines"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),        # exact dup of 1
        Row(doc_id=3, text=near),        # near dup of 1
        Row(doc_id=4, text=other),
        Row(doc_id=5, text=other + " with a tail"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dup_groups(spark):
    from learn_to_compress_spark.functions.dedup import exact_dup_groups

    got = exact_dup_groups(_docs_df(spark)).orderBy("keeper_id").collect()
    by_keeper = {r.keeper_id: r.dup_count for r in got}
    assert by_keeper[1] == 2  # docs 1+2 collapse
    assert by_keeper[3] == 1 and by_keeper[4] == 1 and by_keeper[5] == 1


def test_minhash_finds_near_dup_and_skips_distinct(spark):
    from learn_to_compress_spark.functions.dedup import minhash_dedup_pairs

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(_docs_df(spark), threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # exact dup always found
    assert (1, 3) in pairs or (3, 1) in pairs  # near dup
    assert not any({a, b} == {1, 4} for a, b in pairs)  # distinct docs


def test_simhash_near_dup_pairs(spark):
    from learn_to_compress_spark.functions.dedup import simhash_near_dup_pairs

    pairs = {
        frozenset((r.id_a, r.id_b))
        for r in simhash_near_dup_pairs(_docs_df(spark), max_hamming=8).collect()
    }
    assert frozenset((1, 2)) in pairs
    assert frozenset((1, 4)) not in pairs


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _emb_df(spark, n=200, dim=16):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(n, dim)).astype(np.float64)
    rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows), vecs


def test_brute_topk_exact(spark):
    from learn_to_compress_spark.functions.similarity import brute_topk

    df, vecs = _emb_df(spark)
    q = vecs[7]
    got = [r.vec_id for r in brute_topk(df, q, k=5).collect()]
    # numpy oracle
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = list(np.argsort(-sims)[:5])
    assert got == want
    assert got[0] == 7  # the query vector itself ranks first


def test_lsh_topk_recall_vs_brute(spark):
    from learn_to_compress_spark.functions.similarity import brute_topk, lsh_topk

    df, vecs = _emb_df(spark)
    q = vecs[3]
    brute = {r.vec_id for r in brute_topk(df, q, k=10).collect()}
    # n_rows sizes the plane count (footer-metadata path in production —
    # never a count job)
    lsh = {r.vec_id for r in lsh_topk(df, q, k=10, n_rows=200, multiprobe=4).collect()}
    # LSH is approximate: require meaningful recall, exact top-1 containment
    assert 3 in lsh
    assert len(brute & lsh) >= 5


def test_near_dup_pairs_banded_recall_and_cap(spark):
    """Planted near-identical vectors are all found by the banded bucket
    join; unrelated random vectors produce no pairs at the threshold."""
    from pyspark.sql import functions as F2

    from learn_to_compress_spark.functions.similarity import near_dup_pairs

    df, vecs = _emb_df(spark, n=100, dim=16)
    planted = df.filter(F2.col("vec_id") < 10).select(
        (F2.col("vec_id") + 1000).alias("vec_id"),
        F2.transform("embedding", lambda x: x * 0.9 + 0.05).alias("embedding"),
    )
    allv = df.unionAll(planted)
    pairs = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs(allv, threshold=0.95).collect()
    }
    assert {(i, i + 1000) for i in range(10)} <= pairs
    # random 16-dim gaussians can brush 0.95 cosine; planted recall is the
    # contract, absence of low-cosine pairs is checked via the threshold
    assert all(b - a == 1000 or max(a, b) < 1000 for a, b in pairs)


# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubbed; schema/batch shape real)
# ---------------------------------------------------------------------------


def test_extract_features_shape_and_determinism(spark):
    from learn_to_compress_spark.functions.multimodal import (
        _FEATURE_DIM,
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=48)
    feats = extract_features(media).collect()
    assert len(feats) == 48
    assert all(len(r.features) == _FEATURE_DIM for r in feats)
    again = extract_features(synthetic_media_df(spark, n=48)).collect()
    assert sorted(map(tuple, (r.features for r in feats))) == sorted(
        map(tuple, (r.features for r in again))
    )


def test_resize_stub_keeps_schema_updates_meta(spark):
    from learn_to_compress_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        resize_stub,
        synthetic_media_df,
    )

    out = resize_stub(synthetic_media_df(spark, n=12), 64, 48)
    assert out.schema == MEDIA_SCHEMA
    rows = out.collect()
    assert all(r.width == 64 and r.height == 48 for r in rows)
    assert all(r.payload is not None for r in rows)


def test_frame_sample_stub_rows_per_video(spark):
    from learn_to_compress_spark.functions.multimodal import (
        frame_sample_stub,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=12)
    rows_in = media.collect()
    out = frame_sample_stub(media, every_ms=1000).collect()
    expect = sum(max(1, (r.duration_ms or 0) // 1000) for r in rows_in)
    assert len(out) == expect
    assert all(r.frame_idx >= 0 and r.ts_ms >= 0 for r in out)


def test_custom_decoder_swap(spark):
    from learn_to_compress_spark.functions import multimodal as mm

    def tiny_decoder(payload: bytes) -> np.ndarray:
        return np.full(mm._FEATURE_DIM, float(len(payload)), dtype=np.float32)

    mm.set_image_decoder(tiny_decoder)
    try:
        feats = mm.extract_features(mm.synthetic_media_df(spark, n=6)).collect()
        assert all(r.features[0] == 128.0 for r in feats)  # payloads are 128 B
    finally:
        mm.set_image_decoder(mm._fake_decode_image)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_token_counts_match_manual(spark):
    from learn_to_compress_spark.functions.text import token_counts

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b  c"), Row(doc_id=2, text=""), Row(doc_id=3, text="one")]
    )
    got = {r.doc_id: r.n_tokens for r in token_counts(df).collect()}
    assert got == {1: 3, 2: 0, 3: 1}
