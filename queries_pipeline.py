"""Training-data-pipeline queries for the driver contract: dedup,
similarity search, text analysis over the ``documents`` / ``embeddings``
testdata tables. Split out of ``__spark_entry__`` for readability; every
SQL-expressible operator has a DuckDB oracle with identical column aliases.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vector(spark: SparkSession, sf_dir: str) -> np.ndarray:
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == 0).select("embedding").first()
    return np.asarray(row[0], dtype=np.float64)


# --------------------------------------------------------------------------


def q_token_counts(spark, sf_dir):
    from learn_to_compress_spark.functions.text import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_quality_counts(spark, sf_dir):
    from learn_to_compress_spark.functions.text import quality_counts

    return quality_counts(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    from learn_to_compress_spark.functions.text import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    from learn_to_compress_spark.functions.text import langid

    return langid(_docs(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    from learn_to_compress_spark.functions.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir))


def q_dedup_minhash(spark, sf_dir):
    from learn_to_compress_spark.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.8).select(
        "id_a", "id_b"
    )


def q_dedup_simhash(spark, sf_dir):
    from learn_to_compress_spark.functions.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_ann_brute_topk(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import brute_topk

    q = _query_vector(spark, sf_dir)
    return brute_topk(_emb(spark, sf_dir), q, k=10).select("vec_id")


def q_ann_lsh_topk(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import lsh_topk

    q = _query_vector(spark, sf_dir)
    return lsh_topk(_emb(spark, sf_dir), q, k=10).select("vec_id")


def q_embedding_near_dups(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import near_dup_pairs

    return near_dup_pairs(_emb(spark, sf_dir), threshold=0.99).select("id_a", "id_b")


def pipeline_queries():
    return {
        "text_token_counts": q_token_counts,
        "text_quality_counts": q_quality_counts,
        "text_fingerprints": q_fingerprints,
        "text_langid": q_langid,  # rows-only (heuristic, no SQL oracle)
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_pairs": q_dedup_minhash,  # rows-only
        "dedup_simhash_pairs": q_dedup_simhash,  # rows-only
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,  # rows-only (approximate)
        "embedding_near_dups": q_embedding_near_dups,  # rows-only
    }


def pipeline_oracle_sql():
    return {
        "text_token_counts": (
            "SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"
            " AS n_tokens FROM documents"
        ),
        "text_quality_counts": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower, "
            "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit, "
            "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space, "
            "CAST(length(regexp_replace(text, '[^.,;:!?''\"-]', '', 'g')) AS BIGINT) AS n_punct "
            "FROM documents"
        ),
        "text_fingerprints": (
            "SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_md5, COUNT(*) AS dup_count, "
            "MIN(doc_id) AS keeper_id FROM documents GROUP BY md5(text)"
        ),
        "ann_brute_topk": (
            "SELECT vec_id FROM ("
            "  SELECT vec_id, list_cosine_similarity(embedding, "
            "    (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cosine"
            "  FROM embeddings ORDER BY cosine DESC, vec_id ASC LIMIT 10)"
        ),
    }
