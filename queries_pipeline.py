"""Training-data-pipeline queries for the driver contract: dedup,
similarity search, text analysis over the ``documents`` / ``embeddings``
testdata tables. Split out of ``__spark_entry__`` for readability; every
SQL-expressible operator has a DuckDB oracle with identical column aliases.

Oracle design notes:
* MinHash pairs are graded against BRUTE-FORCE shingle-Jaccard in SQL — at
  sf0.01 the LSH pipeline (64 hashes, 16 bands) has recall 1.0, so the pair
  sets match exactly; this grades both the banding and the verifier.
* SimHash token hashes are md5-based precisely so DuckDB can recompute the
  identical 64-bit signatures and brute-force Hamming ≤ 3.
* The embeddings table has NO natural near-dups (max pairwise cosine ≈
  0.51), so the near-dup query PLANTS deterministic near-duplicates — a
  scaled+shifted copy of every vec_id < 50 — with the identical derivation
  in the oracle; cosines ≈ 0.997 (embeddings are unit-norm) vs threshold 0.95, so fp noise cannot
  flip the pair set.
* ANN-LSH is graded as recall vs the exact top-10 (same oracle as brute
  force); at the chosen plane/multiprobe settings recall is 1.0.
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


def q_dedup_ngram_jaccard(spark, sf_dir):
    """n-gram (5-byte shingle) Jaccard dedup as its own surface: LSH
    candidates verified with EXACT set-Jaccard, pair + similarity returned.
    The oracle recomputes the same Jaccard brute-force over all pairs — at
    sf0.01 LSH recall is 1.0, so the sets and values match exactly."""
    from learn_to_compress_spark.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_simhash(spark, sf_dir):
    from learn_to_compress_spark.functions.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(spark, sf_dir), max_hamming=3).select(
        "id_a", "id_b"
    )


def q_ann_brute_topk(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import brute_topk

    q = _query_vector(spark, sf_dir)
    return brute_topk(_emb(spark, sf_dir), q, k=10).select("vec_id")


def q_ann_lsh_topk(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import lsh_topk, parquet_num_rows

    q = _query_vector(spark, sf_dir)
    n = parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
    # multiprobe 3: the testdata embeddings are near-orthogonal (max pair
    # cosine ≈ 0.51), so top-10 neighbors are angularly far and need deep
    # probing for recall 1.0 vs the exact oracle
    return lsh_topk(_emb(spark, sf_dir), q, k=10, n_rows=n, multiprobe=3).select(
        "vec_id"
    )


def _with_label_clusters(spark, sf_dir) -> DataFrame:
    """Deterministic label-anchored clustered view: the raw testdata vectors
    are near-orthogonal noise (no cluster structure — IVF recall there would
    be vacuous candidate-fraction sampling), so anchor each vector at its
    label's basis direction with the raw vector as 5% noise. IVF's contract
    (high recall at nprobe/k_clusters cost on clustered data) is real on
    this shape; the oracle applies the identical transformation in SQL."""
    return _emb(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") * 0.05
            + F.when(i == F.col("label"), F.lit(1.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


def q_ann_ivf_topk(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import (
        ivf_topk,
        parquet_num_rows,
    )

    emb = _with_label_clusters(spark, sf_dir)
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).select("embedding").first()[0], np.float64
    )
    n = parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
    # k_clusters = the 10 label anchors; nprobe 3 (vs the sufficient 1) so
    # recall 1.0 never hinges on one k-means run landing perfectly
    return ivf_topk(emb, q, k=10, nprobe=3, k_clusters=10, n_rows=n).select("vec_id")


_PLANT_N = 50  # vec_ids planted as near-duplicates (scaled + shifted copies)
_PLANT_OFFSET = 1_000_000


def _with_planted(spark, sf_dir) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < _PLANT_N).select(
        (F.col("vec_id") + F.lit(_PLANT_OFFSET)).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 0.9 + 0.01).cast("double")
        ).alias("embedding"),
    )
    return emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionAll(planted)


def q_embedding_near_dups(spark, sf_dir):
    from learn_to_compress_spark.functions.similarity import near_dup_pairs

    return near_dup_pairs(_with_planted(spark, sf_dir), threshold=0.95).select(
        "id_a", "id_b"
    )


def q_dedup_clusters(spark, sf_dir):
    """Pairs → connected-component clusters (the stage that picks dedup
    survivors): cluster_id = min doc_id of the component, via min-label
    propagation over the verified MinHash pair list."""
    from learn_to_compress_spark.functions.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
    )

    pairs = minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.8)
    return dedup_clusters(pairs)


def pipeline_queries():
    return {
        "text_token_counts": q_token_counts,
        "text_quality_counts": q_quality_counts,
        "text_fingerprints": q_fingerprints,
        "text_langid": q_langid,  # oracle: heuristic recomputed in SQL
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_pairs": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_clusters": q_dedup_clusters,
        "dedup_simhash_pairs": q_dedup_simhash,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dups": q_embedding_near_dups,
    }


_BRUTE_TOPK_SQL = (
    "SELECT vec_id FROM ("
    "  SELECT vec_id, list_cosine_similarity(embedding, "
    "    (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cosine"
    "  FROM embeddings ORDER BY cosine DESC, vec_id ASC LIMIT 10)"
)

# exact top-10 over the label-anchored clustered view (same transformation
# as _with_label_clusters; DuckDB lambda index i is 1-based, Spark's 0-based)
_IVF_TOPK_SQL = """
WITH ce AS (
  SELECT vec_id, list_transform(embedding,
    (x, i) -> CAST(x AS DOUBLE) * 0.05
              + CASE WHEN i - 1 = label THEN 1.0 ELSE 0.0 END) AS e
  FROM embeddings
)
SELECT vec_id FROM (
  SELECT vec_id, list_cosine_similarity(e, (SELECT e FROM ce WHERE vec_id = 0)) AS c
  FROM ce ORDER BY c DESC, vec_id ASC LIMIT 10)
"""

# brute-force shingle(5)-Jaccard ≥ 0.8 (documents are ASCII, so DuckDB's
# char substrings equal the engine's utf-8 byte shingles)
_MINHASH_ORACLE_SQL = """
WITH sh AS (
  SELECT DISTINCT d.doc_id, substring(d.text, CAST(t.i AS INT), 5) AS s
  FROM documents d CROSS JOIN range(1, 4001) t(i)
  WHERE t.i <= length(d.text) - 4
), cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS n
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b
FROM inter JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
WHERE n * 1.0 / (ca.c + cb.c - n) >= 0.8
"""


# connected components over the SAME brute-force pair set, as a recursive
# reachability CTE: cluster label = min doc id reachable from each member
_head, _tail = _MINHASH_ORACLE_SQL.split("SELECT ia AS id_a, ib AS id_b", 1)
_CLUSTERS_ORACLE_SQL = (
    _head.rstrip().rstrip(")").replace("WITH ", "WITH RECURSIVE ", 1)
    + ")"
    + ", p AS (SELECT ia AS id_a, ib AS id_b"
    + _tail.rstrip()
    + """),
e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
r(v, w) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.v, e.b FROM r JOIN e ON r.w = e.a
)
SELECT v AS doc_id, CAST(LEAST(v, MIN(w)) AS BIGINT) AS cluster_id
FROM r GROUP BY v
"""
)

# same brute force, but returning the exact Jaccard value per pair
_NGRAM_JACCARD_ORACLE_SQL = _MINHASH_ORACLE_SQL.replace(
    "SELECT ia AS id_a, ib AS id_b",
    "SELECT ia AS id_a, ib AS id_b, "
    "round(n * 1.0 / (ca.c + cb.c - n), 6) AS jaccard",
)

# recompute the identical md5-based 64-bit SimHash signatures and
# brute-force all pairs with Hamming distance ≤ 3
_SIMHASH_ORACLE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tk FROM documents
), th AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(tk), 1, 16)) AS UBIGINT) AS h
  FROM tok
), bits AS (
  SELECT doc_id, i.i AS i,
         CASE WHEN 2 * count(*) FILTER (WHERE (h >> CAST(i.i AS INT)) & 1 = 1)
                   >= count(*)
              THEN CAST(1 AS UBIGINT) << CAST(i.i AS INT) ELSE 0 END AS term
  FROM th CROSS JOIN range(0, 64) i(i)
  GROUP BY doc_id, i.i
), sig AS (
  SELECT d.doc_id, COALESCE(CAST(s.v AS UBIGINT), 0) AS simhash
  FROM documents d LEFT JOIN (
    SELECT doc_id, CAST(sum(term) AS UBIGINT) AS v FROM bits GROUP BY doc_id
  ) s ON d.doc_id = s.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

_NEAR_DUP_ORACLE_SQL = """
WITH allv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.9 + 0.01)
  FROM embeddings WHERE vec_id < 50
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.95
"""


def _langid_oracle_sql():
    from learn_to_compress_spark.functions.text import _STOPWORDS

    cols = []
    for lang, words in _STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        cols.append(
            "len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'), "
            f"[{lst}])) AS {lang}"
        )
    langs = list(_STOPWORDS)
    g = f"greatest({', '.join(langs)})"
    cases = " ".join(f"WHEN {lang} = {g} THEN '{lang}'" for lang in langs)
    return (
        f"WITH s AS (SELECT doc_id, {', '.join(cols)} FROM documents) "
        f"SELECT doc_id, CASE WHEN {g} = 0 THEN 'unknown' {cases} END AS lang_pred "
        "FROM s"
    )


def pipeline_oracle_sql():
    return {
        # the stopword-voting heuristic recomputed verbatim in SQL (same
        # stopword lists, same first-match tie-break order)
        "text_langid": _langid_oracle_sql(),
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
        "dedup_minhash_pairs": _MINHASH_ORACLE_SQL,
        "dedup_ngram_jaccard": _NGRAM_JACCARD_ORACLE_SQL,
        "dedup_minhash_clusters": _CLUSTERS_ORACLE_SQL,
        "dedup_simhash_pairs": _SIMHASH_ORACLE_SQL,
        "ann_brute_topk": _BRUTE_TOPK_SQL,
        "ann_lsh_topk": _BRUTE_TOPK_SQL,  # graded as exactness vs brute force
        "ann_ivf_topk": _IVF_TOPK_SQL,  # exact top-10 on the clustered view
        "embedding_near_dups": _NEAR_DUP_ORACLE_SQL,
    }
