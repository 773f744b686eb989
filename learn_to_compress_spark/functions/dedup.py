"""Deduplication operators for training-data pipelines.

Four families, each designed for the 100 TB shape:

* **exact** — hash-groupBy; one shuffle on the 16-byte digest, never on text.
* **MinHash + LSH** — shingle → minhash signature (vectorized pandas UDF,
  numpy only) → band → bucket self-join → exact-Jaccard verification of
  candidates. All-pairs work is confined to LSH buckets.
* **SimHash** — 64-bit token-weight signature; near-dup candidates via
  4×16-bit band buckets, verified by Hamming distance.
* **embedding cosine** — see ``similarity.near_dup_pairs``.

Hashing is splitmix64 over padded token/shingle bytes — deterministic across
workers and sessions (never Python's seeded ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK = (1 << 64) - 1


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return z ^ (z >> np.uint64(31))


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle hashes of a document, vectorized."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size - k + 1
    # build (n, 8) windows padded to uint64 lanes
    win = np.zeros((n, 8), dtype=np.uint8)
    for j in range(k):
        win[:, j] = arr[j : j + n]
    h = _splitmix64(win.view(np.uint64).ravel())
    return np.unique(h)


# MinHash family: sig_i = min over shingles of splitmix64(h ^ seed_i)
# (xorshift family — fully vectorized in uint64, no 128-bit modmul needed)


def _minhash_params(num_hashes: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, _MASK, size=num_hashes, dtype=np.uint64)


def _signature(h: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    # (n_shingles, k) uint64 matrix; min along shingles per hash function
    mixed = _splitmix64((h[:, None] ^ seeds[None, :]).ravel()).reshape(h.size, seeds.size)
    return mixed.min(axis=0)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, signature array<long>) via a vectorized pandas UDF."""
    seeds = _minhash_params(num_hashes)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                h = _shingle_hashes(text or "", shingle_k)
                sig = _signature(h, seeds).view(np.int64)  # long-typed for Spark
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and self-join buckets → candidate (id_a, id_b).

    The join key is (band index, band hash): only documents agreeing on a
    whole band meet, so the shuffle is tiny relative to all-pairs.
    """
    n_hashes = None  # derived per-row; band width = len(sig)/bands
    banded = sigs.select(
        F.col("id"),
        F.posexplode(
            F.transform(
                F.array([F.lit(i) for i in range(bands)]),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        b * (F.size(F.col("signature")) / bands).cast("int") + 1,
                        (F.size(F.col("signature")) / bands).cast("int"),
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def verify_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs → (id_a, id_b, jaccard)."""
    texts = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    joined = (
        pairs.join(texts, pairs.id_a == texts._id)
        .withColumnRenamed("_text", "text_a")
        .drop("_id")
        .join(texts, pairs.id_b == texts._id)
        .withColumnRenamed("_text", "text_b")
        .drop("_id")
    )

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            jac = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                ha = _shingle_hashes(ta or "", shingle_k)
                hb = _shingle_hashes(tb or "", shingle_k)
                inter = np.intersect1d(ha, hb, assume_unique=True).size
                union = ha.size + hb.size - inter
                jac.append(inter / union if union else 1.0)
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac}
            )

    out = joined.mapInPandas(kernel, schema)
    return out.filter(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes)
    pairs = lsh_candidate_pairs(sigs, bands)
    return verify_jaccard(pairs, df, id_col, text_col, threshold)


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via hash-groupBy: (text_md5, dup_count, keeper_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keeper_id"),
        )
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized pandas UDF)."""
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("simhash", T.LongType())]
    )

    def one(text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        # hash each token: pad/truncate to 8 bytes → splitmix64
        buf = np.zeros((len(toks), 8), dtype=np.uint8)
        for i, t in enumerate(toks):
            b = t.encode("utf-8")[:8]
            buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        h = _splitmix64(buf.view(np.uint64).ravel())
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = int(((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        return sig - (1 << 64) if sig >= 1 << 63 else sig

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "simhash": [one(t) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dups by SimHash: band the 64-bit signature into 4×16-bit keys
    (any pair within Hamming ≤ 3 of each other agrees on ≥1 band), bucket
    self-join, verify with popcount."""
    sigs = simhash_signatures(df, **kw)
    bands = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )
