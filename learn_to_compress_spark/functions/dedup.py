"""Deduplication operators for training-data pipelines.

Four families, each designed for the 100 TB shape:

* **exact** — hash-groupBy; one shuffle on the 16-byte digest, never on text.
* **MinHash + LSH** — shingle → minhash signature (one numpy pass per Arrow
  batch — no per-document Python) → band → capped bucket self-join → exact
  shingle-Jaccard verification of candidates (also one numpy pass per pair
  batch). All-pairs work is confined to LSH buckets, and hot buckets (e.g.
  near-empty documents sharing a band) are dropped by a size cap so no
  skewed key can go quadratic.
* **SimHash** — 64-bit token-vote signature computed ENTIRELY JVM-side from
  md5 token hashes (pure column expressions, whole-stage codegen, and —
  deliberately — bit-identical to a DuckDB SQL oracle); near-dup candidates
  via 4×16-bit band buckets (any pair within Hamming ≤ 3 agrees on ≥1
  band), verified by popcount.
* **embedding cosine** — see ``similarity.near_dup_pairs``.

MinHash hashing is splitmix64 over shingle bytes — deterministic across
workers and sessions (never Python's seeded ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK = (1 << 64) - 1

DEFAULT_BUCKET_CAP = 256


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return z ^ (z >> np.uint64(31))


def _batch_shingle_hashes(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for a whole batch of documents in ONE vectorized pass.

    Returns ``(hashes, bounds)``: all k-byte-window splitmix64 hashes of the
    concatenated batch (windows never cross document boundaries) and the
    per-document segment bounds into ``hashes`` (len = n_docs + 1). Hashes
    are NOT deduplicated per document — min-reduction is unaffected by
    duplicates, and Jaccard dedups on its own.
    """
    bufs = []
    for t in texts:
        b = (t or "").encode("utf-8")
        if len(b) < k:
            b = b + b"\x00" * (k - len(b))
        bufs.append(b)
    lens = np.array([len(b) for b in bufs], np.int64)
    blob = np.frombuffer(b"".join(bufs), np.uint8)
    doc_starts = np.concatenate(([0], np.cumsum(lens)))
    counts = lens - k + 1
    n_win = int(counts.sum())
    # global start index of every window (segment-local aranges, vectorized)
    seg_first = np.cumsum(counts) - counts
    base = np.repeat(doc_starts[:-1] - seg_first, counts)
    wstart = base + np.arange(n_win, dtype=np.int64)
    win = np.zeros((n_win, 8), np.uint8)
    for j in range(k):
        win[:, j] = blob[wstart + j]
    h = _splitmix64(win.view(np.uint64).ravel())
    return h, np.concatenate(([0], np.cumsum(counts)))


def _minhash_params(num_hashes: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, _MASK, size=num_hashes, dtype=np.uint64)


_CHAR_BUDGET = 1 << 20  # sub-batch bound: windows × 8 seeds × 8 B ≈ 64 MB


def _batch_signatures(texts, seeds: np.ndarray, k: int) -> np.ndarray:
    """(n_docs, n_seeds) uint64 MinHash signatures; per-document mins via
    ``np.minimum.reduceat`` over the batch's shingle hashes — no Python loop
    over documents, only over ~1 MB sub-batches and seed groups."""
    n_docs = len(texts)
    out = np.empty((n_docs, seeds.size), np.uint64)
    i = 0
    while i < n_docs:
        j, tot = i, 0
        while j < n_docs and (j == i or tot < _CHAR_BUDGET):
            tot += len(texts[j] or "")
            j += 1
        h, bounds = _batch_shingle_hashes(texts[i:j], k)
        seg_starts = bounds[:-1]
        for g in range(0, seeds.size, 8):
            sg = seeds[g : g + 8]
            mixed = _splitmix64((h[:, None] ^ sg[None, :]).ravel()).reshape(
                h.size, sg.size
            )
            out[i:j, g : g + 8] = np.minimum.reduceat(mixed, seg_starts, axis=0)
        i = j
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, signature array<long>) via a vectorized pandas UDF — the whole
    Arrow batch is hashed in one numpy pass (no per-document loop)."""
    seeds = _minhash_params(num_hashes)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            sigs = _batch_signatures(list(pdf[text_col]), seeds, shingle_k)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "signature": list(sigs.view(np.int64)),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def _cap_buckets(banded: DataFrame, cap: int, keys=("band", "bucket")) -> DataFrame:
    """Drop bucket keys with more than ``cap`` members before a bucket
    self-join — one hot key (empty-ish documents sharing a band) would
    otherwise make the join quadratic at scale. The hot-key list is tiny by
    definition, so it broadcasts into an anti-join; dropped buckets trade
    recall on degenerate duplicates for a bounded join, which exact-dedup
    already catches."""
    keys = list(keys)
    hot = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > cap)
        .select(*keys)
    )
    return banded.join(F.broadcast(hot), keys, "left_anti")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Band the signatures and self-join buckets → candidate (id_a, id_b).

    The join key is (band index, band hash): only documents agreeing on a
    whole band meet, so the shuffle is tiny relative to all-pairs; hot
    buckets beyond ``bucket_cap`` are dropped (see ``_cap_buckets``).
    """
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
    banded = _cap_buckets(banded, bucket_cap)
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


def _batch_jaccard(texts_a, texts_b, k: int) -> np.ndarray:
    """Exact shingle-Jaccard for a batch of pairs in one vectorized pass:
    per-pair distinct shingle sets via segment-sorted dedup, intersection
    counts via adjacent-duplicate detection after a (pair, hash) sort."""
    n = len(texts_a)
    ha, ba = _batch_shingle_hashes(texts_a, k)
    hb, bb = _batch_shingle_hashes(texts_b, k)

    def uniq(h, bounds):
        pair = np.repeat(np.arange(len(bounds) - 1), np.diff(bounds))
        order = np.lexsort((h, pair))
        h2, p2 = h[order], pair[order]
        keep = np.ones(h2.size, bool)
        keep[1:] = (h2[1:] != h2[:-1]) | (p2[1:] != p2[:-1])
        return h2[keep], p2[keep]

    ua, pa = uniq(ha, ba)
    ub, pb = uniq(hb, bb)
    ca = np.bincount(pa, minlength=n)
    cb = np.bincount(pb, minlength=n)
    hh = np.concatenate([ua, ub])
    pp = np.concatenate([pa, pb])
    order = np.lexsort((hh, pp))
    hh, pp = hh[order], pp[order]
    dup = (hh[1:] == hh[:-1]) & (pp[1:] == pp[:-1])
    inter = np.bincount(pp[1:][dup], minlength=n)
    union = ca + cb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


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
            jac = _batch_jaccard(list(pdf["text_a"]), list(pdf["text_b"]), shingle_k)
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
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes)
    pairs = lsh_candidate_pairs(sigs, bands, bucket_cap)
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
# SimHash — pure column expressions (JVM, whole-stage codegen); the md5-based
# token hash makes the signature reproducible in ANSI SQL, so the driver's
# DuckDB oracle can brute-force the same pairs (see queries_pipeline.py)
# --------------------------------------------------------------------------


def _md5_token_hash(tok):
    """First 64 bits of md5(token) as a signed long bit pattern — Spark
    expression; DuckDB equivalent:
    ``cast(concat('0x', substring(md5(tk), 1, 16)) as ubigint)``."""
    hx = F.md5(tok)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, entirely JVM-side.

    Per document: token hashes ``h = md5_64(token)``; bit i of the signature
    is 1 iff tokens voting 1 at bit i are at least half (vote sum ≥ 0).
    No shuffle and no Python worker — the heavy part is 64 array-filter
    expressions inside whole-stage codegen."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    hashes = F.transform(toks, _md5_token_hash)
    n_tok = F.size(hashes)
    bit_terms = []
    for i in range(64):
        ones = F.size(
            F.filter(
                hashes,
                lambda h: F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == F.lit(1),
            )
        )
        bit = (F.lit(2) * ones >= n_tok).cast("long")
        bit_terms.append(F.shiftleft(bit, i))
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig.bitwiseOR(t)
    sig = F.when(n_tok == 0, F.lit(0)).otherwise(sig)
    return df.select(F.col(id_col).cast("long").alias("id"), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    **kw,
) -> DataFrame:
    """Near-dups by SimHash: band the 64-bit signature into 4×16-bit keys
    (any pair within Hamming ≤ 3 of each other agrees on ≥1 band), capped
    bucket self-join, verify with popcount."""
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
    bands = _cap_buckets(bands, bucket_cap)
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
