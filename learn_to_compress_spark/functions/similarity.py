"""Similarity search over embedding columns (``array<float>``).

* **brute_topk** — exact cosine top-k with pure column expressions
  (``zip_with`` + ``aggregate``, JVM-side, whole-stage codegen); the
  baseline and the verifier for the approximate paths.
* **lsh_topk** — random-hyperplane LSH: a signature bucket prefilter
  (broadcast hyperplanes, vectorized pandas UDF), exact cosine only within
  candidate buckets. The scale path: at 10^12 rows the bucket filter prunes
  the scan before any float math runs. Plane count comes from Parquet
  footer metadata (driver-side, no scan) or an explicit parameter — never
  from a ``df.count()`` job.
* **near_dup_pairs** — embedding near-duplicates (cosine ≥ threshold) via a
  BANDED bucket join (B bands × r planes: a near-dup pair colliding in ≥1
  band is found with prob ``1-(1-p^r)^B`` — OR-amplification keeps recall
  near 1 where a single wide bucket would miss ~20% of pairs), with a
  bucket-size cap so no hot bucket can go quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parquet_num_rows(path: str) -> int:
    """Total row count from Parquet footers — driver-side metadata only,
    no Spark job and no data scan."""
    import pyarrow.dataset as ds

    total = 0
    for frag in ds.dataset(path, format="parquet").get_fragments():
        total += frag.metadata.num_rows
    return total


def _cosine_col(vec_col: str, q: np.ndarray):
    """cosine(embedding, q) as a double column — all arithmetic in float64
    JVM-side."""
    qn = q / np.linalg.norm(q)
    qlit = F.array(*[F.lit(float(x)) for x in qn])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / norm


def brute_topk(
    df: DataFrame,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered by (-cosine, id)."""
    scored = df.select(
        F.col(id_col), _cosine_col(vec_col, np.asarray(query, np.float64)).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign pattern of random-hyperplane projections."""
    planes = _hyperplanes(dim, n_planes)

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("bucket", T.LongType())]
    )

    def kernel(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) >= 0
            buckets = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "bucket": buckets.view(np.int64)}
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def planes_for_rows(n_rows: int) -> int:
    """Plane count giving ~64-vector buckets; clamped to [2, 20]."""
    return int(np.clip(np.log2(max(n_rows, 1) / 64 + 1) + 1, 2, 20))


def _query_buckets(q: np.ndarray, n_planes: int, multiprobe: int = 1) -> list[int]:
    """Query bucket plus all Hamming≤multiprobe neighbors (flip low-margin
    bits first would be better; flipping all is fine at ≤20 planes)."""
    planes = _hyperplanes(len(q), n_planes)
    base = int(
        ((planes @ q >= 0).astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(
            dtype=np.uint64
        )
    )
    from itertools import combinations

    buckets = {base}
    for d in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), d):
            m = 0
            for i in bits:
                m |= 1 << i
            buckets.add(base ^ m)
    return [b - (1 << 64) if b >= 1 << 63 else b for b in buckets]


def lsh_topk(
    df: DataFrame,
    query: np.ndarray,
    k: int = 10,
    n_planes: int | None = None,
    n_rows: int | None = None,
    multiprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k: bucket prefilter → exact cosine on the
    candidate set only.

    Sizing: pass ``n_planes`` directly, or ``n_rows`` (e.g. from
    :func:`parquet_num_rows` footer metadata) to derive it — too many planes
    on a small table empties every probe bucket. No count job is ever run.

    ``sigs``: a precomputed :func:`lsh_signatures` frame (persisted/
    partitioned by ``bucket`` in production, like the :func:`ivf_assign`
    index) so per-query work is a pruned probe instead of a full signature
    pass; ``n_planes`` must then match the index."""
    q = np.asarray(query, np.float64)
    dim = len(q)
    if n_planes is None:
        if n_rows is None:
            raise ValueError("pass n_planes or n_rows (e.g. parquet_num_rows(path))")
        n_planes = planes_for_rows(n_rows)
    if sigs is None:
        sigs = lsh_signatures(df, dim, n_planes, id_col, vec_col)
    cand_buckets = _query_buckets(q, n_planes, multiprobe)
    cand_ids = sigs.filter(F.col("bucket").isin(cand_buckets)).select(
        F.col("id").alias(id_col)
    )
    cands = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    return brute_topk(cands, q, k, id_col, vec_col)


def banded_signatures(
    df: DataFrame,
    dim: int,
    bands: int = 6,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) — one signature per band from independent
    hyperplane sets (rows of one (bands·r, dim) seed-42 matrix)."""
    planes = _hyperplanes(dim, bands * planes_per_band)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    r = planes_per_band

    def kernel(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) >= 0  # (n, bands*r)
            ids = pdf[id_col].astype("int64").to_numpy()
            out_id, out_band, out_bucket = [], [], []
            weights = 1 << np.arange(r, dtype=np.uint64)
            for b in range(bands):
                seg = signs[:, b * r : (b + 1) * r].astype(np.uint64)
                buckets = (seg * weights).sum(axis=1, dtype=np.uint64)
                out_id.append(ids)
                out_band.append(np.full(ids.size, b, np.int32))
                out_bucket.append(buckets.view(np.int64))
            yield pd.DataFrame(
                {
                    "id": np.concatenate(out_id),
                    "band": np.concatenate(out_band),
                    "bucket": np.concatenate(out_bucket),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bands: int = 6,
    planes_per_band: int = 8,
    bucket_cap: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates: banded bucket self-join (OR-amplified
    recall) → exact cosine ≥ threshold. Hot buckets beyond ``bucket_cap``
    are dropped (broadcast anti-join) so one degenerate bucket can never go
    quadratic. Returns (id_a, id_b, cosine)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    from pyspark import StorageLevel

    from .dedup import _cap_buckets

    sigs = banded_signatures(df, dim, bands, planes_per_band, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = _cap_buckets(sigs, bucket_cap)
    l, r = sigs.alias("l"), sigs.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    joined = (
        cand.join(vecs, cand.id_a == vecs._id)
        .withColumnRenamed("_v", "vec_a")
        .drop("_id")
        .join(vecs, cand.id_b == vecs._id)
        .withColumnRenamed("_v", "vec_b")
        .drop("_id")
    )
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda a: a.cast("double") * a.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    cos = (dot / (norm(F.col("vec_a")) * norm(F.col("vec_b")))).alias("cosine")
    return joined.select("id_a", "id_b", cos).filter(F.col("cosine") >= threshold)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH.
#
# IVF-Flat as in the published FAISS design (Johnson, Douze, Jégou,
# "Billion-scale similarity search with GPUs", 2017): spherical k-means
# centroids partition the vector space; each vector is assigned to its
# nearest centroid (the "inverted list"); a query scans only the ``nprobe``
# nearest lists. On a cluster the inverted list id doubles as a Hive
# partition key, so probing is parquet partition PRUNING — the 100 TB query
# reads nprobe/k_clusters of the bytes before any float math runs.
# Training is on a deterministic hash-sample collected to the driver: the
# sample size (and therefore driver memory) is fixed and independent of
# table size.


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    k_clusters: int = 16,
    sample_target: int = 8192,
    n_rows: int | None = None,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means centroids (unit-norm, cosine metric), trained on a
    deterministic hash-sample of ≤ ~2×``sample_target`` vectors.

    Sampling is ``xxhash64(id) pmod m == 0`` with ``m`` derived from
    ``n_rows`` (pass :func:`parquet_num_rows` — footer metadata, no count
    job); the collect is bounded regardless of table size. Seeded k-means++
    init + Lloyd iterations, all numpy, fully deterministic."""
    if n_rows is not None and n_rows > sample_target:
        m = max(int(n_rows // sample_target), 1)
        df = df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    rows = df.select(vec_col).limit(4 * sample_target).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k_clusters, len(X))
    rng = np.random.default_rng(42)
    # k-means++ seeding under cosine distance (1 - dot on unit vectors)
    cents = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d = 1.0 - np.max(np.stack([X @ c for c in cents]), axis=0)
        d = np.clip(d, 0.0, None)
        p = d / d.sum() if d.sum() > 0 else np.full(len(X), 1.0 / len(X))
        cents.append(X[rng.choice(len(X), p=p)])
    C = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            mem = X[assign == j]
            if len(mem):
                v = mem.sum(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) inverted-list assignment — one shuffle-free
    ``mapInPandas`` pass; centroids ship in the task closure (k×dim floats).

    Persist this (or the source rows + ``cluster``) partitioned by
    ``cluster`` to make query-time probing a partition-pruned scan."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("cluster", T.IntegerType())]
    )

    def kernel(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64").to_numpy(),
                    "cluster": np.argmax(mat @ C.T, axis=1).astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def ivf_topk(
    df: DataFrame,
    query: np.ndarray,
    k: int = 10,
    centroids: np.ndarray | None = None,
    nprobe: int = 4,
    k_clusters: int = 16,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF: rank centroids against the query on
    the driver (k_clusters dots — trivial), keep the ``nprobe`` nearest
    lists, exact cosine only on their members. Candidate fraction ≈
    nprobe/k_clusters of the table. Pass precomputed ``centroids`` to skip
    training (the production shape: train once, index once, query many).

    The scan assigns AND scores in one shuffle-free ``mapInPandas`` pass —
    no candidate join of any size; the only exchange is the k-row top-k.
    With a persisted :func:`ivf_assign` index (store partitioned by
    ``cluster``) the probe filter becomes parquet partition pruning and the
    scan touches only nprobe/k_clusters of the bytes."""
    q = np.asarray(query, np.float64)
    if centroids is None:
        centroids = train_ivf_centroids(
            df, len(q), k_clusters, n_rows=n_rows, id_col=id_col, vec_col=vec_col
        )
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(C @ qn))[: min(nprobe, len(C))]
    probe_mask = np.zeros(len(C), dtype=bool)
    probe_mask[order] = True
    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("cosine", T.DoubleType())]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
            unit = mat / norms[:, None]
            keep = probe_mask[np.argmax(unit @ C.T, axis=1)]
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64").to_numpy()[keep],
                    "cosine": (unit[keep] @ qn),
                }
            )

    scored = df.select(id_col, vec_col).mapInPandas(kernel, schema)
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
