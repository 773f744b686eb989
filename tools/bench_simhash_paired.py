"""Paired A/B attribution for the r3 dedup_simhash bench regression
(VERDICT r3 "What's wrong" #2): run the persist-SIGNATURES shape (banded
rows recomputed per pass — the shipped shape, functions/dedup.py) against
the persist-BANDS shape the VERDICT hypothesized would be faster,
interleaved in the same noise window so the shared box's CPU drift hits
both variants equally.

MEASURED OUTCOME (sf0.1, local[32], 3 interleaved rounds): persist-sigs
best 2.62 s, persist-bands best 6.44 s — the hypothesis is REJECTED.
The 64-expression signature stage is the expensive part; caching the n
narrow signature rows beats caching the 4n-row posexplode output whose
projection is four shift-ANDs. r3's 9.12 s bench wall was box drift, not
a plan defect: the unchanged plan times 2.6 s in a clean window.
(Variable names below: "old" = persist-sigs = shipped; "new" =
persist-bands = rejected experiment.)

Usage: python tools/bench_simhash_paired.py [sf_dir] [cpus] [rounds]
Prints one JSON line with per-round walls and the paired speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_pairs_persist_bands(df: DataFrame, max_hamming: int = 3, bucket_cap: int = 2000):
    """The REJECTED experiment: persist the 4n-row banded projection instead
    of the n signature rows (VERDICT r3's hypothesis). Kept here so the
    A/B stays reproducible."""
    from learn_to_compress_spark.functions.dedup import (
        _simhash_pairs,
        simhash_signatures,
    )

    sigs = simhash_signatures(df)
    bands_raw = sigs.select(
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
    bands = bands_raw.persist(StorageLevel.MEMORY_AND_DISK)
    keys = ["band", "bucket"]
    hot = (
        bands.groupBy(*keys)
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > bucket_cap)
        .select(*keys)
    )
    assert hot.limit(1).count() == 0, "fixture unexpectedly has hot buckets"
    pairs = _simhash_pairs(bands, keys).distinct()
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    out = pairs.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )
    n = out.count()
    bands.unpersist()
    return n


def simhash_pairs_shipped(df: DataFrame, max_hamming: int = 3):
    """The shipped shape (functions/dedup.py): persist sigs, recompute the
    cheap banding projection per pass."""
    from learn_to_compress_spark.functions.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(df, max_hamming=max_hamming).count()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from learn_to_compress_spark.sources.session import get_spark

    spark = get_spark(f"local[{cpus}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm pass (small slice): worker machinery + page faults, untimed
    simhash_pairs_shipped(docs.limit(500))
    results = {"shipped": [], "bands": []}
    n_a = n_b = None
    for _ in range(rounds):
        t0 = time.monotonic()
        n_a = simhash_pairs_shipped(docs)
        results["shipped"].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.monotonic()
        n_b = simhash_pairs_persist_bands(docs)
        results["bands"].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
    assert n_a == n_b, (n_a, n_b)
    best_a, best_b = min(results["shipped"]), min(results["bands"])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "pairs": n_a,
                "shipped_persist_sigs_sec": results["shipped"],
                "rejected_persist_bands_sec": results["bands"],
                "best_shipped": best_a,
                "best_rejected": best_b,
                "shipped_vs_rejected": round(best_b / best_a, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
