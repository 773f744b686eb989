"""spark-submit entry point — the north-rule deployment contract.

On a real multi-executor cluster:

    python -c "from learn_to_compress_spark.sources.session import build_pyfiles_zip; print(build_pyfiles_zip())"
    spark-submit --py-files /tmp/learn_to_compress_spark_pkg_<digest>.zip \
        tools/submit_job.py encode --input s3://…/transcripts --store s3://…/store
    spark-submit --py-files … tools/submit_job.py decode --store … [--verify-against …]
    spark-submit --py-files … tools/submit_job.py resume --input … --store …
    spark-submit --py-files … tools/submit_job.py compact --store … [--vacuum]

The script builds no master/local config of its own — spark-submit supplies
the cluster; it only applies the engine's session settings (AQE + skew join,
Arrow batch = chunk, malloc tuning via spark.executorEnv). ``resume`` is
``encode`` with lineage-gated skip of committed partitions (idempotent —
safe to rerun after a kill, SURVEY.md §7).

In-sandbox this same file runs under ``spark-submit --master local[k]``;
the driver-contract tests exercise the identical code path through
``encode_table``/``decode_table``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="submit_job")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("encode", "resume"):
        p = sub.add_parser(name)
        p.add_argument("--input", required=True, help="input table path (parquet)")
        p.add_argument("--store", required=True, help="chunk store path")
        p.add_argument("--key-cols", default="conv_id,turn_idx")
        p.add_argument("--num-parts", type=int, default=None)
        p.add_argument("--selection", default="exact", choices=["exact", "learned"])
    p = sub.add_parser("decode")
    p.add_argument("--store", required=True)
    p.add_argument("--output", default=None, help="write decoded rows here (parquet)")
    p.add_argument("--verify-against", default=None, help="original table to compare")
    p = sub.add_parser("compact", help="rewrite fragmented partitions (atomic swap)")
    p.add_argument("--store", required=True)
    p.add_argument("--min-fill", type=float, default=0.5)
    p.add_argument("--min-runs", type=int, default=2)
    p.add_argument("--vacuum", action="store_true", help="expire unreferenced bytes after the swap")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from learn_to_compress_spark.sources.session import tune_malloc

    tune_malloc()
    spark = (
        SparkSession.builder.appName(f"ltc-{args.cmd}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(1 << 30))
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", str(1 << 30))
        .getOrCreate()
    )

    if args.cmd in ("encode", "resume"):
        from learn_to_compress_spark.jobs import encode_table

        df = spark.read.parquet(args.input)
        metrics = encode_table(
            df,
            args.store,
            key_cols=tuple(args.key_cols.split(",")),
            num_parts=args.num_parts,
            resume=(args.cmd == "resume"),
            selection=args.selection,
        )
        print(json.dumps(metrics))
        return 0

    if args.cmd == "compact":
        from learn_to_compress_spark.jobs import compact_store, vacuum_store

        res = compact_store(spark, args.store, min_fill=args.min_fill, min_runs=args.min_runs)
        if args.vacuum and res["compacted_parts"]:
            res["vacuum"] = vacuum_store(spark, args.store)
        print(json.dumps(res))
        return 0

    from learn_to_compress_spark.jobs import decode_table

    dec = decode_table(spark, args.store)
    if args.output:
        dec.write.mode("overwrite").parquet(args.output)
    if args.verify_against:
        raw = spark.read.parquet(args.verify_against)
        diff = dec.exceptAll(raw).count() + raw.exceptAll(dec).count()
        print(json.dumps({"rows": raw.count(), "diff_rows": diff, "bit_identical": diff == 0}))
        return 0 if diff == 0 else 1
    print(json.dumps({"rows": dec.count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
