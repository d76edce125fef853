"""spark-submit entrypoint (north rule: ``spark-submit --py-files``).

Package and launch:

    python scripts/make_pyfiles.py               # → dist/pdf_parser_spark.zip
    spark-submit --py-files dist/pdf_parser_spark.zip \\
        pdf_parser_spark/job.py \\
        --input  s3://.../pages/         # Iceberg table or parquet dir \\
        --output s3://.../extracted/ \\
        --run-id nightly-2026-08-16 \\
        --buckets 4096                   # commit granularity \\
        --mode first_valid               # or: legacy, stream

On a real cluster the session comes from spark-submit conf; everything
here only *adds* app-level conf (AQE, Arrow batch size, LAST_WIN).
``--bench`` prints a one-line docs/sec JSON after the run — the same
number bench.py / scripts/scaling_bench.py report locally.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_session(parallelism: int | None, app: str = "pdf-parser-spark-job"):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app)
    if parallelism:  # local/bench mode; cluster mode leaves master to spark-submit
        b = b.master(f"local[{parallelism}]").config(
            "spark.sql.shuffle.partitions", str(parallelism)
        )
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages table path (parquet/Iceberg)")
    p.add_argument("--output", required=True, help="output root (extracted/ + audit/)")
    p.add_argument("--run-id", default="run")
    p.add_argument("--mode", default="first_valid", choices=["first_valid", "legacy", "stream"])
    p.add_argument("--buckets", type=int, default=64, help="commit granularity")
    p.add_argument("--local", type=int, default=None, help="local[N] master (bench/dev)")
    p.add_argument(
        "--recovery",
        action="store_true",
        help="fine-grained commit-per-bucket loop (surgical re-runs); "
        "default is the one-pass dynamic-partition-overwrite batch",
    )
    p.add_argument(
        "--decrypt-password",
        default="",
        help="password for standard-security-handler PDFs (tried as user, "
        "then owner; round-5). Implies nothing without --decrypt.",
    )
    p.add_argument(
        "--decrypt",
        action="store_true",
        help="open standard-security-handler PDFs (RC4/AESV2/AESV3, empty "
        "user password) instead of emitting typed 'encrypted' rows",
    )
    p.add_argument("--bench", action="store_true", help="print docs/sec JSON line")
    args = p.parse_args(argv)

    spark = build_session(args.local)
    from pdf_parser_spark.audit import run_extraction_with_audit
    from pdf_parser_spark.streaming import stream_extract

    t0 = time.time()
    if args.mode == "stream":
        q = stream_extract(
            spark,
            args.input,
            checkpoint_dir=f"{args.output}/checkpoint",
            output_dir=f"{args.output}/extracted",
            available_now=True,
        )
        q.awaitTermination()
        result = {"mode": "stream"}
        docs = spark.read.parquet(f"{args.output}/extracted").count()
        result["docs"] = docs
    else:
        pages = spark.read.parquet(args.input)
        result = run_extraction_with_audit(
            spark,
            pages,
            out_dir=args.output,
            run_id=args.run_id,
            n_buckets=args.buckets,
            mode=args.mode,
            recovery=args.recovery,
            decrypt=args.decrypt,
            password=args.decrypt_password.encode("latin-1"),
        )
        docs = result["metrics"]["docs"]
    wall = time.time() - t0
    if args.bench:
        print(
            json.dumps(
                {
                    "metric": "extraction_docs_per_sec",
                    "value": round(docs / wall, 1) if wall else 0.0,
                    "unit": "docs/sec",
                    "wall_sec": round(wall, 2),
                    "docs": docs,
                    "result": {k: v for k, v in result.items() if k != "metrics"},
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
