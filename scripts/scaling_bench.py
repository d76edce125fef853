"""North-rule scaling evidence: same extraction job at N and 4N cores,
with same-box control experiments that separate Spark's orchestration
overhead from single-machine memory contention.

A real N→4N comparison adds 4x machines (4x LLC + DRAM); this sandbox
can only add task slots on ONE memory system. Three measurements:

1. ``spark``   — the full extraction pipeline at local[8] vs local[32];
2. ``mp``      — the identical per-doc parse via raw multiprocessing
                 (no Spark, no Arrow, no shuffle) at 8 vs 32 procs:
                 the hardware ceiling for THIS workload on THIS box;
3. ``cpu``     — a pure-arithmetic spin (no memory traffic) at 8 vs 32:
                 proof the cores themselves scale (~0.86 here).

``spark_vs_hw`` = eff(spark) / eff(mp) isolates what Spark controls:
partitioning, shuffle, Arrow batching, scheduling. That is the number
a 4N-executor cluster inherits — the memory-contention term is
per-machine and does not compound across executors.

Usage: python scripts/scaling_bench.py [n_docs]   (default 60000)
Prints one JSON line; results recorded in BASELINE.md §Scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_corpus, extraction_pipeline, noop
from pdf_parser_spark.extract import extract_documents, salted
from pdf_parser_spark.session import get_spark

N_CORES, N4_CORES = 8, 32


def run_spark_at(cpus: int, corpus: str, n_docs: int) -> dict:
    """Returns best-of-3 docs/sec for (a) parse-only — the apples-to-
    apples twin of the mp control, same per-doc work — and (b) the full
    pipeline (parse + record extraction + validation), which does MORE
    per-doc work than any control and is reported as throughput, not
    used for the normalized ratio."""
    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    # local corpora are a few hundred MB — split finer than the 128 MB
    # cluster default so the scan side parallelizes too
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    def parse_only():
        # output='meta': matched work with the mp control — parse only,
        # no text/span assembly, no heavy Arrow transfer (projection
        # pushed INTO the mapper; Catalyst can't prune mapInPandas)
        pages = spark.read.parquet(corpus)
        return extract_documents(salted(pages, cpus), output="meta").select(
            "url", "n_pages", "error_code"
        )

    out = {}
    for key, job in (("parse", parse_only), ("full", lambda: extraction_pipeline(spark, corpus, cpus).drop("meta_items", "spans"))):
        noop(job())
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            noop(job())
            best = max(best, n_docs / (time.time() - t0))
        out[key] = best
    spark.stop()
    return out


def _mp_work(chunk):
    from pdf_parser_spark.pdfcore import parse_pdf

    n = 0
    for b in chunk:
        try:
            n += parse_pdf(b).num_pages
        except Exception:  # noqa: BLE001
            pass
    return n


def run_mp_at(procs: int, blobs) -> float:
    from multiprocessing import Pool

    chunks = [blobs[i::procs] for i in range(procs)]
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        with Pool(procs) as p:
            p.map(_mp_work, chunks)
        best = max(best, len(blobs) / (time.time() - t0))
    return best


def _spin(n):
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def run_cpu_at(procs: int, n=20_000_000) -> float:
    from multiprocessing import Pool

    best = 0.0
    for _ in range(3):
        t0 = time.time()
        with Pool(procs) as p:
            p.map(_spin, [n] * procs)
        best = max(best, procs * n / (time.time() - t0))
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    corpus = ensure_corpus(n_docs)

    sp_n_d = run_spark_at(N_CORES, corpus, n_docs)
    sp_4n_d = run_spark_at(N4_CORES, corpus, n_docs)
    sp_n, sp_4n = sp_n_d["parse"], sp_4n_d["parse"]

    import pyarrow.parquet as pq

    blobs = [b.as_py() for b in pq.read_table(corpus, columns=["html"])["html"]]
    mp_n = run_mp_at(N_CORES, blobs)
    mp_4n = run_mp_at(N4_CORES, blobs)
    cpu_n = run_cpu_at(N_CORES)
    cpu_4n = run_cpu_at(N4_CORES)

    eff = lambda a, b: b / (4 * a)  # noqa: E731
    e_spark, e_mp, e_cpu = eff(sp_n, sp_4n), eff(mp_n, mp_4n), eff(cpu_n, cpu_4n)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(e_spark, 3),
                "unit": "ratio",
                "docs": n_docs,
                "spark_parse_docs_per_sec": {"local8": round(sp_n, 1), "local32": round(sp_4n, 1)},
                "spark_full_pipeline_docs_per_sec": {
                    "local8": round(sp_n_d["full"], 1), "local32": round(sp_4n_d["full"], 1)
                },
                "mp_parse_docs_per_sec": {"p8": round(mp_n, 1), "p32": round(mp_4n, 1)},
                "eff": {"spark": round(e_spark, 3), "mp_hw_ceiling": round(e_mp, 3), "pure_cpu": round(e_cpu, 3)},
                "spark_vs_hw": round(e_spark / e_mp, 3),
                "pass_ge_0.8_normalized": e_spark / e_mp >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
