"""Paired (interleaved) N-vs-4N scaling measurement.

scaling_bench.py runs all local[8] samples, then all local[32] samples
— minutes apart on a noisy shared host, so the ratio inherits whichever
minute each config lands in (BASELINE.md r2-s5/s6: the 8-core leg hit
quiet minutes and deflated the ratio to 0.49–0.55 while the 32-core
absolute sat at its all-time high). This script interleaves the two
configs — 8,32,8,32,... — and reports the PER-PAIR efficiency plus the
median across pairs, cancelling drift slower than one pair (~40 s).

Usage: python scripts/scaling_paired.py [n_docs] [n_pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_corpus, noop
from pdf_parser_spark.extract import extract_documents, salted
from pdf_parser_spark.session import get_spark


def time_parse_once(cpus: int, corpus: str) -> float:
    spark = get_spark(f"paired-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    def job():
        pages = spark.read.parquet(corpus)
        return extract_documents(salted(pages, cpus), output="meta").select(
            "url", "n_pages", "error_code"
        )

    noop(job())  # warm (fresh JVM each leg keeps the legs symmetric)
    t0 = time.time()
    noop(job())
    dt = time.time() - t0
    spark.stop()
    return dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = ensure_corpus(n_docs)
    pairs = []
    for _ in range(n_pairs):
        t8 = time_parse_once(8, corpus)
        t32 = time_parse_once(32, corpus)
        eff = (n_docs / t32) / (4 * (n_docs / t8))  # == t8 / (4 * t32)
        pairs.append(
            {
                "docs_per_sec_8": round(n_docs / t8, 1),
                "docs_per_sec_32": round(n_docs / t32, 1),
                "eff": round(eff, 3),
            }
        )
    print(
        json.dumps(
            {
                "metric": "paired_scaling_efficiency_8_to_32",
                "value": round(statistics.median(p["eff"] for p in pairs), 3),
                "unit": "ratio",
                "docs": n_docs,
                "pairs": pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
