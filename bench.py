"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- ``value`` = wall seconds of the flagship extraction job (the north
  star is documents/sec; ``extraction_docs_per_sec`` is included).
- every query is forced with a noop sink (count() would let Catalyst
  prune the very expressions under test).
- the extraction corpus is synthesized deterministically ONCE per size
  into .bench/ (quote PDFs + HTML + corrupt + jumbo rows, seedless
  index-keyed generation — see pdf_parser_spark/synth/pages.py).

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N): run
``python scripts/scaling_bench.py`` — same job at local[8] vs
local[32]; results recorded in BASELINE.md §"Scaling evidence".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pdf_parser_spark.extract import extract_documents, salted
from pdf_parser_spark.fields import extract_record
from pdf_parser_spark.session import get_spark
from pdf_parser_spark.validate import with_validation

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000"))


def ensure_corpus(n: int) -> str:
    path = os.path.join(BENCH_DIR, f"pages_{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(BENCH_DIR, exist_ok=True)
        from pdf_parser_spark.synth.pages import write_pages_parquet

        write_pages_parquet(path, n)
    return path


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def extraction_pipeline(spark, corpus_path: str, parallelism: int = None):
    """The flagship job: read → salt → parse → record → validate."""
    pages = spark.read.parquet(corpus_path)
    ext = extract_documents(salted(pages, parallelism=parallelism or CPUS))
    rec = extract_record(ext, mode="typed")
    return with_validation(rec, mode="typed", strict_quirk=False)


def main() -> None:
    corpus = ensure_corpus(N_DOCS)
    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

    queries = {}

    # flagship extraction (timed twice; first run includes JVM/Arrow warmup)
    noop(extraction_pipeline(spark, corpus).drop("meta_items", "spans"))
    t0 = time.time()
    noop(extraction_pipeline(spark, corpus).drop("meta_items", "spans"))
    t_extract = time.time() - t0
    queries["extraction_pipeline"] = round(t_extract, 3)

    # engine + training-data headliners at SF_DIR
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in [
        "pricing_v1",
        "depr_481a",
        "depr_schedule",
        "lineitem_agg",
        "nation_revenue_topk",
        "window_cumsum",
        "events_hour_window",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "language_id",
        "quality_score",
        "token_counts",
        "ann_cosine_topk",
        "ann_rp_lsh",
    ]:
        t0 = time.time()
        noop(qs[name](spark, SF_DIR))
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "extraction_docs": N_DOCS,
                "extraction_docs_per_sec": round(N_DOCS / t_extract, 1),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
