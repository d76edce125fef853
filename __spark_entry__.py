"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: the flagship pipeline on sf0.001 — synthesize a
  quote-PDF corpus (one per ``documents`` row), run the full
  read → salt → mapInPandas(from-scratch PDF parse) → native
  white-text record extraction → validation → pricing chain, and
  return per-url results including the byte-identical-text check.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  plus the north-rule training-data operators (see
  ``pdf_parser_spark/queries_ref.py`` and ``queries_data.py``).
- ``oracle_sql()``: DuckDB equivalents, generated from the SAME literal
  tier/table data the engine uses but via an independent computation
  path (``pdf_parser_spark/sqlgen.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Iterator

# make the package importable regardless of the caller's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark import pricing
from pdf_parser_spark.extract import extract_documents, salted
from pdf_parser_spark.fields import extract_record
from pdf_parser_spark.queries_capex import capex_oracle_sql, capex_queries
from pdf_parser_spark.queries_data import data_oracle_sql, data_queries
from pdf_parser_spark.queries_ref import ref_oracle_sql, ref_queries
from pdf_parser_spark.validate import with_validation


def _pages_mapper(batches):
    import datetime

    import pandas as pd

    from pdf_parser_spark.synth.pdfgen import make_quote_pdf

    epoch = datetime.datetime(2024, 1, 1)
    for b in batches:
        rows = []
        for doc_id in b["doc_id"]:
            i = int(doc_id)
            blob, golden_text, golden_wt = make_quote_pdf(i)
            rows.append(
                {
                    "url": f"https://example{i % 97}.test/doc/{i}",
                    "warc_ts": epoch + datetime.timedelta(seconds=i),
                    "html": blob,
                    "text": golden_text,
                    "lang": "en",
                }
            )
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    pages = docs.mapInPandas(
        _pages_mapper,
        schema="url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    golden = pages.select("url", F.col("text").alias("golden_text"))
    ext = extract_documents(salted(pages, parallelism=8))
    rec = extract_record(ext, mode="typed")
    rec = with_validation(rec, mode="typed", strict_quirk=False)
    # the PDF-embedded payment columns collide case-insensitively with
    # pricing's computed pay_* outputs under the default resolver
    rec = rec.drop("Pay_Upfront", "Pay_Over_Time")
    priced = pricing.compute_pricing(
        rec.withColumn("_pp", F.coalesce(F.col("Purchase_Price"), F.lit(0.0)))
        .withColumn("_lv", F.coalesce(F.col("Know_Land_Value"), F.lit(0.0)))
        .withColumn("_cx", F.coalesce(F.col("Capital_Improvements_Amount"), F.lit(0.0)))
        .withColumn("_zip", F.coalesce(F.col("Zip_Code").cast("int"), F.lit(85260)))
        .withColumn("_sqft", F.coalesce(F.col("SqFt_Building"), F.lit(0.0)))
        .withColumn("_acres", F.coalesce(F.col("Acres_Land"), F.lit(0.0)))
        .withColumn("_floors", F.lit(1.0))
        .withColumn("_nprop", F.coalesce(F.col("Multiple_Properties_Quote"), F.lit(1.0))),
        purchase_price="_pp",
        land_value="_lv",
        capex="_cx",
        zip_code="_zip",
        property_type="Type_of_Property_Quote",
        sqft_building="_sqft",
        acres_land="_acres",
        floors="_floors",
        num_properties="_nprop",
    )
    out = priced.join(golden, "url")
    return out.select(
        "url",
        "doc_type",
        "n_pages",
        (F.col("text") == F.col("golden_text")).alias("text_byte_identical"),
        "Name_of_Prospect",
        "Type_of_Property_Quote",
        "Purchase_Price",
        "is_valid",
        F.size("validation_errors").alias("n_errors"),
        "final_bid",
        "pay_upfront",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q = {}
    q.update(ref_queries())
    q.update(data_queries())
    q.update(capex_queries())
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query — EVERY query has one (round 2: the
    approximate-but-deterministic ANN ops gained generated oracles that
    replay the seeded hyperplane/centroid math in SQL)."""
    s = {}
    s.update(ref_oracle_sql())
    s.update(data_oracle_sql())
    s.update(capex_oracle_sql())
    return s
