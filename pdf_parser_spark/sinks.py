"""Row-append sinks (SURVEY §2.1 S9–S13) re-expressed as DataFrame writes.

The reference fans each extracted record out to three SaaS sinks from a
serverless function; here each sink is a deterministic column mapping +
an append-mode write, and the dual-sink partial-failure tolerance
(S13, ``Claude_Code/pdf-parser-main/src/App.tsx:79-127``: try both,
succeed if ≥1) becomes per-sink try/except with an audit row — usable
both batch-side and as a ``foreachBatch`` body in streaming.

Column orders and JS-falsy defaulting are reference-exact (cited per
function). The physical format is parquet/csv in-sandbox; on a cluster
the same writers target Iceberg/JDBC — only ``format`` changes.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ordered row of api/submit-to-google-sheets.ts:42-70 (range Sheet1!A:AA)
SHEETS_COLUMNS: List[Tuple[str, str]] = [
    ("Name_of_Prospect", "s"), ("Address_of_Property", "s"), ("Zip_Code", "s"),
    ("Purchase_Price", "n"), ("Capital_Improvements_Amount", "n"),
    ("Building_Value", "n"), ("Know_Land_Value", "n"), ("Date_of_Purchase", "s"),
    ("SqFt_Building", "n"), ("Acres_Land", "n"), ("Year_Built", "n"),
    ("Bid_Amount_Original", "n"), ("Pay_Upfront", "n"), ("Pay_50_50_Amount", "n"),
    ("Pay_Over_Time", "n"), ("Rush_Fee", "n"), ("Multiple_Properties_Quote", "n"),
    ("First_Year_Bonus_Quote", "n"), ("Tax_Year", "n"), ("Tax_Deadline_Quote", "s"),
    ("CapEx_Date", "s"), ("Type_of_Property_Quote", "s"), ("Email_from_App", "s"),
    ("Contact_Name_First", "s"), ("Contact_Name_Last", "s"), ("Contact_Phone", "s"),
]


def _falsy_default(name: str, kind: str):
    col = F.col(name) if name else F.lit(None)
    if kind == "s":
        return F.coalesce(col.cast("string"), F.lit(""))
    # JS `|| 0`: null AND 0 both → 0 (0 is already 0)
    return F.coalesce(col.cast("double"), F.lit(0.0))


def sheets_rows(records: DataFrame) -> DataFrame:
    """S9: the ordered 27-column row (26 fields + ISO timestamp)."""
    missing = set(n for n, _ in SHEETS_COLUMNS) - set(records.columns)
    cols = [
        (_falsy_default(n if n not in missing else "", k) if n in missing else _falsy_default(n, k)).alias(n)
        for n, k in SHEETS_COLUMNS
    ]
    return records.select(
        *cols,
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("Timestamp"),
    )


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and (name[i - 1].islower() or name[i - 1].isdigit()):
            out.append("_")
        out.append(ch.lower())
    return "".join(out).replace("__", "_")


def supabase_rows(records: DataFrame) -> DataFrame:
    """S10: snake_case mapping of submit-to-supabase.ts:32-61 — note the
    two per-column type quirks: zip parsed to int-or-null,
    multiple_properties stringified."""
    cols = []
    for n, k in SHEETS_COLUMNS:
        snake = _snake(n)
        if n == "Zip_Code":
            cols.append(F.col(n).cast("string").try_cast("int").alias("zip_code"))
        elif n == "Multiple_Properties_Quote":
            cols.append(
                F.coalesce(F.col(n).cast("double").cast("string"), F.lit("")).alias(
                    "multiple_properties_quote"
                )
            )
        else:
            cols.append(_falsy_default(n, k).alias(snake))
    return records.select(*cols, F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("timestamp"))


def caspio_rows(records: DataFrame) -> DataFrame:
    """S11: third sink + derived filename
    ``RCGV_{first} {last}_{address}.pdf`` (src/App.tsx:56, F17)."""
    fname = F.format_string(
        "RCGV_%s %s_%s.pdf",
        F.coalesce(F.col("Contact_Name_First"), F.lit("")),
        F.coalesce(F.col("Contact_Name_Last"), F.lit("")),
        F.coalesce(F.col("Address_of_Property"), F.lit("")),
    )
    return records.select("*", fname.alias("file_name"))


def append_sink(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    df.write.format(fmt).mode("append").save(path)


def fan_out(
    records: DataFrame,
    sinks: Dict[str, Tuple[Callable[[DataFrame], DataFrame], str]],
    run_id: str = "run",
) -> List[dict]:
    """S13: write to every sink independently; per-sink failures are
    recorded, the fan-out succeeds if ≥1 sink committed. Returns audit
    rows [{sink, ok, error, rows, ts}]."""
    results = []
    n = records.count()
    for name, (mapper, path) in sinks.items():
        rec = {"run_id": run_id, "sink": name, "rows": n, "ok": True, "error": None, "ts": time.time()}
        try:
            append_sink(mapper(records), path)
        except Exception as e:  # noqa: BLE001 — per-sink isolation is the semantic
            rec["ok"] = False
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        results.append(rec)
    if not any(r["ok"] for r in results):
        raise RuntimeError(f"all sinks failed: {results}")
    return results


def foreach_batch_fan_out(sinks, audit_path: str):
    """Streaming form: a foreachBatch body fanning out each micro-batch
    with the same ≥1-success contract, audit rows appended per batch."""

    def body(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        results = fan_out(batch_df, sinks, run_id=f"batch-{batch_id}")
        spark.createDataFrame(
            [
                (r["run_id"], r["sink"], int(r["rows"]), bool(r["ok"]), r["error"])
                for r in results
            ],
            "run_id string, sink string, rows long, ok boolean, error string",
        ).write.mode("append").parquet(audit_path)

    return body


def kv_upsert(
    spark: SparkSession, store_path: str, updates: DataFrame, key: str = "session_id"
) -> DataFrame:
    """S12 batch form: last-write-wins MERGE keyed by session — the
    draft store (service/api.py:34-49) as an idempotent overwrite.
    ``updates`` needs a ``ts`` column for ordering; latest row wins
    column-wise (whole-row semantics, like dict.update with full docs).
    """
    try:
        current = spark.read.parquet(store_path)
        merged = current.unionByName(updates, allowMissingColumns=True)
    except Exception:  # noqa: BLE001 — first write
        merged = updates
    w = Window.partitionBy(key).orderBy(F.col("ts").desc())
    latest = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    # write to a temp then swap: overwrite-while-reading is unsafe
    latest.cache().count()
    latest.write.mode("overwrite").parquet(store_path + ".tmp")
    out = spark.read.parquet(store_path + ".tmp")
    out.write.mode("overwrite").parquet(store_path)
    return spark.read.parquet(store_path)
