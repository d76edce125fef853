"""Explicit StructTypes for every table that crosses a stage boundary.

The reference declares all schemas statically (TS interfaces at
``src/types/index.ts:1-34``, Pydantic models at ``service/schemas.py``);
we do the same — nothing is inferred (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ----------------------------------------------------------------------
# input: Common-Crawl-style pages table (BASELINE.json input_hint)
# ----------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),  # golden expected text
        StructField("lang", StringType(), True),
    ]
)

# positioned text run — shape of the reference's TextItem
# (src/services/pdfParser/types.ts:4-7 + fontName of pdfParser.ts:8-15)
TEXT_ITEM_TYPE = StructType(
    [
        StructField("str", StringType(), True),
        StructField("transform", ArrayType(DoubleType()), True),
        StructField("font_name", StringType(), True),
    ]
)

# Character spans ship PACKED: one flat int array [s0,e0,s1,e1,...]
# (item i covers text[spans[2i]:spans[2i+1]]). A per-item
# struct<start,end> array costs a Python dict + an Arrow struct cell
# per item — at 10^12 docs the flat form measurably narrows the
# full-vs-parse-only Arrow-ship gap (round-3 bench) while staying
# SQL-queryable (element_at / slice; size/2 = item count).
SPAN_ARRAY_TYPE = ArrayType(IntegerType())

# ----------------------------------------------------------------------
# output of the extraction stage (extract.py mapInPandas)
# ----------------------------------------------------------------------
EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("lang", StringType(), True),
        StructField("doc_type", StringType(), True),  # pdf | html | unknown
        StructField("text", StringType(), True),  # extracted main text
        StructField("spans", SPAN_ARRAY_TYPE, True),
        StructField("n_pages", IntegerType(), True),
        StructField("n_items", IntegerType(), True),
        # text items of the metadata candidate page (first page containing
        # a '||' white-text run; legacy mode: the last page) — input to the
        # native white-text record extraction (fields.py)
        StructField("meta_items", ArrayType(TEXT_ITEM_TYPE), True),
        StructField("error_code", StringType(), True),
        StructField("error_message", StringType(), True),
        StructField("decode_fallbacks", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        # True when the doc was opened via the RC4 standard-security
        # handler (empty user password) — counted separately in audit
        StructField("decrypted", BooleanType(), True),
    ]
)

# ----------------------------------------------------------------------
# extracted 22-field quote record (src/types/index.ts:1-34 /
# metadata.ts:5-28): text/zipcode/date fields are strings, numeric and
# currency fields doubles
# ----------------------------------------------------------------------
RECORD_FIELDS = [
    ("Name_of_Prospect", "text"),
    ("Address_of_Property", "text"),
    ("Zip_Code", "zipcode"),
    ("Type_of_Property_Quote", "text"),
    ("Purchase_Price", "currency"),
    ("Capital_Improvements_Amount", "currency"),
    ("Building_Value", "currency"),
    ("Know_Land_Value", "currency"),
    ("Date_of_Purchase", "date"),
    ("CapEx_Date", "date"),
    ("SqFt_Building", "number"),
    ("Acres_Land", "number"),
    ("Year_Built", "number"),
    ("Bid_Amount_Original", "currency"),
    ("Pay_Upfront", "currency"),
    ("Pay_50_50_Amount", "currency"),
    ("Pay_Over_Time", "currency"),
    ("Rush_Fee", "currency"),
    ("Multiple_Properties_Quote", "number"),
    ("First_Year_Bonus_Quote", "currency"),
    ("Tax_Year", "number"),
    ("Tax_Deadline_Quote", "text"),
]

_TYPE_MAP = {
    "text": StringType(),
    "zipcode": StringType(),
    "date": StringType(),
    "number": DoubleType(),
    "currency": DoubleType(),
}

RECORD_SCHEMA = StructType(
    [StructField(name, _TYPE_MAP[kind], True) for name, kind in RECORD_FIELDS]
)

VALIDATION_ERROR_TYPE = StructType(
    [
        StructField("field", StringType(), True),
        StructField("message", StringType(), True),
    ]
)

# ----------------------------------------------------------------------
# audit table (per-partition lineage + metrics, north rule)
# ----------------------------------------------------------------------
AUDIT_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("docs", LongType(), True),
        StructField("bytes", LongType(), True),
        StructField("failures", LongType(), True),
        StructField("decode_fallbacks", LongType(), True),
        StructField("pdf_docs", LongType(), True),
        StructField("html_docs", LongType(), True),
        StructField("committed_at", TimestampType(), True),
    ]
)
