"""Sinks (S9-S13), KV upsert, and the S4/S5 ladder loader."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark import pricing, sinks

RECORDS = [
    dict(
        Name_of_Prospect="Prospect A", Address_of_Property="1 Main St",
        Zip_Code="85260", Purchase_Price=1_000_000.0,
        Capital_Improvements_Amount=0.0, Building_Value=850_000.0,
        Know_Land_Value=150_000.0, Date_of_Purchase="06/15/2024",
        SqFt_Building=38_000.0, Acres_Land=2.0, Year_Built=1995.0,
        Bid_Amount_Original=1908.19, Pay_Upfront=1736.45,
        Pay_50_50_Amount=954.10, Pay_Over_Time=477.05, Rush_Fee=0.0,
        Multiple_Properties_Quote=1.0, First_Year_Bonus_Quote=300_000.0,
        Tax_Year=2025.0, Tax_Deadline_Quote="October", CapEx_Date="07/01/2024",
        Type_of_Property_Quote="Multi Family", Email_from_App="a@b.co",
        Contact_Name_First="Ada", Contact_Name_Last="Lovelace",
        Contact_Phone="555-0100",
    ),
    dict(
        Name_of_Prospect=None, Address_of_Property="2 Oak Ave", Zip_Code=None,
        Purchase_Price=None, Capital_Improvements_Amount=None,
        Building_Value=None, Know_Land_Value=None, Date_of_Purchase=None,
        SqFt_Building=None, Acres_Land=None, Year_Built=None,
        Bid_Amount_Original=None, Pay_Upfront=None, Pay_50_50_Amount=None,
        Pay_Over_Time=None, Rush_Fee=None, Multiple_Properties_Quote=None,
        First_Year_Bonus_Quote=None, Tax_Year=None, Tax_Deadline_Quote=None,
        CapEx_Date=None, Type_of_Property_Quote=None, Email_from_App=None,
        Contact_Name_First=None, Contact_Name_Last=None, Contact_Phone=None,
    ),
]


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(RECORDS)


def test_sheets_rows_order_and_defaults(spark, records):
    out = sinks.sheets_rows(records)
    assert out.columns == [n for n, _ in sinks.SHEETS_COLUMNS] + ["Timestamp"]
    rows = {r["Address_of_Property"]: r for r in out.collect()}
    full = rows["1 Main St"]
    assert full["Purchase_Price"] == 1_000_000.0
    empty = rows["2 Oak Ave"]
    assert empty["Name_of_Prospect"] == ""  # JS `|| ''`
    assert empty["Purchase_Price"] == 0.0  # JS `|| 0`
    assert empty["Timestamp"].endswith("Z")


def test_supabase_rows_snake_and_quirks(spark, records):
    out = sinks.supabase_rows(records)
    assert "name_of_prospect" in out.columns
    assert "pay_50_50_amount" in out.columns
    rows = {r["address_of_property"]: r for r in out.collect()}
    assert rows["1 Main St"]["zip_code"] == 85260  # int-parsed
    assert rows["2 Oak Ave"]["zip_code"] is None  # null stays null
    assert rows["1 Main St"]["multiple_properties_quote"] == "1.0"  # stringified


def test_caspio_filename(spark, records):
    out = sinks.caspio_rows(records)
    got = {r["Address_of_Property"]: r["file_name"] for r in out.collect()}
    assert got["1 Main St"] == "RCGV_Ada Lovelace_1 Main St.pdf"


def test_fan_out_partial_failure(spark, records, tmp_path):
    ok_path = str(tmp_path / "sheets")

    def boom(df):
        raise IOError("sink down")

    results = sinks.fan_out(
        records,
        {
            "sheets": (sinks.sheets_rows, ok_path),
            "supabase": (boom, str(tmp_path / "nope")),
        },
    )
    by = {r["sink"]: r for r in results}
    assert by["sheets"]["ok"] and not by["supabase"]["ok"]
    assert "sink down" in by["supabase"]["error"]
    assert spark.read.parquet(ok_path).count() == 2
    # all-fail → raises (S13 contract: succeed iff >= 1)
    with pytest.raises(RuntimeError):
        sinks.fan_out(records, {"a": (boom, "x"), "b": (boom, "y")})


def test_kv_upsert_last_write_wins(spark, tmp_path):
    store = str(tmp_path / "drafts")
    u1 = spark.createDataFrame(
        [("s1", 1, "A", 10.0), ("s2", 1, "B", 20.0)],
        "session_id string, ts long, name string, price double",
    )
    out1 = sinks.kv_upsert(spark, store, u1)
    assert out1.count() == 2
    u2 = spark.createDataFrame(
        [("s1", 2, "A2", 11.0), ("s3", 1, "C", 30.0)],
        "session_id string, ts long, name string, price double",
    )
    out2 = sinks.kv_upsert(spark, store, u2)
    got = {r["session_id"]: r for r in out2.collect()}
    assert len(got) == 3
    assert got["s1"]["name"] == "A2" and got["s1"]["price"] == 11.0  # last wins
    assert got["s2"]["name"] == "B"  # untouched key survives


# ----------------------------------------------------------------------
# S4/S5 ladder loading
# ----------------------------------------------------------------------
def test_ladder_csv_discovery(tmp_path, spark):
    csv = tmp_path / "vlookup.csv"
    csv.write_text(
        ",,,\n"
        ",,,\n"
        "Cost Basis,Cost Basis Factor,Zip Code,Zip Code Factor\n"
        "0,1.0,0,1.11\n"
        "250000,1.01,10000,1.1\n"
        "500000,1.02,20000,1.05\n"
        "notanumber,x,30000,1.0\n"
    )
    tables = pricing.load_ladder_tables(
        str(csv),
        [("Cost Basis", "Cost Basis Factor"), ("Zip Code", "Zip Code Factor")],
    )
    assert tables["Cost Basis"] == [(0.0, 1.0), (250000.0, 1.01), (500000.0, 1.02)]
    assert len(tables["Zip Code"]) == 4
    # feed the discovered ladder through the broadcast range join
    dim = pricing.ladder_dim_from_table(spark, tables["Cost Basis"], name="cb_factor")
    df = spark.createDataFrame([(1, 100.0), (2, 260000.0), (3, 9e9)], "id long, x double")
    got = {r["id"]: r["cb_factor"] for r in pricing.ladder_join(df, "x", dim).collect()}
    assert got == {1: 1.0, 2: 1.01, 3: 1.02}


def test_ladder_xlsx_corrupt_file(tmp_path):
    """.xlsx now loads via the stdlib reader (no openpyxl gate);
    non-zip bytes fail loudly, not silently."""
    import zipfile

    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"not really xlsx")
    with pytest.raises(zipfile.BadZipFile):
        pricing.load_ladder_tables(str(fake), [("A", "B")])
