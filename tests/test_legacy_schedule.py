"""D12 legacy simplified schedules vs the executed reference generator.

engine/quote_calc.py's calculate_depreciation_schedule runs as a true
oracle (module loaded with a transient openpyxl stub — the method never
touches the workbook). service/api.py:83-116 cannot be imported
(fastapi/pydantic absent in this sandbox), so its oracle below is a
line-by-line transcription of that arithmetic, cited per line.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.depreciation import legacy_building_value, legacy_schedule


def _load_engine():
    had = "openpyxl" in sys.modules
    if not had:
        stub = types.ModuleType("openpyxl")
        stub.load_workbook = None
        sys.modules["openpyxl"] = stub
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_engine_quote_d12", "/root/reference/engine/quote_calc.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_engine_quote_d12"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        if not had:
            del sys.modules["openpyxl"]


REF_ENGINE = _load_engine()

CASES = [
    dict(case_id=0, purchase_price=1_000_000.0, land_value=10.0, known_land_value=False,
         property_type="Office", capex="No", capex_amount=0.0),
    dict(case_id=1, purchase_price=1_000_000.0, land_value=150_000.0, known_land_value=True,
         property_type="Multi-Family", capex="Yes", capex_amount=50_000.0),
    dict(case_id=2, purchase_price=750_000.0, land_value=0.2, known_land_value=False,
         property_type="Warehouse", capex="Yes", capex_amount=25_000.0),
    dict(case_id=3, purchase_price=333_333.33, land_value=33.0, known_land_value=False,
         property_type="Unknown Type", capex="No", capex_amount=99_999.0),
]


@pytest.fixture(scope="module")
def legacy_df(spark):
    df = spark.createDataFrame(CASES)
    return df.withColumn(
        "building_value",
        legacy_building_value(
            F.col("purchase_price"), F.col("land_value"), F.col("known_land_value"),
            F.col("capex_amount"), capex_yes=F.col("capex"),
        ),
    ).cache()


def test_legacy_v1_parity_vs_engine(spark, legacy_df):
    out = legacy_schedule(legacy_df, variant="legacy_v1", rounding="python")
    got = {}
    for r in out.collect():
        got.setdefault(r["case_id"], {})[r["year"]] = r
    for case in CASES:
        exp_rows = REF_ENGINE.QuoteCalculator.calculate_depreciation_schedule(
            REF_ENGINE.QuoteCalculator.__new__(REF_ENGINE.QuoteCalculator), dict(case)
        )
        assert len(got[case["case_id"]]) == len(exp_rows), f"case {case['case_id']} row count"
        for exp in exp_rows:
            g = got[case["case_id"]][exp["year"]]
            for fld in ("cost_seg_est", "std_dep", "trad_cost_seg", "bonus_dep"):
                assert g[fld] == exp[fld], (
                    f"case {case['case_id']} year {exp['year']} {fld}: {g[fld]} != {exp[fld]}"
                )


def _api_legacy_schedule(building_value: float):
    """service/api.py:83-116 transcribed: 80% bonus year 1, remaining
    20% spread over years 2..27, fixed 27.5-year standard line."""
    schedule = []
    standard_dep = round(building_value / 27.5, 2)            # :85
    year1_bonus = round(building_value * 0.8, 2)              # :88
    year1_trad = round(building_value * 0.2 / 27.5, 2)        # :89
    schedule.append({                                          # :91-97
        "year": 1, "cost_seg_est": year1_bonus, "std_dep": standard_dep,
        "trad_cost_seg": year1_trad + round(building_value * 0.8 / 5, 2),
        "bonus_dep": year1_bonus,
    })
    remaining_value = building_value * 0.2                     # :100
    annual_trad = round(remaining_value / 27, 2)               # :101
    annual_bonus = round(remaining_value / 27, 2)              # :102
    for year in range(2, 28):                                  # :104-111
        schedule.append({
            "year": year, "cost_seg_est": annual_bonus, "std_dep": standard_dep,
            "trad_cost_seg": annual_trad, "bonus_dep": annual_bonus,
        })
    return schedule


def test_legacy_v2_parity_vs_api_transcription(spark, legacy_df):
    out = legacy_schedule(legacy_df, variant="legacy_v2", rounding="python")
    got = {}
    for r in out.collect():
        got.setdefault(r["case_id"], {})[r["year"]] = r
    bvs = {r["case_id"]: r["building_value"] for r in legacy_df.collect()}
    for case in CASES:
        exp_rows = _api_legacy_schedule(bvs[case["case_id"]])
        assert len(got[case["case_id"]]) == 27
        for exp in exp_rows:
            g = got[case["case_id"]][exp["year"]]
            for fld in ("cost_seg_est", "std_dep", "trad_cost_seg", "bonus_dep"):
                assert g[fld] == exp[fld], (
                    f"case {case['case_id']} year {exp['year']} {fld}: {g[fld]} != {exp[fld]}"
                )


def test_legacy_v1_shuffle_free_plan(spark, legacy_df):
    from tests.test_plans import plan_of

    p = plan_of(legacy_schedule(legacy_df, variant="legacy_v1"))
    assert "Exchange" not in p
    assert ") Generate" in p  # the year explode
