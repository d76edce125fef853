"""S4/S5 against the REAL reference workbook, no openpyxl: the stdlib
zip+XML reader (xlsxlite) feeds header-pair discovery, and the engine's
executed _ladder_lookup verifies the broadcast range-join equivalent."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_parser_spark.pricing import (
    COST_BASIS_V2,
    ladder_dim_from_table,
    ladder_join,
    load_ladder_tables,
)
from pdf_parser_spark.xlsxlite import read_sheet

XLSX = "/root/reference/Base Pricing27.1_Pro_SMART_RCGV.xlsx"
PAIRS = [("Cost Basis", "Cost Basis Factor"), ("Zip Code", "Zip Code Factor")]


def test_read_sheet_grid_shape():
    grid = read_sheet(XLSX, "VLOOKUP Tables")
    assert len(grid) > 10 and len(grid[0]) > 10
    # engine/quote_calc.py:60 reads headers at row index 2
    row2 = [x for x in grid[2] if x is not None]
    assert "Cost Basis" in row2 and "Cost Basis Factor" in row2
    assert row2.index("Cost Basis Factor") == row2.index("Cost Basis") + 1


def test_read_sheet_unknown_sheet():
    with pytest.raises(KeyError):
        read_sheet(XLSX, "No Such Sheet")


def test_ladder_discovery_from_real_workbook():
    tabs = load_ladder_tables(XLSX, PAIRS)
    cb = tabs["Cost Basis"]
    # the workbook IS the source of the hard-coded v2 tiers — every
    # (threshold, factor) of COST_BASIS_V2 appears verbatim
    for thr, fac in COST_BASIS_V2:
        if thr is not None:
            assert (float(thr), float(fac)) in cb, (thr, fac)
    assert cb[0] == (0.0, 1.0)  # the below-first-threshold default row
    assert cb == sorted(cb)  # ascending, ready for _ladder_lookup
    zips = tabs["Zip Code"]
    assert len(zips) >= 10 and zips == sorted(zips)


def test_ladder_join_matches_executed_engine_lookup(spark):
    """J1 parity: our broadcast range join == the engine's executed
    _ladder_lookup over the SAME workbook-discovered table."""
    from tests.test_legacy_schedule import REF_ENGINE

    tabs = load_ladder_tables(XLSX, PAIRS)
    cb = tabs["Cost Basis"]
    ref_table = pd.DataFrame(cb, columns=["threshold", "factor"])
    probes = [0.0, 1.0, 249_999.0, 250_000.0, 750_001.0, 999_999.99,
              1_000_000.0, 2_500_000.0, 9_999_999.0, 10_000_000.0, 50_000_000.0]
    expected = {
        x: REF_ENGINE.QuoteCalculator._ladder_lookup(x, ref_table) for x in probes
    }
    df = spark.createDataFrame([(i, x) for i, x in enumerate(probes)], "i int, x double")
    dim = ladder_dim_from_table(spark, cb, name="factor")
    got = {r["x"]: r["factor"] for r in ladder_join(df, "x", dim).collect()}
    assert got == expected
