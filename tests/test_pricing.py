"""Pricing parity: Spark expressions vs the executed reference calculators.

The reference modules (`tools/pricing_calculator.py` and the RCGV
variant) are imported from /root/reference and run as ORACLES over a
structured input grid; our Catalyst expressions must match bid-for-bid.
"""

import importlib.util
import sys

import pytest

from pdf_parser_spark.pricing import apply_adjustments, compute_pricing, ladder_dim, ladder_join


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


REF_V1 = _load("/root/reference/tools/pricing_calculator.py", "ref_pricing_v1")
REF_V2 = _load(
    "/root/reference/Claude_Code/RCGV_Quote_Assistant-main/tools/pricing_calculator.py",
    "ref_pricing_v2",
)

# structured grid over every tier boundary (FIXTURES.md §4)
PRICES = [100_000, 250_000, 500_000, 750_000, 1_000_000, 1_250_000, 2_550_000,
          5_000_000, 8_000_000, 10_000_000]
SQFTS = [0, 2_500, 5_000, 20_000, 38_000, 55_000, 550_000]
ACRES = [0, 0.25, 1.0, 2.0, 3.0, 5.0, 8.0, 12.0]
PTYPES = ["Industrial", "Medical", "Office", "Warehouse", "Multi-Family",
          "Residential/LTR", "Unknown Type"]
FLOORS = [1, 2, 3, 4, 7, 10, 11]
NPROPS = [1, 2, 3, 4, 5, 7, 8, 11, 12]
ZIPS = [0, 604, 10_001, 30_000, 60_601, 85_260, 96_100, 99_999]


def _grid():
    rows = []
    for k in range(140):
        rows.append(
            dict(
                case_id=k,
                purchase_price=float(PRICES[k % len(PRICES)]),
                land_value=float(PRICES[k % len(PRICES)]) * 0.15,
                capex=float([0, 50_000, 150_000][k % 3]),
                zip_code=ZIPS[k % len(ZIPS)],
                property_type=PTYPES[k % len(PTYPES)],
                sqft_building=float(SQFTS[k % len(SQFTS)]),
                acres_land=float(ACRES[k % len(ACRES)]),
                floors=FLOORS[k % len(FLOORS)],
                num_properties=NPROPS[k % len(NPROPS)],
            )
        )
    # the v1-quirk case: logistic < multi (negative building value)
    rows.append(
        dict(case_id=900, purchase_price=10_000.0, land_value=500_000.0, capex=0.0,
             zip_code=85260, property_type="Office", sqft_building=38_000.0,
             acres_land=2.0, floors=2, num_properties=1)
    )
    return rows


@pytest.fixture(scope="module")
def grid_df(spark):
    return spark.createDataFrame(_grid()).cache()


@pytest.mark.parametrize("version,ref", [("v1", REF_V1), ("v2", REF_V2)])
def test_pricing_parity_vs_reference(spark, grid_df, version, ref):
    out = {r["case_id"]: r for r in compute_pricing(grid_df, version=version).collect()}
    for row in _grid():
        exp = ref.calculate_quote_pricing(
            purchase_price=row["purchase_price"],
            land_value=row["land_value"],
            capex=row["capex"],
            zip_code=str(row["zip_code"]),
            property_type=row["property_type"],
            sqft_building=row["sqft_building"],
            acres_land=row["acres_land"],
            floors=row["floors"],
            num_properties=row["num_properties"],
        )
        got = out[row["case_id"]]
        for factor, col in [
            ("cost_basis", "cost_basis_factor"), ("zip_code", "zip_code_factor"),
            ("sqft", "sqft_factor"), ("acres", "acres_factor"),
            ("property_type", "property_type_factor"), ("floors", "floors_factor"),
            ("multi_prop", "multi_prop_factor"),
        ]:
            assert got[col] == pytest.approx(exp["factors"][factor], abs=1e-12), (
                f"case {row['case_id']} {version} factor {factor}"
            )
        for field in ["final_bid", "linear_bid", "logistic_bid",
                      "multi_properties_bid", "pay_upfront", "pay_50_50", "pay_over_time"]:
            assert got[field] == pytest.approx(exp[field], abs=1e-6), (
                f"case {row['case_id']} {version} {field}: {got[field]} != {exp[field]}"
            )


def test_executed_golden_1m_mf(spark):
    """SURVEY §5 executed golden: 1M/150k MF → final 1908.19,
    payments 1736.45 / 954.10 / 477.05."""
    df = spark.createDataFrame(
        [dict(purchase_price=1_000_000.0, land_value=150_000.0, capex=0.0,
              zip_code=85260, property_type="Multi-Family", sqft_building=38_000.0,
              acres_land=2.0, floors=2, num_properties=1)]
    )
    r = compute_pricing(df, version="v1").collect()[0]
    assert r["linear_bid"] == pytest.approx(1908.19)
    assert r["logistic_bid"] == pytest.approx(14996.84)
    assert r["final_bid"] == pytest.approx(1908.19)
    assert (r["pay_upfront"], r["pay_50_50"], r["pay_over_time"]) == (1736.45, 954.10, 477.05)


def test_min_of_bids_quirk_v1_vs_v2(spark):
    """O2: v1 takes multi when min < multi; v2 takes the plain min."""
    df = spark.createDataFrame(
        [dict(purchase_price=10_000.0, land_value=500_000.0, capex=0.0,
              zip_code=85260, property_type="Office", sqft_building=38_000.0,
              acres_land=2.0, floors=2, num_properties=1)]
    )
    v1 = compute_pricing(df, version="v1").collect()[0]
    v2 = compute_pricing(df, version="v2").collect()[0]
    assert v1["logistic_bid"] < v1["multi_properties_bid"]
    assert v1["final_bid"] == v1["multi_properties_bid"]
    assert v2["final_bid"] == min(v2["linear_bid"], v2["logistic_bid"], v2["multi_properties_bid"])


def test_floor_100(spark):
    df = spark.createDataFrame(
        [dict(purchase_price=1_000.0, land_value=700_000.0, capex=0.0,
              zip_code=85260, property_type="Warehouse", sqft_building=0.0,
              acres_land=0.0, floors=1, num_properties=1)]
    )
    r = compute_pricing(df, version="v2").collect()[0]
    assert r["logistic_bid"] < 100.0  # deeply negative building value
    assert r["final_bid"] == 100.0


def test_adjustment_stack(spark):
    df = spark.createDataFrame(
        [
            dict(case_id=0, final_bid=1000.0, rush="No Rush", premium="No", referral="No", price_override=None),
            dict(case_id=1, final_bid=1000.0, rush="4W $500", premium="Yes", referral="No", price_override=None),
            dict(case_id=2, final_bid=1000.0, rush="2W $1000", premium="No", referral="Yes", price_override=None),
            dict(case_id=3, final_bid=1000.0, rush="No Rush", premium="Yes", referral="Yes", price_override=9999.0),
        ],
        schema="case_id int, final_bid double, rush string, premium string, referral string, price_override double",
    )
    rows = {r["case_id"]: r for r in apply_adjustments(df).collect()}
    assert rows[0]["final_quote"] == 1000.0
    assert rows[1]["final_quote"] == 1000.0 + 500.0 + 50.0
    assert rows[2]["final_quote"] == 1000.0 + 1000.0 + 100.0
    assert rows[3]["final_quote"] == 9999.0  # override short-circuits


def test_ladder_join_matches_chain(spark, grid_df):
    """J1 broadcast range join ≡ the constant-folded when-chain."""
    from pdf_parser_spark.pricing import COST_BASIS_V2

    dim = ladder_dim(spark, COST_BASIS_V2, name="cb_join_factor")
    joined = ladder_join(
        compute_pricing(grid_df.withColumn("total_cost", grid_df.purchase_price + grid_df.capex), version="v2"),
        "total_cost", dim,
    )
    bad = joined.filter("abs(cb_join_factor - cost_basis_factor) > 1e-12").count()
    assert bad == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
