"""RCGV-variant parity: capex pools (D7/A3), 481(a)-with-pools (D6),
remaining basis/life (D9), cent allocations (F15), lifetime totals (A5)
— Spark engine vs the EXECUTED RCGV reference engine.

The RCGV snapshot ships no macrs_tables.py (SURVEY §2.10 D8 note); the
fixture assembles a runnable package from RCGV cost_seg + the top-level
tables, exactly how the reference resolves its fallback import.
"""

import datetime
import shutil
import sys

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark import depreciation as dep

RCGV = "/root/reference/Claude_Code/RCGV_Quote_Assistant-main/cost_seg"


@pytest.fixture(scope="module")
def refmod(tmp_path_factory):
    pkg = tmp_path_factory.mktemp("rcgvpkg")
    shutil.copytree(RCGV, pkg / "rcgvcs")
    shutil.copy("/root/reference/cost_seg/macrs_tables.py", pkg / "rcgvcs")
    (pkg / "rcgvcs" / "__init__.py").touch()
    sys.path.insert(0, str(pkg))
    import rcgvcs.cost_seg_calculator as mod

    return mod


SCENARIOS = [
    # (id, pp, land, pad, dg, acq, css, ptype, yb, pools)
    (0, 10_000_000, 2_500_000, 0, 0, "06/15/2024", "12/31/2025", "commercial", 2010,
     [(500_000, "2024-08-01", "QIP"), (120_000, "2025-03-15", "5_year")]),
    (1, 2_550_000, 255_000, 0, 0, "06/15/2019", "10/15/2021", "multi-family", 2005,
     [(80_000, "2020-01-10", "7_year"), (40_000, "2021-06-30", None)]),
    (2, 5_000_000, 1_000_000, 100_000, 50_000, "03/01/2022", "04/15/2025", "commercial", 1990,
     [(250_000, "2023-05-20", "39_year"), (60_000, "2024-11-11", "15_year"),
      (30_000, "2016-02-29", "5_year")]),  # pre-bonus-era pool → 0% bonus
    (3, 1_200_000, 120_000, 0, 0, "05/05/2025", "12/31/2025", "multi-family", 2015,
     [(90_000, "2025-06-01", "27_5_year")]),  # same-year CSS
    (4, 3_300_000, 330_000, 0, 0, "09/30/2023", "04/15/2026", "commercial", 1970, []),
]


def _pools_dicts(s):
    return [
        {"amount": a, "placed_in_service_date": d, "classification": c}
        for a, d, c in s[9]
    ]


def _ref(refmod, s):
    return refmod.CostSegregationCalculator(
        purchase_price=s[1], land_value=s[2], capex=0, pad=s[3], deferred_gain=s[4],
        acquisition_date=s[5], css_date=s[6], property_type=s[7], year_built=s[8],
        capex_items=_pools_dicts(s),
    )


@pytest.fixture(scope="module")
def staged(spark):
    rows = [
        dict(
            case_id=s[0], purchase_price=float(s[1]), land_value=float(s[2]),
            capex=0.0, pad=float(s[3]), deferred_gain=float(s[4]),
            acquisition_date=datetime.datetime.strptime(s[5], "%m/%d/%Y").date(),
            css_date=datetime.datetime.strptime(s[6], "%m/%d/%Y").date(),
            property_type=s[7], year_built=s[8],
            capex_items=[
                dict(
                    amount=float(a),
                    pis_date=datetime.date.fromisoformat(d),
                    classification=c,
                    bonus_override=None,
                )
                for a, d, c in s[9]
            ],
        )
        for s in SCENARIOS
    ]
    schema = (
        "case_id long, purchase_price double, land_value double, capex double,"
        "pad double, deferred_gain double, acquisition_date date, css_date date,"
        "property_type string, year_built int,"
        "capex_items array<struct<amount:double,pis_date:date,classification:string,"
        "bonus_override:double>>"
    )
    df = spark.createDataFrame(rows, schema)
    return dep.with_engine_inputs_rcgv(df, pools_col="capex_items").cache()


def test_stage1_matches_rcgv(refmod, staged):
    got = {r["case_id"]: r for r in staged.collect()}
    for s in SCENARIOS:
        ref = _ref(refmod, s)
        g = got[s[0]]
        assert g["total_depreciable"] == pytest.approx(ref.total_depreciable, abs=1e-6)
        assert g["bonus_rate"] == ref.bonus_rate
        bldg = ref._building_key()
        assert g["building_class"] == bldg
        assert g["amt_5yr"] == pytest.approx(ref.allocated_amounts["5yr"], abs=1e-6)
        assert g["amt_7yr"] == pytest.approx(ref.allocated_amounts["7yr"], abs=1e-6)
        assert g["amt_15yr"] == pytest.approx(ref.allocated_amounts["15yr"], abs=1e-6)
        assert g["amt_bldg"] == pytest.approx(ref.allocated_amounts[bldg], abs=1e-6)


def test_capex_pool_totals_match_rcgv(refmod, spark, staged):
    """D7/A3: per-class pool depreciation (year + accumulated)."""
    tax_year = F.col("acq_year") + F.col("years_elapsed")
    cur = dep.capex_class_totals(F.col("capex_items"), tax_year, accumulated=False)
    acc = dep.capex_class_totals(F.col("capex_items"), tax_year - 1, accumulated=True)
    out = staged.select(
        "case_id",
        *[v.alias(f"cur_{c.replace('.', '_')}") for c, v in cur.items()],
        *[v.alias(f"acc_{c.replace('.', '_')}") for c, v in acc.items()],
    )
    got = {r["case_id"]: r for r in out.collect()}
    for s in SCENARIOS:
        ref = _ref(refmod, s)
        ty = ref.css_date.year
        rcur = ref._aggregate_capex_by_class(ref._calculate_capex_pool_year_depreciation, ty)
        racc = ref._aggregate_capex_by_class(ref._calculate_capex_pool_accumulated, ty - 1)
        g = got[s[0]]
        for c in dep.CAPEX_CLASSES:
            key = c.replace(".", "_")
            assert g[f"cur_{key}"] == pytest.approx(rcur.get(c, 0), abs=1e-6), (s[0], c)
            assert g[f"acc_{key}"] == pytest.approx(racc.get(c, 0), abs=1e-6), (s[0], c)


def test_481a_with_pools_matches_rcgv(refmod, spark, staged):
    out = dep.with_481a_capex(staged).select(
        "case_id", "should_have_taken", "did_take", "catch_up_adjustment",
        "current_year_total", "total_current_year_benefit",
    )
    got = {r["case_id"]: r for r in out.collect()}
    for s in SCENARIOS:
        ref = _ref(refmod, s)
        r = ref.calculate_481a_adjustment()
        g = got[s[0]]
        assert g["should_have_taken"] == pytest.approx(r["should_have_taken"], abs=1e-6), s[0]
        assert g["did_take"] == pytest.approx(r["did_take"], abs=1e-6)
        assert g["catch_up_adjustment"] == pytest.approx(r["catch_up_adjustment"], abs=1e-6)
        assert g["current_year_total"] == pytest.approx(r["current_year_total"], abs=1e-6)
        assert g["total_current_year_benefit"] == pytest.approx(
            r["total_current_year_benefit"], abs=1e-6
        )


def test_remaining_basis_and_life_match_rcgv(refmod, spark, staged):
    year = F.col("years_elapsed") + 1
    rem = dep.remaining_basis_cols(year, F.col("bonus_rate"))
    life = dep.life_remaining_cols(year, F.col("bonus_rate"))
    out = staged.select(
        "case_id",
        *[v.alias(k) for k, v in rem.items()],
        *[v.alias(k) for k, v in life.items()],
    )
    got = {r["case_id"]: r for r in out.collect()}
    for s in SCENARIOS:
        ref = _ref(refmod, s)
        y = ref.css_date.year - ref.acquisition_date.year + 1
        rrem = ref.calculate_remaining_basis_by_class(y)
        rlife = ref.calculate_life_remaining_by_class(y)
        bldg = ref._building_key()
        g = got[s[0]]
        assert g["rem_5yr"] == pytest.approx(rrem["5yr"], abs=1e-6)
        assert g["rem_7yr"] == pytest.approx(rrem["7yr"], abs=1e-6)
        assert g["rem_15yr"] == pytest.approx(rrem["15yr"], abs=1e-6)
        assert g["rem_bldg"] == pytest.approx(rrem[bldg], abs=1e-6)
        assert g["life_5yr"] == str(rlife["5yr"])
        assert g["life_7yr"] == str(rlife["7yr"])
        assert g["life_15yr"] == str(rlife["15yr"])
        assert g["life_bldg"] == str(rlife[bldg])


def test_lifetime_totals_match_rcgv(refmod, spark, staged):
    out = dep.with_lifetime_totals(staged, pools_col="capex_items").select(
        "case_id", "lifetime_standard", "lifetime_traditional", "lifetime_bonus"
    )
    got = {r["case_id"]: r for r in out.collect()}
    for s in SCENARIOS:
        ref = _ref(refmod, s)
        r = ref.lifetime_totals(from_css_year=True)
        g = got[s[0]]
        assert g["lifetime_standard"] == pytest.approx(float(r["standard"]), abs=0.011), s[0]
        assert g["lifetime_traditional"] == pytest.approx(float(r["traditional"]), abs=0.011)
        assert g["lifetime_bonus"] == pytest.approx(float(r["bonus"]), abs=0.011)


def test_cent_allocations_sum_to_basis(spark, staged):
    """F15 invariant: cent-quantized amounts reconcile exactly."""
    out = dep.with_cent_allocations(staged).select(
        "case_id", "total_depreciable", "camt_5yr", "camt_7yr", "camt_15yr", "camt_bldg"
    )
    for r in out.collect():
        total = r["camt_5yr"] + r["camt_7yr"] + r["camt_15yr"] + r["camt_bldg"]
        assert total == pytest.approx(round(r["total_depreciable"], 2), abs=1e-9), r["case_id"]
        for c in ("camt_5yr", "camt_7yr", "camt_15yr", "camt_bldg"):
            assert round(r[c], 2) == pytest.approx(r[c], abs=1e-9)  # cent-quantized


def test_d11_identity_reconciliation(spark, staged):
    """D11 as the reference defines it: lifetime totals == basis − SL
    prior (+ capex), 1-cent tolerance — flag, not exception."""
    out = dep.with_reconciliation(
        dep.with_lifetime_totals(staged, pools_col="capex_items"), pools_col="capex_items"
    )
    rows = out.select("case_id", "is_reconciled").collect()
    assert rows and all(r["is_reconciled"] for r in rows)


def test_schedule_reconciliation_invariant(spark, staged):
    """Schedule sums telescope to the engine's accumulated-at-horizon
    (the stronger invariant the reference's identity check misses)."""
    sched = dep.depreciation_schedule(staged, full_horizon=True)
    rec = dep.reconcile_schedule(sched, ["case_id"])
    rows = rec.collect()
    assert rows
    for r in rows:
        assert r["bonus_reconciled"], (r["case_id"], r["sum_bonus"], r["acc_at_horizon"])
        assert r["std_reconciled"], r["case_id"]
        assert r["trad_reconciled"], r["case_id"]


def test_reference_table_gap_documented(refmod):
    """Pin the reference data quirk reconcile_schedule works around:
    MM tables don't sum to 100% (39yr: 99.893, 27.5yr: 101.657)."""
    import rcgvcs.macrs_tables as mt
    s39 = sum(mt.MACRS_39YR_MM[y][6] for y in mt.MACRS_39YR_MM)
    s27 = sum(mt.MACRS_27_5YR_MM[y][6] for y in mt.MACRS_27_5YR_MM)
    assert abs(s39 - 99.893) < 0.01
    assert abs(s27 - 101.657) < 0.01


def test_sql_text_twins_exactly_match_column_builders(spark):
    """Round-5: with_481a_capex stages its folds/lookups as SQL TEXT
    (one py4j round trip each — DataFrame construction was 9-17 s of
    the cold start).  Every text builder must produce bit-identical
    doubles to its Column twin, pool folds included."""
    rows = [
        (i, [(1000.0 + i * 37.3,
              datetime.date(2015 + (i * 3) % 12, 1 + (i * 5) % 12, 1 + (i * 7) % 28),
              c, (None if i % 3 else 80.0))
             for c in ["QIP", "5_year", "7_year", "15_year", "27_5_year",
                       "39_year", "junk"][: 1 + i % 7]])
        for i in range(40)
    ]
    sdf = spark.createDataFrame(
        rows,
        "id long, capex_items array<struct<amount:double,pis_date:date,"
        "classification:string,bonus_override:double>>",
    ).select(
        "*",
        (F.col("id") % 10 + 2015).cast("int").alias("acq_year"),
        (F.col("id") % 7).cast("int").alias("years_elapsed"),
        (F.col("id") % 4 * 20.0).alias("bonus_rate"),
        (F.col("id") * 991.7).alias("amt_5yr"),
        (F.col("id") * 313.1).alias("amt_7yr"),
        (F.col("id") * 77.3).alias("amt_15yr"),
        (F.col("id") * 5011.9).alias("amt_bldg"),
        (F.col("id") * 6393.0).alias("total_depreciable"),
        F.when(F.col("id") % 5 == 0, "27.5yr").when(F.col("id") % 5 == 1, "39yr")
        .when(F.col("id") % 5 == 2, "30yr").when(F.col("id") % 5 == 3, "40yr")
        .otherwise("junk").alias("building_class"),
        (F.col("id") % 12 + 1).cast("int").alias("pis_month"),
    )
    ye = F.col("years_elapsed")
    bonus = F.col("bonus_rate")
    acc = dep.accumulated_cols(ye, bonus)
    cur = dep.year_depreciation_cols(ye + 1, bonus)
    y1 = dep.year_depreciation_cols(F.lit(1), bonus)
    pairs = [
        (dep.capex_total(F.col("capex_items"),
                         F.col("acq_year") + ye - 1, accumulated=True),
         dep.capex_total_sql("capex_items", "(acq_year + years_elapsed - 1)",
                             accumulated=True)),
        (dep.capex_total(F.col("capex_items"),
                         F.col("acq_year") + ye, accumulated=False),
         dep.capex_total_sql("capex_items", "(acq_year + years_elapsed)",
                             accumulated=False)),
        (acc["acc_5yr"] + acc["acc_7yr"] + acc["acc_15yr"] + acc["acc_bldg"],
         dep._sql_class_sum(dep._sql_short_acc_dep, "years_elapsed")),
        (dep.standard_depreciation(ye), dep._sql_standard_dep("years_elapsed")),
        (cur["dep_5yr"] + cur["dep_7yr"] + cur["dep_15yr"] + cur["dep_bldg"],
         dep._sql_class_sum(dep._sql_short_year_dep, "(years_elapsed + 1)")),
        (y1["dep_5yr"] + y1["dep_7yr"] + y1["dep_15yr"] + y1["dep_bldg"],
         dep._sql_class_sum(dep._sql_short_year_dep, "1")),
    ]
    sel = []
    for j, (col_form, sql_text) in enumerate(pairs):
        sel += [col_form.alias(f"c{j}"), F.expr(sql_text).alias(f"s{j}")]
    for r in sdf.select(*sel).collect():
        for j in range(len(pairs)):
            assert r[f"c{j}"] == r[f"s{j}"], (j, dict(r.asDict()))
