"""MACRS depreciation engine as native Catalyst expressions.

Reimplements ``cost_seg/cost_seg_calculator.py`` + ``cost_seg/
macrs_tables.py`` (D1–D11 of SURVEY §2.10) Spark-first:

- MACRS tables become LITERAL array expressions indexed by
  ``element_at`` — zero joins, zero shuffles; the whole engine is one
  ``select`` + one ``explode(sequence(...))``, partition-local at any
  scale (each document's schedule derives only from its own row).
- the reference's O(N²) ``get_accumulated_depreciation`` re-summation
  (``macrs_tables.py:119-134``) becomes precomputed prefix-sum
  literals (SURVEY §4 "Common-subexpression reuse").
- the dual bonus/no-bonus schedule (D10, ``RCGV .../service/
  api.py:508-559``) runs in ONE pass as two column families instead of
  the reference's two engine instantiations.
- ADS (D8): the reference snapshot has no 30/40yr tables and raises
  ``ValueError: Unknown asset class: 30yr`` which the endpoint degrades
  to an empty schedule. Default mode reproduces that (null schedule);
  ``ads_tables=True`` enables real straight-line mid-month 30/40yr
  tables.

A broadcast MACRS dim (:func:`macrs_table_df`) is also exposed for the
J4 oracle-checked query in ``__spark_entry__.py``.
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ----------------------------------------------------------------------
# tables (exact values of cost_seg/macrs_tables.py:8-88)
# ----------------------------------------------------------------------
MACRS_5YR = [20.00, 32.00, 19.20, 11.52, 11.52, 5.76]
MACRS_7YR = [14.29, 24.49, 17.49, 12.49, 8.93, 8.92, 8.93, 4.46]
MACRS_15YR = [5.00, 9.50, 8.55, 7.70, 6.93, 6.23, 5.90, 5.90, 5.91, 5.90,
              5.91, 5.90, 5.91, 5.90, 5.91, 2.95]


def _mm_table(years: float) -> List[List[float]]:
    """Mid-month straight-line 2-D table [year][month] in percent.

    Reproduces MACRS_27_5YR_MM / MACRS_39YR_MM of macrs_tables.py:54-88
    (IRS Pub 946 tables) and generates the 30/40yr ADS equivalents.
    """
    if years == 27.5:
        t = [[3.485, 3.182, 2.879, 2.576, 2.273, 1.970, 1.667, 1.364, 1.061, 0.758, 0.455, 0.152]]
        t += [[3.636] * 12 for _ in range(2, 28)]
        t += [[3.637, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636, 3.636]]
        t += [[0.000, 0.303, 0.606, 0.909, 1.212, 1.515, 1.818, 2.121, 2.424, 2.727, 3.030, 3.333]]
        return t
    if years == 39:
        t = [[2.461, 2.247, 2.033, 1.819, 1.605, 1.391, 1.177, 0.963, 0.749, 0.535, 0.321, 0.107]]
        t += [[2.564] * 12 for _ in range(2, 40)]
        t += [[0.000, 0.214, 0.428, 0.642, 0.856, 1.070, 1.284, 1.498, 1.712, 1.926, 2.140, 2.354]]
        return t
    # generated SL-MM (ADS 30yr / 40yr): year-1 fraction (12.5-month)/12
    n = int(years)
    annual = 100.0 / years
    t = [[round(annual * (12 - m + 0.5) / 12, 3) for m in range(1, 13)]]
    t += [[round(annual, 3)] * 12 for _ in range(2, n + 1)]
    # final partial year: remainder to reach 100%
    t += [[round(100.0 - (t[0][m - 1] + round(annual, 3) * (n - 1)), 3) for m in range(1, 13)]]
    return t


MACRS_MM: Dict[str, List[List[float]]] = {
    "27.5yr": _mm_table(27.5),
    "39yr": _mm_table(39),
    "30yr": _mm_table(30),
    "40yr": _mm_table(40),
}

HY_TABLES: Dict[str, List[float]] = {"5yr": MACRS_5YR, "7yr": MACRS_7YR, "15yr": MACRS_15YR}

# Bonus Depreciation Schedule (cost_seg_calculator.py:11-17) — ordered
# first-match semantics preserved as a when-chain (J3)
BONUS_SCHEDULE = [
    (datetime.date(2025, 1, 20), None, 100),
    (datetime.date(2025, 1, 1), datetime.date(2025, 1, 19), 40),
    (datetime.date(2024, 1, 1), datetime.date(2024, 12, 31), 60),
    (datetime.date(2023, 1, 1), datetime.date(2023, 12, 31), 80),
    (datetime.date(2017, 9, 27), datetime.date(2022, 12, 31), 100),
]

BASE_ALLOCATIONS = {"5yr": 0.07, "7yr": 0.05, "15yr": 0.24}
BASE_BUILDING = {"multi-family": 0.64, "commercial": 0.61}
SHORT_CLASSES = ["5yr", "7yr", "15yr"]
FULL_HORIZON = {"27.5yr": 29, "39yr": 41, "30yr": 31, "40yr": 41}


def _prefix(vals: List[float]) -> List[float]:
    out, acc = [], 0.0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def _lit_array(vals: List[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _lit_array2(rows: List[List[float]]) -> Column:
    return F.array(*[_lit_array(r) for r in rows])


# ----------------------------------------------------------------------
# scalar expression builders
# ----------------------------------------------------------------------
def bonus_rate_expr(acq: Column) -> Column:
    """F5/J3: first matching interval's rate else 0 (list order wins)."""
    expr = None
    for start, end, rate in BONUS_SCHEDULE:
        if end is None:
            cond = acq >= F.lit(start)
        else:
            cond = (acq >= F.lit(start)) & (acq <= F.lit(end))
        expr = F.when(cond, F.lit(float(rate))) if expr is None else expr.when(cond, F.lit(float(rate)))
    return expr.otherwise(F.lit(0.0))


def age_adjustment_expr(year_built: Column, current_year: Column) -> Column:
    """F6: 0.5 / (1 + e^(-0.01*age)) (cost_seg_calculator.py:37-58)."""
    age = (current_year - year_built).cast("double")
    return F.lit(0.5) / (F.lit(1.0) + F.exp(F.lit(-0.01) * age))


def _hy_pct(asset_class: str, year: Column, accumulated: bool) -> Column:
    """MACRS % (or prefix-summed %) for a HY class at ``year`` — literal
    array indexing; out-of-range years → 0 for annual, table-total for
    accumulated (dict .get(year, 0.0) semantics of macrs_tables.py:90-117)."""
    vals = HY_TABLES[asset_class]
    arr = _prefix(vals) if accumulated else vals
    got = F.element_at(_lit_array(arr), year.cast("int"))
    if accumulated:
        beyond = F.lit(float(_prefix(vals)[-1]))
        return F.when(year <= 0, F.lit(0.0)).when(year > len(vals), beyond).otherwise(got)
    return F.coalesce(F.when(year.between(1, len(vals)), got), F.lit(0.0))


def _mm_pct(building_class: Column, year: Column, month: Column, accumulated: bool) -> Column:
    """MACRS % for MM building classes, dispatching on class column."""
    expr = None
    for cls, table in MACRS_MM.items():
        rows = [list(r) for r in table]
        if accumulated:
            cols = [[rows[y][m] for y in range(len(rows))] for m in range(12)]
            acc_cols = [_prefix(c) for c in cols]
            rows = [[acc_cols[m][y] for m in range(12)] for y in range(len(rows))]
        arr = _lit_array2(rows)
        n_years = len(table)
        got = F.element_at(F.element_at(arr, year.cast("int")), month.cast("int"))
        if accumulated:
            beyond = F.element_at(F.element_at(arr, F.lit(n_years)), month.cast("int"))
            val = F.when(year <= 0, F.lit(0.0)).when(year > n_years, beyond).otherwise(got)
        else:
            val = F.coalesce(F.when(year.between(1, n_years), got), F.lit(0.0))
        cond = building_class == F.lit(cls)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(F.lit(None).cast("double"))  # unknown class → null (D8)


# ----------------------------------------------------------------------
# engine stages
# ----------------------------------------------------------------------
def with_engine_inputs(
    df: DataFrame,
    purchase_price: str = "purchase_price",
    land_value: str = "land_value",
    capex: str = "capex",
    pad: str = "pad",
    deferred_gain: str = "deferred_gain",
    acquisition_date: str = "acquisition_date",
    css_date: str = "css_date",
    property_type: str = "property_type",
    year_built: str = "year_built",
    bonus_override: Optional[str] = None,
    use_ads: Optional[str] = None,
    ads_tables: bool = False,
) -> DataFrame:
    """Stage 1: per-document scalars (D1, J3, F6, F7, F13/F14).

    Adds: total_depreciable, bonus_rate, building_class, month,
    amt_5yr / amt_7yr / amt_15yr / amt_bldg, engine_error.
    """
    pp = F.col(purchase_price).cast("double")
    lv = F.col(land_value).cast("double")
    cx = F.coalesce(F.col(capex).cast("double"), F.lit(0.0))
    pd_ = F.coalesce(F.col(pad).cast("double"), F.lit(0.0))
    dg = F.coalesce(F.col(deferred_gain).cast("double"), F.lit(0.0))
    acq = F.col(acquisition_date).cast("date")
    ptype = F.col(property_type)
    yb = F.coalesce(F.col(year_built).cast("int"), F.year(acq))

    total_dep = pp - lv + cx - pd_ - dg
    bonus = bonus_rate_expr(acq)
    if bonus_override:
        bonus = F.coalesce(F.col(bonus_override).cast("double"), bonus)

    is_mf = ptype == "multi-family"
    ads = F.col(use_ads).cast("boolean") if use_ads else F.lit(False)
    # F14 _building_key: ADS ? (MF?30:40) : (MF?27.5:39)
    building_class = (
        F.when(ads & is_mf, F.lit("30yr"))
        .when(ads, F.lit("40yr"))
        .when(is_mf, F.lit("27.5yr"))
        .otherwise(F.lit("39yr"))
    )
    # ADS zeroes bonus (RCGV cost_seg_calculator.py:216-226)
    bonus = F.when(ads, F.lit(0.0)).otherwise(bonus)

    # D8: reference has no 30/40yr tables → ValueError → empty schedule
    engine_error = (
        F.when(
            ads & ~F.lit(ads_tables),
            F.concat(F.lit("Unknown asset class: "), F.when(is_mf, "30yr").otherwise("40yr")),
        )
        .otherwise(F.lit(None).cast("string"))
    )

    # F6/F7 age-adjusted allocations
    adj = age_adjustment_expr(yb, F.year(acq)) * F.lit(0.22)
    base_bldg = F.when(is_mf, F.lit(BASE_BUILDING["multi-family"])).otherwise(
        F.lit(BASE_BUILDING["commercial"])
    )
    alloc_bldg = base_bldg * (F.lit(1.0) - adj)
    alloc_15 = F.lit(BASE_ALLOCATIONS["15yr"]) + adj * base_bldg

    # percent-or-fraction idiom (§1.2: pct>1 ⇒ /100) — fractions here,
    # guard kept for parity with cost_seg_calculator.py:166
    def amt(pct: Column) -> Column:
        return total_dep * F.when(pct > 1.0, pct / 100.0).otherwise(pct)

    return df.select(
        "*",
        total_dep.alias("total_depreciable"),
        bonus.alias("bonus_rate"),
        building_class.alias("building_class"),
        F.month(acq).alias("pis_month"),
        F.year(acq).alias("acq_year"),
        (F.year(F.col(css_date).cast("date")) - F.year(acq)).alias("years_elapsed"),
        amt(F.lit(BASE_ALLOCATIONS["5yr"])).alias("amt_5yr"),
        amt(F.lit(BASE_ALLOCATIONS["7yr"])).alias("amt_7yr"),
        amt(alloc_15).alias("amt_15yr"),
        amt(alloc_bldg).alias("amt_bldg"),
        engine_error.alias("engine_error"),
    )


def _short_year_dep(amt: Column, bonus: Column, cls: str, year: Column) -> Column:
    """D5 for one short class: year-k depreciation."""
    b = bonus / 100.0
    year1 = amt * b + amt * (1.0 - b) * _hy_pct(cls, F.lit(1), False) / 100.0
    later = amt * (1.0 - b) * _hy_pct(cls, year, False) / 100.0
    return (
        F.when(amt == 0.0, F.lit(0.0))
        .when(bonus == 100.0, F.when(year == 1, amt).otherwise(F.lit(0.0)))
        .when(year == 1, year1)
        .otherwise(later)
    )


def _short_acc_dep(amt: Column, bonus: Column, cls: str, years: Column) -> Column:
    """D3 for one short class: accumulated through N years."""
    b = bonus / 100.0
    acc = amt * b + amt * (1.0 - b) * _hy_pct(cls, years, True) / 100.0
    return (
        F.when((amt == 0.0) | (years == 0), F.lit(0.0))
        .when(bonus == 100.0, amt)
        .otherwise(acc)
    )


def _bldg_year_dep(amt: Column, cls: Column, year: Column, month: Column) -> Column:
    return F.when(amt == 0.0, F.lit(0.0)).otherwise(
        amt * _mm_pct(cls, year, month, False) / 100.0
    )


def _bldg_acc_dep(amt: Column, cls: Column, years: Column, month: Column) -> Column:
    return F.when((amt == 0.0) | (years == 0), F.lit(0.0)).otherwise(
        amt * _mm_pct(cls, years, month, True) / 100.0
    )


def year_depreciation_cols(year: Column, bonus: Column) -> Dict[str, Column]:
    """Per-class year-``year`` depreciation columns (D5)."""
    out = {
        "dep_5yr": _short_year_dep(F.col("amt_5yr"), bonus, "5yr", year),
        "dep_7yr": _short_year_dep(F.col("amt_7yr"), bonus, "7yr", year),
        "dep_15yr": _short_year_dep(F.col("amt_15yr"), bonus, "15yr", year),
        "dep_bldg": _bldg_year_dep(F.col("amt_bldg"), F.col("building_class"), year, F.col("pis_month")),
    }
    return out


def accumulated_cols(years: Column, bonus: Column) -> Dict[str, Column]:
    """Per-class accumulated-through-``years`` columns (D3)."""
    return {
        "acc_5yr": _short_acc_dep(F.col("amt_5yr"), bonus, "5yr", years),
        "acc_7yr": _short_acc_dep(F.col("amt_7yr"), bonus, "7yr", years),
        "acc_15yr": _short_acc_dep(F.col("amt_15yr"), bonus, "15yr", years),
        "acc_bldg": _bldg_acc_dep(F.col("amt_bldg"), F.col("building_class"), years, F.col("pis_month")),
    }


def standard_depreciation(years: Column) -> Column:
    """D4: straight-line building-class table over the FULL basis
    (cost_seg_calculator.py:244-262)."""
    return F.col("total_depreciable") * _mm_pct(
        F.col("building_class"), years, F.col("pis_month"), True
    ) / 100.0


def with_481a(df: DataFrame) -> DataFrame:
    """D6: 481(a) catch-up columns (cost_seg_calculator.py:264-309)."""
    ye = F.col("years_elapsed")
    bonus = F.col("bonus_rate")
    acc = accumulated_cols(ye, bonus)
    should_have = acc["acc_5yr"] + acc["acc_7yr"] + acc["acc_15yr"] + acc["acc_bldg"]
    did_take = standard_depreciation(ye)
    cur = year_depreciation_cols(ye + 1, bonus)
    current_total = cur["dep_5yr"] + cur["dep_7yr"] + cur["dep_15yr"] + cur["dep_bldg"]
    zero = ye == 0
    y1 = year_depreciation_cols(F.lit(1), bonus)
    y1_total = y1["dep_5yr"] + y1["dep_7yr"] + y1["dep_15yr"] + y1["dep_bldg"]
    return df.select(
        "*",
        F.when(zero, 0.0).otherwise(should_have).alias("should_have_taken"),
        F.when(zero, 0.0).otherwise(did_take).alias("did_take"),
        F.when(zero, 0.0).otherwise(should_have - did_take).alias("catch_up_adjustment"),
        F.when(zero, y1_total).otherwise(current_total).alias("current_year_total"),
        F.when(zero, y1_total).otherwise(should_have - did_take + current_total).alias(
            "total_current_year_benefit"
        ),
    )


def depreciation_schedule(
    df: DataFrame, years: Optional[int] = None, full_horizon: bool = False
) -> DataFrame:
    """W1/W2 + D5/D3: explode the year grid, one row per (doc, year).

    Shuffle-free: ``explode(sequence(...))`` is partition-local and all
    per-year values are literal-array lookups. ``years=None`` with
    ``full_horizon`` picks 29/41 by building class
    (RCGV .../service/api.py:503-506); default 10
    (cost_seg_calculator.py:352).
    """
    if years is not None:
        n_years = F.lit(years)
    elif full_horizon:
        expr = None
        for cls, n in FULL_HORIZON.items():
            cond = F.col("building_class") == cls
            expr = F.when(cond, n) if expr is None else expr.when(cond, n)
        n_years = expr.otherwise(10)
    else:
        n_years = F.lit(10)

    grid = df.select("*", F.explode(F.sequence(F.lit(1), n_years)).alias("year"))
    bonus = F.col("bonus_rate")
    year = F.col("year")
    dep = year_depreciation_cols(year, bonus)
    acc = accumulated_cols(year, bonus)
    dep_total = dep["dep_5yr"] + dep["dep_7yr"] + dep["dep_15yr"] + dep["dep_bldg"]
    acc_total = acc["acc_5yr"] + acc["acc_7yr"] + acc["acc_15yr"] + acc["acc_bldg"]
    # D10 dual schedule in one pass: trad = bonus_override 0
    trad_dep = year_depreciation_cols(year, F.lit(0.0))
    trad_total = trad_dep["dep_5yr"] + trad_dep["dep_7yr"] + trad_dep["dep_15yr"] + trad_dep["dep_bldg"]
    # W3/D4: std_dep = acc_std(y) − acc_std(y−1), computed analytically
    # (no window needed — the lag of a closed form is a closed form)
    std_acc = standard_depreciation(year)
    std_prev = standard_depreciation(year - 1)
    return grid.select(
        "*",
        (F.col("acq_year") + year - 1).alias("calendar_year"),  # W4
        *[v.alias(k) for k, v in dep.items()],
        dep_total.alias("depreciation_total"),
        *[v.alias(k) for k, v in acc.items()],
        acc_total.alias("accumulated_total"),
        trad_total.alias("trad_cost_seg"),
        dep_total.alias("bonus_dep"),
        dep_total.alias("cost_seg_est"),
        (std_acc - std_prev).alias("std_dep"),
        std_acc.alias("std_acc"),
    )


def schedule_totals(schedule: DataFrame, keys: List[str]) -> DataFrame:
    """A4: per-document schedule column sums (engine/quote_calc.py:304-306)."""
    return schedule.groupBy(*keys).agg(
        F.sum("std_dep").alias("total_std_dep"),
        F.sum("trad_cost_seg").alias("total_trad_cost_seg"),
        F.sum("bonus_dep").alias("total_bonus_dep"),
        F.sum("cost_seg_est").alias("total_cost_seg_est"),
        F.max("accumulated_total").alias("final_accumulated_total"),
    )


def renest_schedule(schedule: DataFrame, keys: List[str]) -> DataFrame:
    """Re-nest (doc, year) rows into an ordered array-of-structs column —
    the document-assembly shape of §3.3 step 8."""
    row = F.struct(
        F.col("year"), F.col("calendar_year"), F.col("std_dep"),
        F.col("trad_cost_seg"), F.col("bonus_dep"), F.col("cost_seg_est"),
        F.col("accumulated_total"),
    )
    return (
        schedule.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(F.struct(F.col("year").alias("y"), row.alias("r")))).alias("_s"))
        .select(*keys, F.transform(F.col("_s"), lambda x: x["r"]).alias("schedule"))
    )


# ----------------------------------------------------------------------
# J4 as a broadcast dim (for the oracle-checked query)
# ----------------------------------------------------------------------
def macrs_table_df(spark: SparkSession) -> DataFrame:
    """Long-format MACRS dim: (asset_class, year, month, pct).

    HY classes use month=0. The broadcast-join form of
    macrs_tables.py:90-117 (J4).
    """
    rows = []
    for cls, vals in HY_TABLES.items():
        for y, pct in enumerate(vals, 1):
            rows.append((cls, y, 0, float(pct)))
    for cls in ("27.5yr", "39yr"):
        for y, months in enumerate(MACRS_MM[cls], 1):
            for m, pct in enumerate(months, 1):
                rows.append((cls, y, m, float(pct)))
    return spark.createDataFrame(rows, "asset_class string, year int, month int, pct double")
