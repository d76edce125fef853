"""Quote pricing engine as native Catalyst expressions (SURVEY §2.4/§2.7/§2.9).

Reimplements both reference tier sets as data-driven expression chains
(constant-folded by Catalyst — the Spark-faithful form of the
reference's hard-coded if-ladders):

- ``v1`` — ``tools/pricing_calculator.py:23-158`` (top-level): MF
  factor 0.5, single-property factor 0.7, zip factor constant 1.0,
  min-of-bids QUIRK at ``:189-198`` (if min < multi take multi ⇒
  net ``max(min(l,g,m), m)``), $100 floor, 0.91 upfront.
- ``v2`` — ``Claude_Code/RCGV_Quote_Assistant-main/tools/
  pricing_calculator.py:22-219``: Excel-derived cost-basis/zip/sqft
  tiers, MF factor 0.4, single-property 1.0, PLAIN min of three bids.

The generic threshold ladder is ALSO exposed as a broadcast range join
(:func:`ladder_join`) — the at-scale form of J1 (``engine/
quote_calc.py:90-99`` ``_ladder_lookup``) used by the oracle-checked
queries in ``__spark_entry__.py``.

The adjustment stack (rush/premium/referral/override) follows
``service/calculator_adapter.py:60-95`` / ``engine/quote_calc.py:129-164``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.rounding import py_round

# ----------------------------------------------------------------------
# tier data (thresholds descending, mirroring the reference if-chains:
# first row whose predicate matches wins)
# ----------------------------------------------------------------------
# (ge_threshold, factor): x >= threshold → factor; last (None, f) = else
COST_BASIS_V1: List[Tuple[Optional[float], float]] = [
    (9_000_000, 1.05), (8_000_000, 1.04), (7_000_000, 1.03), (6_000_000, 1.02),
    (5_000_000, 1.01), (4_000_000, 1.00), (3_000_000, 0.99), (2_000_000, 0.98),
    (1_000_000, 0.97), (750_000, 0.96), (500_000, 0.95), (None, 1.0),
]
COST_BASIS_V2: List[Tuple[Optional[float], float]] = [
    (10_000_000, 1.5), (7_500_000, 1.45), (5_000_000, 1.4), (3_000_000, 1.35),
    (2_000_000, 1.3), (1_500_000, 1.25), (1_250_000, 1.1), (1_000_000, 1.075),
    (750_000, 1.05), (500_000, 1.02), (250_000, 1.01), (None, 1.0),
]
ZIP_V2: List[Tuple[Optional[float], float]] = [
    (90_000, 1.1), (80_000, 1.05), (70_000, 1.0), (60_000, 1.05), (50_000, 1.1),
    (40_000, 1.05), (30_000, 1.0), (20_000, 1.05), (10_000, 1.1), (None, 1.11),
]
FLOORS: List[Tuple[Optional[float], float]] = [
    (11, 1.3), (10, 1.2), (7, 1.15), (4, 1.1), (3, 1.05), (None, 1.0),
]
MULTI_PROP_V1: List[Tuple[Optional[float], float]] = [
    (12, 12.0), (11, 1.3), (8, 1.25), (7, 1.2), (5, 1.15), (4, 1.1),
    (3, 1.05), (2, 1.0), (None, 0.7),
]
MULTI_PROP_V2: List[Tuple[Optional[float], float]] = [
    (12, 12.0), (11, 1.3), (8, 1.25), (7, 1.2), (5, 1.15), (4, 1.1),
    (3, 1.05), (2, 1.0), (None, 1.0),
]

# (le_threshold, factor) ascending: x <= threshold → factor, after the
# leading ==0 special case; tail entries are (ge, factor) overrides
SQFT_V1_LE: List[Tuple[float, float]] = [
    (2_500, 0.8), (5_000, 0.85), (10_000, 0.9), (15_000, 0.95), (20_000, 1.0),
    (30_000, 1.05), (35_000, 1.1), (40_000, 1.15), (45_000, 1.2), (50_000, 1.25),
]
SQFT_V1_ZERO = 0.75
SQFT_V1_GE_TAIL: Tuple[float, float] = (550_000, 9.0)
SQFT_V1_ELSE = 1.0

SQFT_V2_GE: List[Tuple[Optional[float], float]] = [
    (55_000, 1.22), (50_000, 1.2), (45_000, 1.18), (40_000, 1.16), (35_000, 1.14),
    (30_000, 1.12), (20_000, 1.1), (15_000, 1.08), (10_000, 1.06), (5_000, 1.04),
    (2_500, 1.02), (None, 1.0),
]
SQFT_V2_ZERO = 1.0

ACRES_LE: List[Tuple[float, float]] = [
    (0.25, 0.8), (0.5, 0.85), (1, 0.9), (2, 0.95), (3, 1.0), (4, 1.05),
    (5, 1.1), (6, 1.15), (7, 1.2), (8, 1.25),
]
ACRES_ZERO = 0.75
ACRES_GE_TAIL: Tuple[float, float] = (12, 12.0)
ACRES_ELSE = 1.0

PROPERTY_TYPE_V1: Dict[str, float] = {
    "Industrial": 1.01, "Medical": 1.15, "Office": 1.05, "Other": 1.1,
    "Restaurant": 1.15, "Retail": 1.05, "Warehouse": 0.4,
    "Multi Family": 0.5, "Multi-Family": 0.5, "Residential/LTR": 1.05,
    "Short-Term Rental": 1.05,
}
PROPERTY_TYPE_V2: Dict[str, float] = {
    **PROPERTY_TYPE_V1, "Multi Family": 0.4, "Multi-Family": 0.4,
}
PROPERTY_TYPE_DEFAULT = 1.0

RUSH_FEES: Dict[str, float] = {"No Rush": 0.0, "4W $500": 500.0, "2W $1000": 1000.0}

# logistic bid constants (tools/pricing_calculator.py:171-182)
LOGISTIC_X0 = 3500.0
LOGISTIC_L = 15000.0
LOGISTIC_K = 0.01
LINEAR_RATE = 0.0572355 * 0.25 * 0.08  # tools/pricing_calculator.py:20
LINEAR_BASE = 4000.0


# ----------------------------------------------------------------------
# expression builders
# ----------------------------------------------------------------------
def ge_chain(x: Column, tiers: Sequence[Tuple[Optional[float], float]]) -> Column:
    """Descending ``x >= t`` chain — first match wins (if/elif ladder)."""
    expr = None
    for t, factor in tiers:
        if t is None:
            tail = F.lit(float(factor))
        else:
            cond = x >= F.lit(float(t))
            expr = F.when(cond, F.lit(float(factor))) if expr is None else expr.when(cond, F.lit(float(factor)))
    return expr.otherwise(tail) if expr is not None else tail


def le_chain_with_zero(
    x: Column, zero_factor: float, le_tiers: Sequence[Tuple[float, float]],
    ge_tail: Tuple[float, float], else_factor: float,
) -> Column:
    """The sqft/acres shape: ``==0`` special, ascending ``<=`` chain,
    then a ``>= tail`` override, else default."""
    expr = F.when(x == 0.0, F.lit(float(zero_factor)))
    for t, factor in le_tiers:
        expr = expr.when(x <= F.lit(float(t)), F.lit(float(factor)))
    expr = expr.when(x >= F.lit(float(ge_tail[0])), F.lit(float(ge_tail[1])))
    return expr.otherwise(F.lit(float(else_factor)))


def map_chain(x: Column, mapping: Dict[str, float], default: float) -> Column:
    expr = None
    for k, v in mapping.items():
        cond = x == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit(default))


def sqft_factor(x: Column, version: str) -> Column:
    if version == "v1":
        return le_chain_with_zero(x, SQFT_V1_ZERO, SQFT_V1_LE, SQFT_V1_GE_TAIL, SQFT_V1_ELSE)
    return F.when(x == 0.0, F.lit(SQFT_V2_ZERO)).otherwise(ge_chain(x, SQFT_V2_GE))


def acres_factor(x: Column) -> Column:
    return le_chain_with_zero(x, ACRES_ZERO, ACRES_LE, ACRES_GE_TAIL, ACRES_ELSE)


def zip_factor(zip_int: Column, version: str) -> Column:
    if version == "v1":
        return F.lit(1.0)  # tools/pricing_calculator.py:50
    return ge_chain(zip_int.cast("double"), ZIP_V2)


def logistic_bid(building_value: Column) -> Column:
    """F8: L / (1 + e^(-K*(bv-X0)*0.001)) (tools/pricing_calculator.py:171-182)."""
    return F.lit(LOGISTIC_L) / (
        F.lit(1.0)
        + F.exp(F.lit(-LOGISTIC_K) * (building_value - F.lit(LOGISTIC_X0)) * F.lit(0.001))
    )


def coerce_land(pp: Column, land: Column, known: Column) -> Column:
    """F13 land coercion (engine/quote_calc.py:101-107): known ⇒ the
    value IS dollars; else it's a percent (v > 1 ⇒ v/100) or a fraction
    of the purchase price. Null land → 0.0 (the reference's
    ``float(land_value or 0.0)``)."""
    v = F.coalesce(land.cast("double"), F.lit(0.0))
    pct = F.when(v > 1.0, v / 100.0).otherwise(v)
    return F.when(known, v).otherwise(pp * pct)


def compute_pricing(
    df: DataFrame,
    version: str = "v1",
    purchase_price: str = "purchase_price",
    land_value: str = "land_value",
    capex: Optional[str] = "capex",
    zip_code: Optional[str] = "zip_code",
    property_type: str = "property_type",
    sqft_building: str = "sqft_building",
    acres_land: str = "acres_land",
    floors: str = "floors",
    num_properties: str = "num_properties",
    rounding: str = "python",
    known_land_value: Optional[str] = None,
    upfront_ratio: float = 0.91,
) -> DataFrame:
    """One narrow ``select`` adding factors, bids, final bid, payments.

    Zero shuffles, zero UDFs, fully whole-stage-codegen'd: the entire
    /quote/compute endpoint (§3.2) as a column expression.

    ``rounding``: ``python`` reproduces CPython ``round()`` (banker's
    on the exact binary value — the reference's regime,
    ``tools/pricing_calculator.py:198-204``); ``half_up`` uses
    decimal-string HALF_UP (``F.round`` — what DuckDB's ``round`` also
    does, used by the oracle-checked queries). The two differ only on
    values whose shortest repr terminates exactly at 3 decimals in 5,
    e.g. ``pay_50_50`` of an odd-cent bid.

    ``known_land_value``: name of a boolean column enabling F13 land
    coercion (engine/quote_calc.py:101-107) — the land column is then
    dollars when known, else percent-or-fraction of purchase price; the
    coerced amount is emitted as ``land_amount``. Default None keeps
    the tools/pricing_calculator.py contract (land IS dollars).

    ``upfront_ratio``: F10 payment fork — 0.91 in
    tools/pricing_calculator.py:202 and service/api.py:79 (the default),
    0.909 in engine/quote_calc.py:260 (pass 0.909 for engine parity).
    """
    rnd = py_round if rounding == "python" else F.round
    pp = F.col(purchase_price).cast("double")
    lv = F.col(land_value).cast("double")
    if known_land_value is not None:
        lv = coerce_land(pp, lv, F.col(known_land_value).cast("boolean"))
    cx = F.col(capex).cast("double") if capex else F.lit(0.0)
    total_cost = pp + cx

    cb = ge_chain(total_cost, COST_BASIS_V1 if version == "v1" else COST_BASIS_V2)
    zf = zip_factor(F.coalesce(F.col(zip_code), F.lit(85260)) if zip_code else F.lit(85260), version)
    sf = sqft_factor(F.col(sqft_building).cast("double"), version)
    af = acres_factor(F.col(acres_land).cast("double"))
    ptf = map_chain(
        F.col(property_type),
        PROPERTY_TYPE_V1 if version == "v1" else PROPERTY_TYPE_V2,
        PROPERTY_TYPE_DEFAULT,
    )
    ff = ge_chain(F.col(floors).cast("double"), FLOORS)
    mpf = ge_chain(
        F.col(num_properties).cast("double"),
        MULTI_PROP_V1 if version == "v1" else MULTI_PROP_V2,
    )

    base_cost = total_cost * F.lit(LINEAR_RATE) + F.lit(LINEAR_BASE)

    # staged selects: name each big subtree ONCE and reference it by
    # column thereafter — py_round references its argument ~10 times,
    # so inlining the factor chains would blow the expression tree up
    # multiplicatively (Catalyst's CollapseProject keeps non-cheap
    # exprs referenced more than once un-inlined, preserving the DAG)
    stage1 = df.select(
        "*",
        cb.alias("cost_basis_factor"),
        zf.alias("zip_code_factor"),
        sf.alias("sqft_factor"),
        af.alias("acres_factor"),
        ptf.alias("property_type_factor"),
        ff.alias("floors_factor"),
        mpf.alias("multi_prop_factor"),
    )
    linear = (
        base_cost
        * F.col("cost_basis_factor") * F.col("zip_code_factor") * F.col("sqft_factor")
        * F.col("acres_factor") * F.col("property_type_factor")
        * F.col("floors_factor") * F.col("multi_prop_factor")
    )
    land_cols = [lv.alias("land_amount")] if known_land_value is not None else []
    stage2 = stage1.select(
        "*",
        *land_cols,
        linear.alias("_linear_raw"),
        logistic_bid(pp - lv + cx).alias("_logistic_raw"),
        (linear * F.col(num_properties).cast("double")).alias("_multi_raw"),
    )
    l, g, m = F.col("_linear_raw"), F.col("_logistic_raw"), F.col("_multi_raw")
    if version == "v1":
        # O2 quirk (tools/pricing_calculator.py:189-194):
        # min(three) < multi ⇒ take multi — net effect max(min, multi)
        final = F.greatest(F.least(l, g, m), m)
    else:
        final = F.least(l, g, m)
    stage3 = stage2.select(
        "*",
        rnd(l, 2).alias("linear_bid"),
        rnd(g, 2).alias("logistic_bid"),
        rnd(m, 2).alias("multi_properties_bid"),
        rnd(F.greatest(final, F.lit(100.0)), 2).alias("final_bid"),
    )
    fb = F.col("final_bid")
    return stage3.select(
        "*",
        rnd(fb * F.lit(float(upfront_ratio)), 2).alias("pay_upfront"),
        rnd(fb / 2, 2).alias("pay_50_50"),
        rnd(fb / 4, 2).alias("pay_over_time"),
    ).drop("_linear_raw", "_logistic_raw", "_multi_raw")


def with_payment_block(
    df: DataFrame,
    quote: str = "final_quote",
    rush_fee: str = "rush_fee",
    upfront_ratio: float = 0.909,
    rounding: str = "python",
) -> DataFrame:
    """The engine's quote-doc payment block (engine/quote_calc.py:259-270):
    originally_quoted / rounded rush fee / pay_upfront (×0.909 — the F10
    fork) / pay_50_50 / pay_over_time_amount + the fixed note. Input
    must not already carry these names (case-insensitive resolver)."""
    rnd = py_round if rounding == "python" else F.round
    q = F.col(quote).cast("double")
    # CASE-INSENSITIVE presence test, matching how every other column
    # here resolves (a case-mismatched fee column must not silently
    # become 0.00 in a block whose point is byte-exact engine parity)
    has_rush = bool(rush_fee) and rush_fee.lower() in {c.lower() for c in df.columns}
    rf = F.coalesce(F.col(rush_fee).cast("double"), F.lit(0.0)) if has_rush else F.lit(0.0)
    return df.select(
        "*",
        rnd(q, 2).alias("originally_quoted"),
        rnd(rf, 2).alias("rush_fee_quoted"),
        rnd(q * F.lit(float(upfront_ratio)), 2).alias("pay_upfront_engine"),
        rnd(q / 2, 2).alias("pay_50_50_engine"),
        rnd(q / 4, 2).alias("pay_over_time_amount"),
        F.lit("Up to 36 months").alias("pay_over_time_note"),
    )


def apply_adjustments(
    df: DataFrame,
    base_quote: str = "final_bid",
    rush: str = "rush",
    premium: str = "premium",
    referral: str = "referral",
    price_override: Optional[str] = "price_override",
    referral_uplift: float = 0.10,
    rounding: str = "python",
) -> DataFrame:
    """F11 adjustment stack (service/calculator_adapter.py:60-95)."""
    rnd = py_round if rounding == "python" else F.round
    base = F.col(base_quote)
    rush_fee = map_chain(F.col(rush), RUSH_FEES, 0.0)
    premium_amt = F.when(F.col(premium) == "Yes", base * 0.05).otherwise(F.lit(0.0))
    referral_amt = F.when(F.col(referral) == "No", F.lit(0.0)).otherwise(base * referral_uplift)
    adjusted = base + rush_fee + premium_amt + referral_amt
    if price_override:
        ov = F.col(price_override).cast("double")
        adjusted = F.when(ov.isNotNull() & (ov > 0), ov).otherwise(adjusted)
    return df.select(
        "*",
        rush_fee.alias("rush_fee"),
        rnd(adjusted, 2).alias("final_quote"),
    )


# ----------------------------------------------------------------------
# J1 at scale: the generic ladder as a broadcast range join
# ----------------------------------------------------------------------
def ladder_dim(
    spark: SparkSession, tiers: Sequence[Tuple[Optional[float], float]], name: str = "factor"
) -> DataFrame:
    """Build a [lo, hi) interval dim from a descending ge-chain."""
    rows = []
    ordered = [t for t in tiers if t[0] is not None]
    ordered.sort(key=lambda t: t[0])
    lo = float("-inf")
    else_factor = next(f for t, f in tiers if t is None)
    bounds = [t for t, _ in ordered] + [float("inf")]
    rows.append((float("-inf"), float(bounds[0]), float(else_factor)))
    for i, (t, f) in enumerate(ordered):
        rows.append((float(t), float(bounds[i + 1]), float(f)))
    return spark.createDataFrame(rows, schema=f"lo double, hi double, {name} double")


def ladder_join(df: DataFrame, x: str, dim: DataFrame, how: str = "left") -> DataFrame:
    """Broadcast range join: factor of the greatest lo <= x < hi.

    The 100 TB form of ``_ladder_lookup`` (engine/quote_calc.py:90-99):
    dim is tiny → broadcast nested-loop join with a range predicate,
    no shuffle of the fact side.
    """
    xc = F.col(x).cast("double")
    return df.join(
        F.broadcast(dim), (xc >= dim["lo"]) & (xc < dim["hi"]), how
    ).drop("lo", "hi")


# ----------------------------------------------------------------------
# S4/S5: dimension-table loading with header-pair discovery
# (engine/quote_calc.py:52-88)
# ----------------------------------------------------------------------
def discover_ladder(sheet, header: str, factor_header: str, header_row: int = 2):
    """S5: locate a (threshold, factor) ladder by scanning ``header_row``
    for the adjacent header pair (content-addressed, not positional —
    engine/quote_calc.py:58-62), then read down until a non-numeric
    threshold. ``sheet`` is a whole-sheet pandas DataFrame (header=None).
    Returns ascending [(threshold, factor)] like the reference's
    ``_ladder_lookup`` input.
    """
    row = sheet.iloc[header_row]
    col = None
    for j in range(len(row) - 1):
        if str(row[j]).strip() == header and str(row[j + 1]).strip() == factor_header:
            col = j
            break
    if col is None:
        raise KeyError(f"header pair ({header!r}, {factor_header!r}) not found")
    out = []
    for i in range(header_row + 1, len(sheet)):
        t, f = sheet.iloc[i, col], sheet.iloc[i, col + 1]
        try:
            out.append((float(t), float(f)))
        except (TypeError, ValueError):
            break
    out.sort(key=lambda x: x[0])
    return out


def load_ladder_tables(path: str, pairs, sheet_name: str = "VLOOKUP Tables", header_row: int = 2):
    """S4: one-time driver-side dim load → dict of ladders.

    ``.xlsx`` is read by the dependency-free stdlib reader
    (:mod:`.xlsxlite` — zip + XML, value-equivalent to the reference's
    ``pd.read_excel(path, sheet_name=..., header=None)``,
    engine/quote_calc.py:52); ``.csv`` covers the same whole-sheet-scan
    semantics for exported sheets.
    """
    import pandas as pd

    if path.endswith(".xlsx"):
        from .xlsxlite import read_sheet

        sheet = pd.DataFrame(read_sheet(path, sheet_name))
    else:
        sheet = pd.read_csv(path, header=None)
    return {h: discover_ladder(sheet, h, fh, header_row) for h, fh in pairs}


def ladder_dim_from_table(spark: SparkSession, table, name: str = "factor") -> DataFrame:
    """Ascending [(threshold, factor)] → the [lo, hi) broadcast dim of
    :func:`ladder_join` (greatest threshold ≤ x wins; below the first
    threshold → the reference's ladder returns its pre-scan default,
    here the first factor — engine/quote_calc.py:93-99 keeps `val`
    initialized to the first row)."""
    rows = [(float("-inf"), float(table[0][0]), float(table[0][1]))]
    for i, (t, f) in enumerate(table):
        hi = float(table[i + 1][0]) if i + 1 < len(table) else float("inf")
        rows.append((float(t), hi, float(f)))
    return spark.createDataFrame(rows, schema=f"lo double, hi double, {name} double")
