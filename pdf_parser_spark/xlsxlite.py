"""Minimal dependency-free .xlsx sheet reader (S4 without openpyxl).

An .xlsx file is a zip of XML parts (ECMA-376/ISO 29500). This reads
exactly what the dim-table loader needs — one worksheet as a dense
row-major grid of python values, equivalent to the reference's
``pd.read_excel(path, sheet_name=..., header=None)``
(engine/quote_calc.py:52) — using only ``zipfile`` + ``ElementTree``:

- ``xl/workbook.xml``            sheet name → r:id
- ``xl/_rels/workbook.xml.rels`` r:id → worksheet part
- ``xl/sharedStrings.xml``       shared-string pool (``t="s"`` cells)
- ``xl/worksheets/sheetN.xml``   ``<row>``/``<c r= t=><v>`` cells; for
  formula cells the CACHED ``<v>`` value is used (same as openpyxl's
  data-only mode — the loader needs values, not formulas)

Scope: cell values only (no styles/dates/merges) — sufficient for the
``VLOOKUP Tables`` header-pair discovery (engine/quote_calc.py:58-88);
numbers come back as float, shared/inline strings as str, empty as
None.
"""

from __future__ import annotations

import zipfile
from typing import List, Optional
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB12' → 27 (base-26 letters prefix of the cell ref)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _text_of(si: ET.Element) -> str:
    # an <si> / <is> may split one string across runs: concat every <t>
    return "".join(t.text or "" for t in si.iter(f"{_NS}t"))


def _cell_value(c: ET.Element, shared: List[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return _text_of(is_el) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t in ("str", "e"):  # formula string result / error literal
        return v.text
    try:
        return float(v.text)
    except ValueError:
        return v.text


def read_sheet(path: str, sheet_name: str) -> List[List[Optional[object]]]:
    """The named worksheet as a dense row-major grid (list of equal-
    length rows), values typed as float/str/bool/None."""
    with zipfile.ZipFile(path) as z:
        # real XML parsing (not regex): attribute ORDER is unconstrained
        # in XML and varies by producer, and sheet names may carry
        # entities ('P&amp;L') that need unescaping
        r_id = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = {
            el.get("name"): el.get(r_id)
            for el in wb.iter(f"{_NS}sheet")
        }
        if sheet_name not in sheets:
            raise KeyError(f"sheet {sheet_name!r} not in workbook: {sorted(sheets)}")
        rels_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {
            el.get("Id"): el.get("Target")
            for el in rels.iter(f"{rels_ns}Relationship")
        }
        part = targets[sheets[sheet_name]].lstrip("/")
        if not part.startswith("xl/"):
            part = "xl/" + part
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in root.iter(f"{_NS}si")]
        root = ET.fromstring(z.read(part))

    rows: dict = {}
    max_col = -1
    # running (row, col) cursor: ECMA-376 makes r= optional — an
    # unnumbered row is "previous row + 1" and an unnumbered cell is
    # "previous cell + 1", regardless of whether values were non-empty
    last_r = -1
    for row in root.iter(f"{_NS}row"):
        rref = row.get("r")
        r = int(rref) - 1 if rref else last_r + 1
        last_r = r
        last_j = -1
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            j = _col_index(ref) if ref else last_j + 1
            last_j = j
            val = _cell_value(c, shared)
            if val is not None:
                rows.setdefault(r, {})[j] = val
                max_col = max(max_col, j)
    n_rows = (max(rows) + 1) if rows else 0
    return [
        [rows.get(i, {}).get(j) for j in range(max_col + 1)] for i in range(n_rows)
    ]
