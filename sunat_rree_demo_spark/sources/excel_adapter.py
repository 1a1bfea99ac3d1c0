"""Excel ingestion adapter (SURVEY.md §2.1, S1-S6) — driver-side by
design: workbooks are a small-file domain (one ~MB file per flow), so
parsing happens on the driver and the result enters the engine through
``spark.createDataFrame`` with the explicit trade schemas. The heuristic
sheet logic is pure functions over row-lists, so it is testable without
any Excel library; the actual ``openpyxl`` loader is import-gated.

Reference behavior reproduced (``etl.py:20-59``, ``etl_products.py:26-92``):
- only sheets named like a year (``^\\d{4}$``) are parsed (S1);
- the header row is auto-detected as the first row containing the
  literal 'Enero' (S2); month columns are the header cells matching a
  Spanish month name, the annual column matches 'Total' (S3);
- national totals come from the first row containing 'Total general'
  (S4), emitted long plus one ``month='Total'`` QA row carrying
  ``sum_months``;
- product categories are the rows below header+3 whose label survives
  the noise filter (empty / 'nan' / 'Incluye…' / 'Total…' / len<3, S5),
  with NaN/''/0 cells skipped (zero cells dropped);
- wide month columns unpivot to (year, month, flow[, category], usd)
  (S6).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sunat_rree_demo_spark.functions.months import MONTH_NAMES_ES
from sunat_rree_demo_spark.sources.trade import TRADE_PROD_SCHEMA, TRADE_SCHEMA

Rows = list[list[Any]]  #: a sheet as openpyxl-style cell values

YEAR_SHEET = re.compile(r"^\d{4}$")


def _clean(v: Any) -> str:
    return str(v).strip() if v is not None else ""


def is_year_sheet(name: str) -> bool:
    """S1 — sheet-name filter (etl.py:25)."""
    return bool(YEAR_SHEET.fullmatch(name))


def find_header_row(rows: Rows) -> int:
    """S2 — first row containing the literal 'Enero' (etl.py:31-34)."""
    for i, row in enumerate(rows):
        if any(_clean(v) == "Enero" for v in row):
            return i
    raise ValueError("no header row containing 'Enero'")


def month_columns(header: list[Any]) -> tuple[dict[int, str], int | None]:
    """S3 — column-index → month-name map + the 'Total' column
    (etl.py:35-37)."""
    months = {i: _clean(v) for i, v in enumerate(header)
              if _clean(v) in MONTH_NAMES_ES}
    total_col = next((i for i, v in enumerate(header) if _clean(v) == "Total"),
                     None)
    return months, total_col


def _num(v: Any) -> float | None:
    try:
        if v is None or _clean(v) == "":
            return None
        return float(v)
    except (TypeError, ValueError):
        return None


def parse_national_sheet(rows: Rows, year: int, flow: str) -> list[tuple]:
    """S4+S6 — the 'Total general' anchor row unpivoted to long records,
    plus the annual QA record (etl.py:39-58)."""
    hdr = find_header_row(rows)
    months, total_col = month_columns(rows[hdr])
    tot_idx = next(i for i, row in enumerate(rows)
                   if any(isinstance(v, str) and "Total general" in v for v in row))
    out = [(year, m, flow, _num(rows[tot_idx][c]), None)
           for c, m in months.items()]
    sum_months = sum(v for *_, v, _n in out if v is not None)
    annual = _num(rows[tot_idx][total_col]) if total_col is not None else None
    out.append((year, "Total", flow, annual, float(sum_months)))
    return out


def _is_noise_label(label: str) -> bool:
    """S5 noise filter (etl_products.py:65-72)."""
    low = label.lower()
    return (label == "" or low in ("nan", "none") or low.startswith("incluye")
            or low.startswith("total") or len(label) < 3)


def parse_products_sheet(rows: Rows, year: int, flow: str,
                         label_col: int | None = None) -> list[tuple]:
    """S5+S6 — category rows from header+3 downward, noise-filtered,
    zero/NaN cells skipped, unpivoted; one Total record per surviving
    category when the Total column is present (etl_products.py:57-92).

    ``label_col`` defaults to the reference's placement: column 2 when
    the sheet is wider than 2 columns (etl_products.py:64
    ``df.iat[r, 2] if df.shape[1] > 2``), else column 0."""
    hdr = find_header_row(rows)
    months, total_col = month_columns(rows[hdr])
    sheet_width = max((len(r) for r in rows), default=0)
    lcol = label_col if label_col is not None else (2 if sheet_width > 2 else 0)
    out: list[tuple] = []
    for row in rows[hdr + 3:]:
        label = _clean(row[lcol] if lcol < len(row) else None)
        if _is_noise_label(label):
            continue
        for c, m in months.items():
            v = _num(row[c] if c < len(row) else None)
            if v is None or v == 0:
                continue
            out.append((year, m, flow, label, v))
        if total_col is not None:
            tv = _num(row[total_col] if total_col < len(row) else None)
            if tv not in (None, 0):
                out.append((year, "Total", flow, label, tv))
    return out


_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'BC12' → 0-based column 54 (A1-notation column letters)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def read_xlsx_rows(path: str, sheet_filter=is_year_sheet) -> dict[str, Rows]:
    """Dependency-free xlsx reader (zipfile + ElementTree over the
    OOXML SpreadsheetML parts — public ECMA-376 format): returns
    {sheet_name: row-lists} with openpyxl ``values_only`` semantics.

    Rows are placed by their 1-based ``r`` attribute (sheet XML omits
    empty rows; positional parsing like find_header_row needs the gaps
    preserved). Cell types: shared string / inline string / formula
    string / boolean / number (float). Styles/dates are not resolved —
    the trade workbooks contain only text headers and numbers."""
    import xml.etree.ElementTree as ET
    import zipfile

    z = zipfile.ZipFile(path)
    names = set(z.namelist())

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        for si in ET.fromstring(z.read("xl/sharedStrings.xml")):
            shared.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))

    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid2target = {rel.get("Id"): rel.get("Target") for rel in rels}
    out: dict[str, Rows] = {}
    for sheet in ET.fromstring(z.read("xl/workbook.xml")).iter(f"{_SSML}sheet"):
        name = sheet.get("name") or ""
        if not sheet_filter(name):
            continue
        # absolute targets ('/xl/worksheets/…') are valid OOXML — strip
        # the leading '/' BEFORE the prefix check or they'd double to
        # 'xl/xl/…' and KeyError out of the archive
        target = rid2target[sheet.get(_RID)].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        rows: Rows = []
        for row in ET.fromstring(z.read(target)).iter(f"{_SSML}row"):
            rnum = int(row.get("r", len(rows) + 1))
            while len(rows) < rnum:
                rows.append([])
            cells = rows[rnum - 1]
            for c in row.iter(f"{_SSML}c"):
                ci = _col_index(c.get("r", ""))
                if ci < 0:
                    ci = len(cells)
                t = c.get("t")
                v = c.find(f"{_SSML}v")
                if t == "inlineStr":
                    is_el = c.find(f"{_SSML}is")
                    val = ("".join(tt.text or "" for tt in
                                   is_el.iter(f"{_SSML}t"))
                           if is_el is not None else None)
                elif v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "str":
                    val = v.text
                elif t == "b":
                    val = v.text == "1"
                elif t == "e":
                    val = None  # error cell ('#DIV/0!' etc.) — not a number
                elif t == "d":
                    val = v.text  # ISO-8601 date cell — keep the string
                else:
                    val = float(v.text)
                while len(cells) <= ci:
                    cells.append(None)
                cells[ci] = val
        out[name] = rows
    return out


def load_workbook_sheets(path: str) -> dict[str, Rows]:
    """S1 — workbook loader: {sheet_name: rows} for year sheets.
    Prefers openpyxl when installed; otherwise the stdlib OOXML reader
    above (same values_only row-lists)."""
    try:
        import openpyxl
    except ImportError:
        return read_xlsx_rows(path)
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    return {ws.title: [list(r) for r in ws.iter_rows(values_only=True)]
            for ws in wb.worksheets if is_year_sheet(ws.title)}


def trade_from_workbooks(spark: SparkSession,
                         books: dict[str, dict[str, Rows]]) -> DataFrame:
    """{flow: {sheet_name: rows}} → trade DataFrame (etl.py:76-79 shape:
    one parse per flow workbook, concatenated)."""
    records: list[tuple] = []
    for flow, sheets in books.items():
        for name, rows in sheets.items():
            if is_year_sheet(name):
                records.extend(parse_national_sheet(rows, int(name), flow))
    return spark.createDataFrame(records, TRADE_SCHEMA)


def trade_prod_from_workbooks(spark: SparkSession,
                              books: dict[str, dict[str, Rows]]) -> DataFrame:
    """{flow: {sheet_name: rows}} → trade_prod DataFrame
    (etl_products.py:167-184 shape)."""
    records: list[tuple] = []
    for flow, sheets in books.items():
        for name, rows in sheets.items():
            if is_year_sheet(name):
                records.extend(parse_products_sheet(rows, int(name), flow))
    return spark.createDataFrame(records, TRADE_PROD_SCHEMA)
