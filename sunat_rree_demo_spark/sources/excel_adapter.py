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
    return (label == "" or low == "nan" or low.startswith("incluye")
            or low.startswith("total") or len(label) < 3)


def parse_products_sheet(rows: Rows, year: int, flow: str,
                         label_col: int = 0) -> list[tuple]:
    """S5+S6 — category rows from header+3 downward, noise-filtered,
    zero/NaN cells skipped, unpivoted; one Total record per surviving
    category when the Total column is present (etl_products.py:57-92)."""
    hdr = find_header_row(rows)
    months, total_col = month_columns(rows[hdr])
    out: list[tuple] = []
    for row in rows[hdr + 3:]:
        label = _clean(row[label_col] if label_col < len(row) else None)
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


def load_workbook_sheets(path: str) -> dict[str, Rows]:
    """S1 — gated openpyxl loader: {sheet_name: rows} for year sheets."""
    try:
        import openpyxl
    except ImportError as e:  # pragma: no cover - not installed here
        raise ImportError(
            "openpyxl not available; feed parse_*_sheet with row-lists "
            "or use pre-built long-format parquet (sources.trade)") from e
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
