"""Excel ingestion adapter tests on synthetic row-lists (the openpyxl
loader is import-gated; the heuristic parsing is pure functions)."""

from __future__ import annotations

import pytest


def _national_sheet() -> list[list]:
    return [
        ["PERÚ: EXPORTACIONES", None, None, None],
        [None, None, None, None],
        ["Sector", "Enero", "Febrero", "Total"],
        [None, None, None, None],
        ["Algo irrelevante", 1.0, 2.0, 3.0],
        ["Total general", 100.5, 200.5, 301.0],
    ]


def _products_sheet() -> list[list]:
    # real-workbook layout: category label in column 2
    # (etl_products.py:64 reads df.iat[r, 2] when the sheet is >2 wide)
    return [
        ["cuadro", None, None, None, None, None],
        [None, None, "Sector", "Enero", "Febrero", "Total"],
        [None, None, "skip1", 0, 0, 0],
        [None, None, "skip2", 0, 0, 0],
        [None, None, "I. Productos Tradicionales", 10.0, 20.0, 30.0],
        [None, None, "Incluye ajustes", 5.0, 5.0, 10.0],     # noise: Incluye…
        [None, None, "ab", 1.0, 1.0, 2.0],                   # noise: len<3
        [None, None, "Total exportaciones", 9.0, 9.0, 18.0], # noise: Total…
        [None, None, "none", 4.0, 4.0, 8.0],                 # noise: 'none'
        [None, None, "Textil y Confecciones", None, 7.5, 7.5],  # NaN skipped
        [None, None, "Químico", 0, 3.0, 3.0],                # zero cell skipped
    ]


def test_header_detection_and_month_columns():
    from sunat_rree_demo_spark.sources.excel_adapter import (
        find_header_row,
        month_columns,
    )

    rows = _national_sheet()
    hdr = find_header_row(rows)
    assert hdr == 2
    months, total_col = month_columns(rows[hdr])
    assert months == {1: "Enero", 2: "Febrero"}
    assert total_col == 3


def test_parse_national_sheet_emits_total_qa_row():
    from sunat_rree_demo_spark.sources.excel_adapter import parse_national_sheet

    recs = parse_national_sheet(_national_sheet(), 2014, "export")
    monthly = [r for r in recs if r[1] != "Total"]
    assert sorted(monthly) == [
        (2014, "Enero", "export", 100.5, None),
        (2014, "Febrero", "export", 200.5, None),
    ]
    total = next(r for r in recs if r[1] == "Total")
    assert total == (2014, "Total", "export", 301.0, 301.0)


def test_parse_products_sheet_noise_filter():
    from sunat_rree_demo_spark.sources.excel_adapter import parse_products_sheet

    recs = parse_products_sheet(_products_sheet(), 2020, "import")
    cats = {r[3] for r in recs}
    assert cats == {"I. Productos Tradicionales", "Textil y Confecciones",
                    "Químico"}
    # zero/NaN cells skipped, Total rows kept per category
    quim = sorted(r for r in recs if r[3] == "Químico")
    assert quim == [(2020, "Febrero", "import", "Químico", 3.0),
                    (2020, "Total", "import", "Químico", 3.0)]


def test_workbook_to_spark_df(spark):
    from sunat_rree_demo_spark.sources.excel_adapter import (
        trade_from_workbooks,
        trade_prod_from_workbooks,
    )

    books = {"export": {"2014": _national_sheet(), "notas": [["x"]]}}
    df = trade_from_workbooks(spark, books)
    assert df.count() == 3  # 2 months + Total; non-year sheet skipped
    assert df.schema["usd"].dataType.typeName() == "double"

    pbooks = {"import": {"2020": _products_sheet()}}
    pdf = trade_prod_from_workbooks(spark, pbooks)
    assert pdf.filter(pdf.month == "Total").count() == 3


def test_year_sheet_filter():
    from sunat_rree_demo_spark.sources.excel_adapter import is_year_sheet

    assert is_year_sheet("2005") and not is_year_sheet("Resumen")
    assert not is_year_sheet("20055")


def test_loader_missing_file():
    """The loader no longer needs openpyxl (stdlib OOXML fallback);
    a missing workbook surfaces as FileNotFoundError, not ImportError."""
    from sunat_rree_demo_spark.sources.excel_adapter import load_workbook_sheets

    with pytest.raises(FileNotFoundError):
        load_workbook_sheets("/nonexistent.xlsx")
