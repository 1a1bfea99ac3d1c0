"""End-to-end ingestion of the IMPORT trade workbook through a real
.xlsx file. The reference reads imports from data/cdro_F8.xlsx
(etl.py:15-18), which is not committed upstream — so this synthesizes a
workbook in that exact layout (year-named sheets, 'Enero' header row,
'Total general' anchor, per-sheet Total column; etl.py:23-52) with the
stdlib zip/XML writer below, runs the FULL adapter path
(file → read_xlsx_rows → parse_national_sheet → Spark DataFrame), and
asserts the flow='import' rows reconcile the way etl.py's qa_report
checks them (annual Total vs sum of months)."""

from __future__ import annotations

import zipfile

import pytest

MONTHS = ["Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio", "Julio",
          "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre"]


def _col_letters(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(rows: list[list]) -> bytes:
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    body = []
    for rn, row in enumerate(rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letters(ci)}{rn}"
            if isinstance(v, str):
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{v}</t>'
                             f"</is></c>")
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f'<row r="{rn}">{"".join(cells)}</row>')
    return (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{ns}"><sheetData>{"".join(body)}'
            f"</sheetData></worksheet>").encode()


def write_minimal_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Standards-minimal OOXML workbook (ECMA-376): inline-string cells,
    no sharedStrings/styles — exactly the parts the adapter's stdlib
    reader consumes, laid out like a real Excel export."""
    ct_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(1, len(sheets) + 1))
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{ct_overrides}</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    sheet_entries = "".join(
        f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">' + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)) + "</Relationships>")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(rows))


def _f8_style_sheet(year: int, base: float) -> list[list]:
    """One year sheet in the cdro_F8 national layout: title clutter,
    'Enero'…'Diciembre' + 'Total' header, category rows, and the
    'Total general' anchor row the adapter extracts (etl.py:29-52)."""
    monthly = [round(base + 7.5 * m, 2) for m in range(12)]
    return [
        [f"PERÚ: IMPORTACIONES {year}", None],
        [None],
        ["Sector", *MONTHS, "Total"],
        [None],
        ["I. Bienes de consumo", *[round(v / 3, 2) for v in monthly],
         round(sum(v / 3 for v in monthly), 2)],
        ["Total general", *monthly, round(sum(monthly), 2)],
        ["Fuente: SUNAT", None],
    ]


@pytest.fixture(scope="module")
def import_workbook(tmp_path_factory):
    d = tmp_path_factory.mktemp("books")
    path = str(d / "cdro_F8_synthetic.xlsx")
    write_minimal_xlsx(path, {
        "Índice": [["no es hoja de año"]],  # filtered by is_year_sheet
        "2014": _f8_style_sheet(2014, 100.0),
        "2015": _f8_style_sheet(2015, 250.0),
    })
    return path


def test_import_flow_end_to_end(spark, import_workbook):
    from sunat_rree_demo_spark.sources.excel_adapter import (
        load_workbook_sheets,
        trade_from_workbooks,
    )

    sheets = load_workbook_sheets(import_workbook)
    assert set(sheets) == {"2014", "2015"}  # the index sheet is filtered

    df = trade_from_workbooks(spark, {"import": sheets})
    rows = df.collect()
    assert {r.flow for r in rows} == {"import"}

    for year in (2014, 2015):
        monthly = {r.month: r.usd for r in rows
                   if r.year == year and r.month != "Total"}
        assert sorted(monthly) == sorted(MONTHS)  # all 12 months unpivot
        total = next(r for r in rows if r.year == year and r.month == "Total")
        # etl.py qa_report reconciliation: the book's annual Total must
        # equal the sum of the extracted months (both via the adapter)
        assert total.sum_months == pytest.approx(sum(monthly.values()))
        assert total.usd == pytest.approx(total.sum_months)


def test_both_flows_concatenate(spark, import_workbook):
    """etl.py:76-79 runs one parse per flow and concatenates: the
    import workbook plus a synthetic export book must land in one frame
    with both flow tags and independent values."""
    from sunat_rree_demo_spark.sources.excel_adapter import (
        load_workbook_sheets,
        trade_from_workbooks,
    )

    imp = load_workbook_sheets(import_workbook)
    exp = {"2014": [["EXPORTACIONES", None],
                    ["Sector", "Enero", "Febrero", "Total"],
                    ["Total general", 11.0, 22.0, 33.0]]}
    df = trade_from_workbooks(spark, {"import": imp, "export": exp})
    by_flow = {r.flow for r in df.collect()}
    assert by_flow == {"import", "export"}
    exp_total = next(r for r in df.collect()
                     if r.flow == "export" and r.month == "Total")
    assert exp_total.usd == 33.0 and exp_total.sum_months == 33.0
