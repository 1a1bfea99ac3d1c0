"""Spark-native Excel source via the Python DataSource API (Spark 4):
``spark.read.format("trade_xlsx")`` over the reference's trade
workbooks, planned as ONE INPUT PARTITION PER (workbook, year-sheet).

The reference ingests workbooks single-process on the driver
(etl.py:15-18, 76-79 — openpyxl loops); ``excel_adapter`` reproduces
that faithfully for parity. This module is the scale form: sheet
discovery at planning time costs one zip central-directory +
workbook.xml read per file, and each sheet parses on an EXECUTOR with
the same stdlib OOXML reader, so a drop of ten thousand monthly
workbooks fans out across the cluster instead of serializing through
the driver. Emitted rows are identical to
``excel_adapter.trade_from_workbooks`` (pinned by test).

Usage::

    spark.dataSource.register(TradeXlsxDataSource)
    df = (spark.read.format("trade_xlsx")
          .option("export", "/path/exports.xlsx")
          .option("import", "/path/imports.xlsx")
          .option("table", "national")          # or "products"
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from sunat_rree_demo_spark.sources.excel_adapter import (
    is_year_sheet,
    parse_national_sheet,
    parse_products_sheet,
    read_xlsx_rows,
)
from sunat_rree_demo_spark.sources.trade import (
    TRADE_PROD_SCHEMA,
    TRADE_SCHEMA,
)


def list_year_sheets(path: str) -> list[str]:
    """Names of year sheets in a workbook — planning-time metadata only
    (zip central directory + workbook.xml; no sheet XML is parsed)."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") or "" for s in wb.iter(f"{ns}sheet")
            if is_year_sheet(s.get("name") or "")]


class SheetPartition(InputPartition):
    def __init__(self, path: str, flow: str, sheet: str):
        self.path, self.flow, self.sheet = path, flow, sheet


class TradeXlsxReader(DataSourceReader):
    def __init__(self, options):
        self.table = options.get("table", "national")
        self.books = [(flow, options[flow])
                      for flow in ("export", "import") if flow in options]
        if not self.books:
            raise ValueError(
                "trade_xlsx needs at least one of option('export', path) / "
                "option('import', path)")

    def partitions(self):
        return [SheetPartition(path, flow, sheet)
                for flow, path in self.books
                for sheet in list_year_sheets(path)]

    def read(self, partition: SheetPartition):
        rows = read_xlsx_rows(
            partition.path,
            sheet_filter=lambda n: n == partition.sheet)[partition.sheet]
        parse = (parse_national_sheet if self.table == "national"
                 else parse_products_sheet)
        yield from parse(rows, int(partition.sheet), partition.flow)


class TradeXlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "trade_xlsx"

    def schema(self):
        return (TRADE_SCHEMA if self.options.get("table", "national")
                == "national" else TRADE_PROD_SCHEMA)

    def reader(self, schema) -> TradeXlsxReader:
        return TradeXlsxReader(self.options)
