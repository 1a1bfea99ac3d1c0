"""The Python-DataSource (Spark 4) form of the Excel ingest: must plan
one partition per (workbook, year sheet) and emit exactly the rows of
the driver-side adapter path on the reference's real workbooks."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/data/cdro_G6.xlsx"),
    reason="reference workbook not present")
def test_datasource_matches_adapter_rows(spark):
    from sunat_rree_demo_spark.sources.excel_adapter import (
        load_workbook_sheets,
        trade_from_workbooks,
    )
    from sunat_rree_demo_spark.sources.excel_datasource import (
        TradeXlsxDataSource,
        list_year_sheets,
    )

    path = f"{REF}/data/cdro_G6.xlsx"
    spark.dataSource.register(TradeXlsxDataSource)
    df = (spark.read.format("trade_xlsx")
          .option("export", path).option("table", "national").load())
    got = sorted(map(tuple, df.collect()))

    want = sorted(map(tuple, trade_from_workbooks(
        spark, {"export": load_workbook_sheets(path)}).collect()))
    assert got == want and len(got) > 0

    # distributed plan contract: one partition per year sheet
    sheets = list_year_sheets(path)
    assert df.rdd.getNumPartitions() == len(sheets) > 1


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/data/cdro_F1.xlsx"),
    reason="reference workbook not present")
def test_datasource_products_both_flows(spark):
    from sunat_rree_demo_spark.sources.excel_adapter import (
        load_workbook_sheets,
        trade_prod_from_workbooks,
    )
    from sunat_rree_demo_spark.sources.excel_datasource import (
        TradeXlsxDataSource,
    )

    spark.dataSource.register(TradeXlsxDataSource)
    df = (spark.read.format("trade_xlsx")
          .option("import", f"{REF}/data/cdro_F1.xlsx")
          .option("export", f"{REF}/data/cdro_G1.xlsx")
          .option("table", "products").load())
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, trade_prod_from_workbooks(spark, {
        "import": load_workbook_sheets(f"{REF}/data/cdro_F1.xlsx"),
        "export": load_workbook_sheets(f"{REF}/data/cdro_G1.xlsx"),
    }).collect()))
    assert got == want and len(got) > 0


def test_jsonl_report_writer_commit_protocol(spark, tmp_path):
    """The Python DataSource WRITER: executor-side shard writes, only
    acknowledged shards published, _SUCCESS carries the row count, and
    content equals the source frame."""
    import json
    import os

    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.sources.report_sink import (
        JsonlReportDataSource,
    )
    from tests.conftest import SF_SMOKE

    spark.dataSource.register(JsonlReportDataSource)
    out = str(tmp_path / "report")
    df = (load_table(spark, SF_SMOKE, "documents")
          .select("doc_id", "lang", "n_chars").repartition(3))
    # plant a stale temp shard: commit must clean it, not publish it
    os.makedirs(out)
    with open(f"{out}/_tmp-stale.jsonl", "w") as fh:
        fh.write('{"doc_id": -1}\n')
    (df.write.format("jsonl_report").mode("overwrite")
       .option("path", out).save())

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.startswith("part-")]
    assert "_SUCCESS" in files and len(shards) == 3
    assert not [f for f in files if f.startswith("_tmp-")]

    rows = []
    for s in shards:
        with open(f"{out}/{s}") as fh:
            rows += [json.loads(line) for line in fh]
    want = sorted((r["doc_id"], r["lang"], r["n_chars"])
                  for r in df.collect())
    assert sorted((r["doc_id"], r["lang"], r["n_chars"])
                  for r in rows) == want
    meta = json.load(open(f"{out}/_SUCCESS"))
    assert meta == {"shards": 3, "rows": len(want)}


def test_jsonl_report_overwrite_clears_previous_run(spark, tmp_path):
    """mode('overwrite') must not leave stale shards from a wider
    previous run; mode('append') must number after the existing ones."""
    import json
    import os

    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.sources.report_sink import (
        JsonlReportDataSource,
    )
    from tests.conftest import SF_SMOKE

    spark.dataSource.register(JsonlReportDataSource)
    out = str(tmp_path / "report2")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    (d.repartition(5).write.format("jsonl_report").mode("overwrite")
     .option("path", out).save())
    (d.repartition(2).write.format("jsonl_report").mode("overwrite")
     .option("path", out).save())
    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == 2  # the 5-shard run is fully gone
    n = sum(1 for s in shards for _ in open(f"{out}/{s}"))
    assert n == d.count()
    (d.repartition(3).write.format("jsonl_report").mode("append")
     .option("path", out).save())
    shards = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(shards) == 5 and shards[-1] == "part-00004.jsonl"
    meta = json.load(open(f"{out}/_SUCCESS"))
    assert meta["shards"] == 5
