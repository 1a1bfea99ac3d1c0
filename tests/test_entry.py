"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["year", "export_total", "import_total", "balance"]


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(sqls) <= set(qs)


def test_wrapped_query_runs(spark):
    qs = entrymod.queries()
    df = qs["q01_annual_balance"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
