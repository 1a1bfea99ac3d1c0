"""plans/lint.py: each smell detector fires on a crafted plan that HAS
the smell and stays quiet on the corrected twin; then the linter runs
over the headline queries and must report zero error-level findings
(the repo-wide invariant: no cartesians, no row-Python UDFs)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.plans.lint import audit, audit_plan_str
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")


def codes(findings, severity=None):
    return {f.code for f in findings
            if severity is None or f.severity == severity}


def test_global_window_flagged_partitioned_not(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 5)
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    good = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    assert "GLOBAL_WINDOW" in codes(audit(bad))
    assert "GLOBAL_WINDOW" not in codes(audit(good))


def test_cartesian_or_nested_loop_flagged(spark):
    a, b = spark.range(50), spark.range(50).withColumnRenamed("id", "j")
    found = codes(audit(a.crossJoin(b)))
    assert found & {"CARTESIAN", "NESTED_LOOP_JOIN"}
    assert not codes(audit(a.join(b, a.id == b.j))) & {
        "CARTESIAN", "NESTED_LOOP_JOIN"}


def test_row_python_udf_is_error_arrow_is_info(spark):
    plus = F.udf(lambda x: x + 1, "bigint")
    bad = spark.range(10).select(plus("id").alias("y"))
    assert "ROW_PYTHON_UDF" in codes(audit(bad), "error")

    @F.pandas_udf("bigint")
    def plus_v(s):
        return s + 1

    good = spark.range(10).select(plus_v("id").alias("y"))
    f = audit(good)
    assert "ROW_PYTHON_UDF" not in codes(f)
    assert "ARROW_PYTHON_STAGE" in codes(f, "info")


def _cold_lineitem(spark, tmp_path):
    """A parquet read no other test can have cached: Spark's cache
    manager matches by logical plan, so reading the shared testdata
    path could silently resolve to a persisted InMemoryRelation."""
    import shutil

    path = str(tmp_path / "lineitem.parquet")
    shutil.copy(f"{SF_SMOKE}/lineitem.parquet", path)
    return spark.read.parquet(path)


def test_unpushed_filter_detected_on_cold_scan(spark, tmp_path):
    # cold parquet scan: arithmetic on the column side defeats pushdown
    li = _cold_lineitem(spark, tmp_path)
    bad = li.filter((F.col("l_quantity") + 0) > 30)
    good = li.filter(F.col("l_quantity") > 30)
    assert "UNPUSHED_FILTER" in codes(audit(bad))
    assert "UNPUSHED_FILTER" not in codes(audit(good))


def test_cached_table_filter_not_flagged(spark, tmp_path):
    """A filter over a persisted table is absorbed by the
    InMemoryTableScan's in-arguments filters; the cache FILL scan
    legitimately reads the whole table — no UNPUSHED_FILTER."""
    li = _cold_lineitem(spark, tmp_path).persist()
    try:
        cached = li.filter(F.col("l_quantity") > 30)
        assert "UNPUSHED_FILTER" not in codes(audit(cached))
    finally:
        li.unpersist()


def test_exchange_count_reported(spark):
    df = (spark.range(1000).withColumn("g", F.col("id") % 7)
          .groupBy("g").count())
    ex = [f for f in audit(df) if f.code == "EXCHANGES"]
    assert ex and ex[0].severity == "info"


def test_pure_string_analyzer_orders_errors_first():
    plan = ("(1) CartesianProduct\n(2) BatchEvalPython\n"
            "(3) Exchange SinglePartition\n")
    f = audit_plan_str(plan)
    assert [x.severity for x in f][:2] == ["error", "error"]


def test_headline_queries_have_no_error_findings(spark):
    """The generic linter agrees with the per-query contracts: no
    cartesian, no row-Python UDF anywhere in the headline set."""
    from scripts.plan_report import HEADLINE
    from sunat_rree_demo_spark.queries import REGISTRY

    for name in HEADLINE:
        df = REGISTRY[name].fn.__wrapped__(spark, SF_SMOKE)
        errs = codes(audit(df), "error")
        assert not errs, f"{name}: {errs}"


def test_hot_lambda_flagged_materialized_not(spark):
    """An inline tokenizer inside a transform lambda is the O(len²)
    interpreted-HOF trap (r7 finding); the zip-of-slices form over a
    materialized column must stay clean."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c d",)], "text string")
    tok = F.split(F.trim("text"), r"\s+")
    bad = df.select(F.transform(
        F.sequence(F.lit(1), F.size(tok) - 1),
        lambda i: F.element_at(tok, i)).alias("x"))
    assert "HOT_LAMBDA" in codes(audit(bad), "warning")

    tk = F.col("_tok")
    good = (df.select(tok.alias("_tok"))
            .select(F.zip_with(F.slice(tk, 1, F.size(tk) - 1),
                               F.slice(tk, 2, F.size(tk) - 1),
                               lambda a, b: F.concat(a, b)).alias("x")))
    assert "HOT_LAMBDA" not in codes(audit(good))
