"""Unit tests for the scalar/function layer (the reference's
test_insights.py inline-frame style, SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F


def test_month_maps_roundtrip(spark):
    from sunat_rree_demo_spark.functions.months import (
        MONTH_NAMES_ES,
        month_name_es,
        month_num_from_name,
    )

    df = spark.createDataFrame([Row(n=i + 1) for i in range(12)])
    names = [r.m for r in df.select(month_name_es("n").alias("m")).orderBy("n").collect()]
    assert names == list(MONTH_NAMES_ES)
    back = (df.select(month_name_es("n").alias("m"))
              .select(month_num_from_name("m").alias("n2")).collect())
    assert sorted(r.n2 for r in back) == list(range(1, 13))
    # 'Total' QA rows map to NULL, like the reference's dict .map
    tot = spark.createDataFrame([Row(m="Total")]).select(
        month_num_from_name("m").alias("n")).first()
    assert tot.n is None


def test_safe_div_guards_zero_and_null(spark):
    from sunat_rree_demo_spark.functions.scalars import safe_div

    df = spark.createDataFrame(
        [Row(a=10.0, b=4.0), Row(a=1.0, b=0.0), Row(a=1.0, b=None)])
    out = df.select(safe_div(F.col("a"), F.col("b")).alias("r")).collect()
    assert [r.r for r in out] == [2.5, None, None]


def test_fmt_currency_thresholds(spark):
    from sunat_rree_demo_spark.functions.scalars import fmt_currency

    df = spark.createDataFrame([Row(v=1.2e9), Row(v=5.0e8), Row(v=3.1e3), Row(v=12.0)])
    out = [r.s for r in df.select(fmt_currency(F.col("v")).alias("s")).collect()]
    assert out == ["$1.2B", "$500.0M", "$3.1K", "$12.0"]


def test_bucket_yoy_thresholds(spark):
    from sunat_rree_demo_spark.functions.scalars import bucket_yoy

    df = spark.createDataFrame([Row(y=15.0), Row(y=5.0), Row(y=-5.0),
                                Row(y=-20.0), Row(y=None)])
    out = [r.b for r in df.select(bucket_yoy(F.col("y")).alias("b")).collect()]
    assert out == ["strong_growth", "growth", "soft_decline", "decline", None]


def test_ensure_columns_and_resolve_alias(spark):
    from sunat_rree_demo_spark.operators.relational import (
        ensure_columns,
        resolve_alias,
    )

    df = spark.createDataFrame([Row(year=2024, exp=1.0)])
    df2 = ensure_columns(df, {"imp": None})
    assert "imp" in df2.columns and df2.first().imp is None
    assert resolve_alias(df2, "export", "exp") == "exp"
    try:
        resolve_alias(df2, "nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_in_year_matches_year_equality_and_pushes(spark, tmp_path):
    import shutil

    from sunat_rree_demo_spark.functions.scalars import in_year
    from sunat_rree_demo_spark.plans.lint import plan_string
    from tests.conftest import SF_SMOKE

    # copy to a fresh path: Spark's cache manager matches by logical
    # plan, so reading the shared testdata path would silently resolve
    # to another test's persisted InMemoryRelation (no PushedFilters)
    path = str(tmp_path / "orders.parquet")
    shutil.copy(f"{SF_SMOKE}/orders.parquet", path)
    o = spark.read.parquet(path)
    a = o.filter(in_year("o_orderdate", 1995)).count()
    b = o.filter(F.year("o_orderdate") == 1995).count()
    assert a == b and a > 0
    # the range form reaches the parquet reader; year() does not
    plan = plan_string(o.filter(in_year("o_orderdate", 1995)))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThanOrEqual(o_orderdate" in pushed[0]
