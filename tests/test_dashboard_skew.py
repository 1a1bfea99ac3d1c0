"""Dashboard read-path and skew-utility tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def kpi(spark):
    from sunat_rree_demo_spark.plans.kpi import (
        build_kpi_monthly,
        build_kpi_prod_monthly,
    )
    from sunat_rree_demo_spark.sources.trade import (
        synthetic_trade,
        synthetic_trade_prod,
    )

    return (build_kpi_monthly(synthetic_trade(spark)).cache(),
            build_kpi_prod_monthly(synthetic_trade_prod(spark)).cache())


def test_country_series_scoped_and_ordered(kpi):
    from sunat_rree_demo_spark.plans.dashboard import country_series

    km, _ = kpi
    rows = country_series(km, (2010, 2012)).collect()
    assert {r.year for r in rows} == {2010, 2011, 2012}
    keys = [(r.year, r.month_num) for r in rows]
    assert keys == sorted(keys)


def test_country_heatmap_is_month_by_year(kpi):
    from sunat_rree_demo_spark.plans.dashboard import country_heatmap

    km, _ = kpi
    hm = country_heatmap(km, (2010, 2013))
    assert hm.columns == ["month_num", "2010", "2011", "2012", "2013"]
    assert hm.count() == 12


def test_detail_tail_is_chronological_tail(kpi):
    from sunat_rree_demo_spark.plans.dashboard import country_detail_tail

    km, _ = kpi
    rows = country_detail_tail(km, k=6).collect()
    assert len(rows) == 6
    assert rows[-1].year == 2025 and rows[-1].month_num == 4


def test_top_categories_and_ranking(kpi):
    from sunat_rree_demo_spark.plans.dashboard import (
        ranking_table,
        top_categories,
    )

    _, kp = kpi
    top = top_categories(kp, n_top=3)
    assert len(top) == 3
    rank_exp = ranking_table(kp, 2024, metric="exp", n=5).collect()
    vals = [r.exp for r in rank_exp]
    assert vals == sorted(vals, reverse=True)
    rank_cov = ranking_table(kp, 2024, metric="cov_ratio", n=5).collect()
    assert len(rank_cov) == 5
    with pytest.raises(ValueError):
        ranking_table(kp, 2024, metric="bogus")


def test_category_series_filters(kpi):
    from sunat_rree_demo_spark.plans.dashboard import (
        category_annual,
        category_series,
    )

    _, kp = kpi
    cats = [r.category for r in kp.select("category").distinct().limit(2).collect()]
    filtered = category_series(kp, (2015, 2016), cats)
    assert filtered.select("category").distinct().count() == 2
    annual = category_annual(filtered).collect()
    assert {r.year for r in annual} == {2015, 2016}
    for r in annual:
        assert r.balance == round(r.exp - r.imp, 2)


def test_salted_sum_equals_plain_sum(spark):
    from sunat_rree_demo_spark.operators.skew import salted_sum
    from sunat_rree_demo_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {r.l_returnflag: r.t for r in
             li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("t")).collect()}
    salted = {r.l_returnflag: r.total for r in
              salted_sum(li, ["l_returnflag"], "l_quantity").collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-6 * abs(plain[k])


def test_salted_count_distinct_exact(spark):
    from sunat_rree_demo_spark.operators.skew import salted_count_distinct
    from sunat_rree_demo_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    plain = {r.o_orderpriority: r.n for r in
             o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    salted = {r.o_orderpriority: r.n_distinct for r in
              salted_count_distinct(o, ["o_orderpriority"], "o_custkey").collect()}
    assert plain == salted


def test_broadcast_salted_join_equals_plain_join(spark):
    from sunat_rree_demo_spark.operators.skew import broadcast_salted_join
    from sunat_rree_demo_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    plain = o.join(c, "o_custkey").count()
    salted = broadcast_salted_join(o, c, "o_custkey").count()
    assert plain == salted
