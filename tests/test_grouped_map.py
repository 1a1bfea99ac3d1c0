"""Grouped-map / UDAF surface tests: the applyInPandas base index must
equal the window-expression form; the sample UDAF must equal the
expression aggregate; approx distinct must be within its error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_grouped_map_base_index_equals_window_form(spark):
    from sunat_rree_demo_spark.operators.grouped_map import base_index_grouped_map
    from sunat_rree_demo_spark.plans.kpi import build_kpi_prod_monthly
    from sunat_rree_demo_spark.sources.trade import synthetic_trade_prod

    kpi = build_kpi_prod_monthly(synthetic_trade_prod(spark)).cache()
    gm = base_index_grouped_map(
        kpi.select("category", "year", "month_num", "exp", "imp"))
    merged = kpi.select("category", "year", "month_num", "idx_exp", "idx_imp") \
        .join(gm, ["category", "year", "month_num"])
    bad = merged.filter(
        (F.col("idx_exp") != F.col("idx_exp_gm"))
        | (F.col("idx_imp") != F.col("idx_imp_gm"))).count()
    assert bad == 0


def test_weighted_mean_udaf_equals_expression(spark):
    from sunat_rree_demo_spark.operators.grouped_map import weighted_mean_udaf
    from sunat_rree_demo_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    udaf = {r.l_returnflag: r.weighted_mean
            for r in weighted_mean_udaf(li, "l_returnflag",
                                        "l_extendedprice", "l_quantity").collect()}
    expr = {r.l_returnflag: r.wm
            for r in li.groupBy("l_returnflag")
            .agg((F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                  / F.sum("l_quantity")).alias("wm")).collect()}
    assert udaf.keys() == expr.keys()
    for k in udaf:
        assert abs(udaf[k] - expr[k]) < 1e-6 * abs(expr[k])


def test_approx_distinct_error_bound(spark):
    from sunat_rree_demo_spark.queries import REGISTRY

    approx = {r.c_mktsegment: r.approx_buyers
              for r in REGISTRY["q46_approx_distinct"].fn(spark, SF_SMOKE).collect()}
    exact = {r.c_mktsegment: r.n_buyers
             for r in REGISTRY["q07_count_distinct"].fn(spark, SF_SMOKE).collect()}
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 0.05 * e), (k, approx[k], e)
