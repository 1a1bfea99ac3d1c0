"""End-to-end pipeline — the Spark shape of ``run_pipeline.py``
(SURVEY.md §3.1): where the reference runs five OS subprocesses
communicating through files, this is one lazily-planned job graph inside
a single SparkSession, with partitioned-parquet checkpoints preserving
the warehouse contract (tables ``trade``, ``trade_prod``,
``kpi_monthly``, ``kpi_prod_monthly``).

Stage boundaries become exchange/checkpoint points; the QA gate runs
between ingestion and KPI build and is non-fatal (warn) exactly like
``run_pipeline.py:97-98``.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sunat_rree_demo_spark.plans.eda import run_eda
from sunat_rree_demo_spark.plans.insights import (
    build_insights,
    build_summary_insights,
    quick_stats,
)
from sunat_rree_demo_spark.plans.kpi import save_kpi_tables
from sunat_rree_demo_spark.plans.qa import run_invariants
from sunat_rree_demo_spark.plans.views import register_sql_views


def run_pipeline(spark: SparkSession, trade: DataFrame, trade_prod: DataFrame,
                 warehouse_dir: str) -> dict[str, Any]:
    """ingest → QA gate → materialize facts → KPI build → SQL views →
    EDA → insights. Returns a stage-timing + results manifest (the
    reference prints per-stage wall-clock, run_pipeline.py:15-20)."""
    manifest: dict[str, Any] = {"stages": {}}

    def stage(name):
        t0 = time.monotonic()

        def done(result=None):
            manifest["stages"][name] = round(time.monotonic() - t0, 3)
            return result
        return done

    d = stage("materialize_facts")
    for name, df in (("trade", trade), ("trade_prod", trade_prod)):
        path = f"{warehouse_dir}/{name}"
        df.write.mode("overwrite").partitionBy("year").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
    d()

    d = stage("qa_gate")
    qa = run_invariants(spark.table("trade"), spark.table("trade_prod"))
    manifest["qa"] = {r.name: {"violations": r.violations, "detail": r.detail}
                      for r in qa}
    manifest["qa_ok"] = all(r.ok for r in qa)  # non-fatal, like the reference
    d()

    d = stage("kpi_build")
    manifest["kpi_tables"] = save_kpi_tables(
        spark, spark.table("trade"), spark.table("trade_prod"), warehouse_dir)
    d()

    d = stage("sql_views")
    manifest["views"] = register_sql_views(spark)
    d()

    d = stage("eda")
    manifest["eda"] = run_eda(spark.table("kpi_monthly"))
    d()

    d = stage("insights")
    manifest["insights"] = build_insights(spark.table("kpi_prod_monthly"))
    manifest["summary_insights"] = build_summary_insights(
        spark.table("kpi_monthly"), spark.table("kpi_prod_monthly"))
    manifest["quick_stats"] = quick_stats(spark.table("kpi_prod_monthly"))
    d()

    return manifest
