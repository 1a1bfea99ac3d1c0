"""EDA job — Spark rebuild of ``eda.py``: trend smoothing, seasonality
matrix, σ-outlier detection and the summary report (``eda.py:27-298``).
Charts (plotly HTML sinks, S11) are presentation-edge and out of engine
scope; the report is the collected metric bundle rendered to Markdown.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from sunat_rree_demo_spark.operators.analytics import (
    monthly_profile,
    seasonality_matrix,
    sigma_outliers,
)
from sunat_rree_demo_spark.operators.windows import rolling_mean, series_window


def monthly_base(kpi_monthly: DataFrame) -> DataFrame:
    """The EDA working set: months with a complete balance (the
    reference reads ``WHERE balance IS NOT NULL``, eda.py:27 — months
    missing a flow are excluded from every EDA stat), in billions."""
    return kpi_monthly.filter(F.col("balance").isNotNull()).select(
        "year", "month_num",
        (F.col("export") / 1e9).alias("export_bn"),
        (F.col("import") / 1e9).alias("import_bn"),
        (F.col("balance") / 1e9).alias("balance_bn"),
    )


def trend_series(base: DataFrame) -> DataFrame:
    """12/24-month rolling trend (eda.py:126-127)."""
    w = series_window()
    return base.select(
        "year", "month_num", "export_bn",
        rolling_mean("export_bn", 12, w, ndigits=4).alias("ma12"),
        rolling_mean("export_bn", 24, w, ndigits=4).alias("ma24"),
    )


def summary(base: DataFrame) -> dict[str, Any]:
    """The eda_summary.md stat bundle (eda.py:243-298 /
    reports/eda/eda_summary.md): mean/std/max exports, surplus share,
    best/worst calendar month, outlier count — one reduction each, all
    on the tiny monthly grain."""
    stats = base.agg(
        F.count("*").alias("n_months"),
        F.round(F.avg("export_bn"), 2).alias("mean_export_bn"),
        F.round(F.stddev_samp("export_bn"), 2).alias("std_export_bn"),
        F.round(F.max("export_bn"), 2).alias("max_export_bn"),
        F.sum(F.when(F.col("balance_bn") > 0, 1).otherwise(0)).alias("surplus_months"),
    ).first().asDict()

    peak = (base.orderBy(F.desc("export_bn"), "year", "month_num")
            .select("year", "month_num").first())
    stats["peak_year"], stats["peak_month"] = (peak.year, peak.month_num) if peak else (None, None)

    profile = monthly_profile(base, value_col="export_bn").collect()
    if profile:
        best = max(profile, key=lambda r: r.mean_value)
        worst = min(profile, key=lambda r: r.mean_value)
        stats["best_calendar_month"] = best.month_num
        stats["worst_calendar_month"] = worst.month_num

    stats["n_outliers"] = sigma_outliers(
        base, "export_bn", order=["year", "month_num"]).count()
    return stats


def report_markdown(stats: dict[str, Any]) -> str:
    """Render the summary as the eda_summary.md shape (eda.py:243-298)."""
    if not stats.get("n_months") or stats.get("peak_month") is None:
        return "# EDA Summary\n\n- No data in the selected range\n"
    surplus_pct = (100.0 * stats["surplus_months"] / stats["n_months"]
                   if stats.get("n_months") else 0.0)
    return (
        "# EDA Summary\n\n"
        f"- Mean monthly exports: ${stats['mean_export_bn']}B\n"
        f"- Std monthly exports: ${stats['std_export_bn']}B\n"
        f"- Max monthly exports: ${stats['max_export_bn']}B "
        f"({stats['peak_year']}-{stats['peak_month']:02d})\n"
        f"- Surplus months: {stats['surplus_months']}/{stats['n_months']} "
        f"({surplus_pct:.1f}%)\n"
        f"- Outliers (|Δ%| > 2σ): {stats['n_outliers']}\n"
    )


def run_eda(kpi_monthly: DataFrame) -> dict[str, Any]:
    """Full EDA pass; returns the stat bundle (the report string under
    'report', the seasonality matrix row count under 'seasonality_rows')."""
    base = monthly_base(kpi_monthly)
    stats = summary(base)
    stats["seasonality_rows"] = seasonality_matrix(
        base, value_col="export_bn").count()
    stats["report"] = report_markdown(stats)
    return stats
