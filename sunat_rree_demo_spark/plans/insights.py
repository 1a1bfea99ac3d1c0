"""Rule-based narrative insight layer — Spark rebuild of
``insights_engine.py``: the distributed part is a top-k reduction
(orderBy |YoY| desc, limit k — TakeOrderedAndProject, never a full
sort); only the ≤k collected records are templated into Markdown on the
driver (``insights_engine.py:82-125`` does the same post-collect).

The thresholds, emojis and bucket boundaries mirror the reference
(``insights_engine.py:28-37,94-105``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from sunat_rree_demo_spark.functions.months import MONTH_NAMES_ES
from sunat_rree_demo_spark.operators.relational import resolve_alias

_MONTH_ABBR = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def month_abbrev(mes: str) -> str:
    """'Enero' → 'Jan' (``insights_engine.py:7-17``)."""
    try:
        return _MONTH_ABBR[MONTH_NAMES_ES.index(mes)]
    except ValueError:
        return mes[:3]


def format_currency(value: float) -> str:
    """M/B/K formatting (``insights_engine.py:19-26``)."""
    if abs(value) >= 1e9:
        return f"{value / 1e9:.1f}B"
    if abs(value) >= 1e6:
        return f"{value / 1e6:.1f}M"
    return f"{value / 1e3:.1f}K"


def trend_emoji(yoy: float) -> str:
    """YoY bucket → emoji (``insights_engine.py:28-37``)."""
    if yoy > 10:
        return "🚀"
    if yoy > 0:
        return "📈"
    if yoy > -10:
        return "📉"
    return "⚠️"


def _action(yoy: float) -> tuple[str, str]:
    """Recommendation buckets (``insights_engine.py:94-105``)."""
    if yoy > 15:
        return (f"Intensify trade promotion and expand capacity. "
                f"Target: +{yoy * .1:.0f}% additional in Q4.", "DGCE + MINCETUR")
    if yoy > 5:
        return "Consolidate the positive trend with focused trade missions.", \
               "Oficinas Comerciales"
    if yoy > -5:
        return "Monitor closely and prepare market-diversification strategies.", \
               "DGIP"
    return "Review sector policy and consider targeted incentives.", \
           "DGCE + Gremios"


def top_insight_records(kpi_prod: DataFrame, top_n: int = 3) -> list[dict[str, Any]]:
    """The distributed reduction: latest year → dropna → top-n by |YoY|
    (``insights_engine.py:44-78``)."""
    if not kpi_prod.columns or kpi_prod.isEmpty():
        return []
    yoy_col = resolve_alias(kpi_prod, "exp_yoy", "%YoY_exp")
    latest = kpi_prod.agg(F.max("year")).first()[0]
    sub = (
        kpi_prod.filter(F.col("year") == latest)
        .na.drop(subset=[c for c in (yoy_col, "balance") if c in kpi_prod.columns])
        .orderBy(F.desc(F.abs(F.col(yoy_col))), F.asc("category"))
        .limit(top_n)
    )
    # normalize the resolved YoY column to 'exp_yoy' so downstream
    # templating works for either supported schema
    if yoy_col != "exp_yoy":
        sub = sub.withColumn("exp_yoy", F.col(yoy_col))
    return [r.asDict() for r in sub.collect()]


def build_insights(kpi_prod: DataFrame, top_n: int = 3) -> list[str]:
    """Markdown insight cards (``insights_engine.py:39-127``)."""
    records = top_insight_records(kpi_prod, top_n)
    if not records:
        return ["📊 **Sin datos para el período seleccionado**\n\n"
                "Ajusta los filtros para ver insights."]
    out = []
    for i, rec in enumerate(records, 1):
        yoy = rec.get("exp_yoy") or 0.0
        balance = rec.get("balance") or 0.0
        category = rec.get("category", "N/A")
        action, responsible = _action(yoy)
        trend = "crecieron" if yoy > 0 else "decrecieron"
        balance_txt = "superávit" if balance > 0 else "déficit"
        out.append(
            f"### {trend_emoji(yoy)} **Insight #{i}: {category}**\n\n"
            f"**📊 Hallazgo:** Las exportaciones de **{category}** {trend} "
            f"**{yoy:+.1f}% YoY** en {month_abbrev(rec.get('month', 'Dic'))} "
            f"{rec.get('year')}.\n\n"
            f"**💰 Impacto:** Contribuye con US$ {format_currency(abs(balance))} "
            f"al {balance_txt} comercial.\n\n"
            f"**🎯 Acción:** {action}\n"
            f"- **Responsable:** {responsible}\n"
        )
    return out


def build_summary_insights(kpi_monthly: DataFrame,
                           kpi_prod: DataFrame) -> list[str]:
    """Executive summary: national totals + leading category
    (``insights_engine.py:129-192``) — two small aggregates, one
    top-1."""
    if kpi_monthly.isEmpty() or kpi_prod.isEmpty():
        return ["📊 **Datos insuficientes para generar resumen ejecutivo**"]
    latest = kpi_monthly.agg(F.max("year")).first()[0]
    nat = (kpi_monthly.filter(F.col("year") == latest)
           .agg(F.sum("export").alias("exp"), F.sum("import").alias("imp")).first())
    total_exp = nat.exp or 0.0
    balance = total_exp - (nat.imp or 0.0)
    exp_col = resolve_alias(kpi_prod, "exp", "export")
    top = (kpi_prod.filter(F.col("year") == latest)
           .groupBy("category").agg(F.sum(exp_col).alias("v"))
           .orderBy(F.desc("v"), F.asc("category")).limit(1).collect())
    top_cat, top_val = (top[0].category, top[0].v) if top else ("N/A", 0.0)
    pct = top_val / total_exp * 100 if total_exp > 0 else 0.0
    return [
        f"## 📈 **Resumen Ejecutivo - {latest}**\n\n"
        f"- **Exportaciones totales:** US$ {format_currency(total_exp)}\n"
        f"- **Balance comercial:** US$ {format_currency(balance)} "
        f"({'superávit' if balance > 0 else 'déficit'})\n"
        f"- **Top categoría:** {top_cat} — US$ {format_currency(top_val)} "
        f"({pct:.1f}% del total)\n"
    ]


def quick_stats(kpi_prod: DataFrame) -> dict[str, Any]:
    """Latest year, active categories, best month, YoY volatility
    (``insights_engine.py:194-234``) — one small aggregate bundle."""
    if kpi_prod.isEmpty():
        return {"error": "Sin datos"}
    exp_col = resolve_alias(kpi_prod, "exp", "export")
    latest = kpi_prod.agg(F.max("year")).first()[0]
    best = (
        kpi_prod.filter((F.col("year") == latest) & F.col(exp_col).isNotNull()
                        & (F.col(exp_col) > 0))
        .orderBy(F.desc(exp_col), F.asc("month")).limit(1).collect())
    vol = 0.0
    if "exp_yoy" in kpi_prod.columns:
        v = kpi_prod.agg(F.stddev_samp("exp_yoy")).first()[0]
        vol = v or 0.0
    n_cat = (kpi_prod.select(F.countDistinct("category")).first()[0]
             if "category" in kpi_prod.columns else 0)
    return {
        "latest_year": latest,
        "active_categories": n_cat,
        "best_month": best[0].month if best else "N/A",
        "volatility": vol,
    }
