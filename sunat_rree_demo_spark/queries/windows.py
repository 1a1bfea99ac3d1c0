"""M3 window layer (SURVEY.md §7.2): the KPI builders and every window
operator W1-W8 — the analytical core of the reference.

Scale note: each KPI query uses exactly ONE window spec per partitioning
(one exchange+sort serves every lag/rolling/first-value column). The
national KPI series has grain (year, month_num) — already a reduction —
so its unpartitioned window is a few hundred rows no matter the fact
volume; the per-category KPI partitions by category and scales with the
category count, not the data.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.functions.months import month_name_es, month_name_es_sql
from sunat_rree_demo_spark.functions.scalars import safe_div
from sunat_rree_demo_spark.operators.analytics import sigma_outliers
from sunat_rree_demo_spark.operators.sorts import ranked_in_group, tail_k
from sunat_rree_demo_spark.operators.windows import (
    base_index,
    pct_change,
    rolling_mean_exact,
    series_window,
)
from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t

_WIN = "ORDER BY year, month_num"
_FIRST = f"{_WIN} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


def _pct_sql(col: str, n: int, win: str) -> str:
    lag = f"lag({col}, {n}) OVER ({win})"
    return (f"CASE WHEN {lag} IS NOT NULL AND {lag} <> 0 "
            f"THEN round(({col} / {lag} - 1) * 100, 2) END")


def _idx_sql(col: str, win: str) -> str:
    fv = f"first_value({col}) OVER ({win})"
    return (f"round({col} / (CASE WHEN {fv} IS NOT NULL AND {fv} > 0 "
            f"THEN {fv} ELSE 1 END) * 100, 2)")


def _ma_exact_sql(expr: str, n: int, win: str) -> str:
    """Oracle twin of rolling_mean_exact: integer-cents window mean over
    an already-2dp-rounded expression, with the half-away-from-zero
    rounding ALSO done in exact bigint arithmetic (``(2*|total|+cnt) //
    (2*cnt)``) — engine round() on doubles is not cross-engine stable at
    .005 boundaries (see operators/windows.py:rolling_mean_exact)."""
    frame = f"{win} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"
    total = (f"sum(CAST(round(({expr}) * 100, 0) AS BIGINT)) "
             f"OVER ({frame})")
    cnt = f"count({expr}) OVER ({frame})"
    return (f"(CASE WHEN {total} < 0 THEN -1 ELSE 1 END"
            f" * ((2 * abs({total}) + {cnt}) // (2 * {cnt})) / 100.0)")


# ---------------------------------------------------------------------- q24
@register(
    "q24_kpi_monthly",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    base AS (
      SELECT year, month_num, export_usd AS export, import_usd AS "import"
      FROM monthly
    )
    SELECT year,
           {month_name_es_sql("month_num")} AS month,
           month_num, export, "import",
           round(export - "import", 2) AS balance,
           {_pct_sql('export', 1, _WIN)} AS export_mom,
           {_pct_sql('export', 12, _WIN)} AS export_yoy,
           {_pct_sql('"import"', 1, _WIN)} AS import_mom,
           {_pct_sql('"import"', 12, _WIN)} AS import_yoy,
           {_ma_exact_sql('export', 3, _WIN)} AS export_ma3,
           {_ma_exact_sql('"import"', 3, _WIN)} AS import_ma3,
           {_ma_exact_sql('export - "import"', 3, _WIN)} AS balance_ma3,
           {_idx_sql('export', _FIRST)} AS idx_export,
           {_idx_sql('"import"', _FIRST)} AS idx_import
    FROM base
    ORDER BY year, month_num
    """,
    tags=("W1", "W2", "W3", "W4", "W6", "F7", "F8"),
)
def q24_kpi_monthly(spark, sf_dir):
    """kpi_monthly — column-for-column analog of the reference's derived
    table (metrics.py:83-88): MoM/YoY row-offset lags, 3-row trailing
    means (min_periods=1), base-100 indices with zero-guard, Spanish
    month names. One window spec → one sort for all 9 window columns."""
    m = monthly_flows(spark, sf_dir)
    base = m.select(
        "year", "month_num",
        F.col("export_usd").alias("export"),
        F.col("import_usd").alias("import"),
    )
    w = series_window()
    bal = F.col("export") - F.col("import")
    return (
        base
        .withColumn("month", month_name_es("month_num"))
        .withColumn("balance", F.round(bal, 2))
        .withColumn("export_mom", pct_change("export", 1, w))
        .withColumn("export_yoy", pct_change("export", 12, w))
        .withColumn("import_mom", pct_change("import", 1, w))
        .withColumn("import_yoy", pct_change("import", 12, w))
        .withColumn("export_ma3", rolling_mean_exact("export", 3, w))
        .withColumn("import_ma3", rolling_mean_exact("import", 3, w))
        .withColumn("balance_ma3", rolling_mean_exact(bal, 3, w))
        .withColumn("idx_export", base_index("export", w))
        .withColumn("idx_import", base_index("import", w))
        .select("year", "month", "month_num", "export", "import", "balance",
                "export_mom", "export_yoy", "import_mom", "import_yoy",
                "export_ma3", "import_ma3", "balance_ma3",
                "idx_export", "idx_import")
        .orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q25
_CAT_SQL = """
  SELECT p.p_type AS category,
         CAST(year(l.l_shipdate) AS BIGINT) AS year,
         CAST(month(l.l_shipdate) AS BIGINT) AS month_num,
         round(sum(CASE WHEN l.l_returnflag = 'N' THEN l.l_extendedprice END), 2) AS exp,
         round(sum(CASE WHEN l.l_returnflag = 'R' THEN l.l_extendedprice END), 2) AS imp
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
"""

_CWIN = "PARTITION BY category ORDER BY year, month_num"
_CFIRST = f"{_CWIN} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


@register(
    "q25_kpi_prod_monthly",
    oracle=f"""
    WITH base AS ({_CAT_SQL})
    SELECT category, year,
           {month_name_es_sql("month_num")} AS month,
           month_num, exp, imp,
           round(exp - imp, 2) AS balance,
           CASE WHEN imp IS NOT NULL AND imp <> 0
                THEN round(exp / imp * 100, 2) END AS cov_ratio,
           {_pct_sql('exp', 1, _CWIN)} AS exp_mom,
           {_pct_sql('exp', 12, _CWIN)} AS exp_yoy,
           {_pct_sql('imp', 1, _CWIN)} AS imp_mom,
           {_pct_sql('imp', 12, _CWIN)} AS imp_yoy,
           {_ma_exact_sql('exp', 3, _CWIN)} AS exp_ma3,
           {_ma_exact_sql('imp', 3, _CWIN)} AS imp_ma3,
           {_ma_exact_sql('exp - imp', 3, _CWIN)} AS balance_ma3,
           {_idx_sql('exp', _CFIRST)} AS idx_exp,
           {_idx_sql('imp', _CFIRST)} AS idx_imp
    FROM base
    ORDER BY category, year, month_num
    """,
    tags=("W8", "W1", "W2", "W6", "UD1", "Y5", "F9"),
)
def q25_kpi_prod_monthly(spark, sf_dir):
    """kpi_prod_monthly — per-category KPI table
    (metrics_products.py:110-116 column set, category ↔ p_type): lags,
    rolling means and base-index all partitioned by category (W8; the
    grouped first-value index is the window-expression form of UD1,
    metrics_products.py:100-107), plus inf-guarded coverage ratio."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_type").alias("category"),
            F.year("l_shipdate").cast("bigint").alias("year"),
            F.month("l_shipdate").cast("bigint").alias("month_num"),
        )
        .agg(
            F.round(F.sum(F.when(F.col("l_returnflag") == "N",
                                 F.col("l_extendedprice"))), 2).alias("exp"),
            F.round(F.sum(F.when(F.col("l_returnflag") == "R",
                                 F.col("l_extendedprice"))), 2).alias("imp"),
        )
    )
    w = series_window(partition=["category"])
    bal = F.col("exp") - F.col("imp")
    return (
        base
        .withColumn("month", month_name_es("month_num"))
        .withColumn("balance", F.round(bal, 2))
        .withColumn("cov_ratio", F.round(safe_div(F.col("exp"), F.col("imp"), 100.0), 2))
        .withColumn("exp_mom", pct_change("exp", 1, w))
        .withColumn("exp_yoy", pct_change("exp", 12, w))
        .withColumn("imp_mom", pct_change("imp", 1, w))
        .withColumn("imp_yoy", pct_change("imp", 12, w))
        .withColumn("exp_ma3", rolling_mean_exact("exp", 3, w))
        .withColumn("imp_ma3", rolling_mean_exact("imp", 3, w))
        .withColumn("balance_ma3", rolling_mean_exact(bal, 3, w))
        .withColumn("idx_exp", base_index("exp", w))
        .withColumn("idx_imp", base_index("imp", w))
        .select("category", "year", "month", "month_num", "exp", "imp",
                "balance", "cov_ratio", "exp_mom", "exp_yoy", "imp_mom",
                "imp_yoy", "exp_ma3", "imp_ma3", "balance_ma3",
                "idx_exp", "idx_imp")
        .orderBy("category", "year", "month_num")
    )


# ---------------------------------------------------------------------- q26
@register(
    "q26_rolling_trend",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year, month_num,
           {_ma_exact_sql('export_usd', 12, _WIN)} AS ma12,
           {_ma_exact_sql('export_usd', 24, _WIN)} AS ma24
    FROM monthly
    ORDER BY year, month_num
    """,
    tags=("W5",),
)
def q26_rolling_trend(spark, sf_dir):
    """12/24-row trailing trend smoothing (W5, eda.py:126-127), in
    exact integer cents for cross-engine bit parity."""
    m = monthly_flows(spark, sf_dir)
    w = series_window()
    return (
        m.select(
            "year", "month_num",
            rolling_mean_exact("export_usd", 12, w).alias("ma12"),
            rolling_mean_exact("export_usd", 24, w).alias("ma24"),
        ).orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q27
@register(
    "q27_sigma_outliers",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    p AS (
      SELECT year, month_num,
             {_pct_sql('export_usd', 1, _WIN)} AS pct
      FROM monthly
    ),
    s AS (SELECT avg(pct) AS m, stddev_samp(pct) AS sd FROM p)
    SELECT year, month_num, pct
    FROM p, s
    WHERE pct IS NOT NULL AND abs(pct - m) > 2 * sd
    ORDER BY year, month_num
    """,
    tags=("Y1", "A8"),
)
def q27_sigma_outliers(spark, sf_dir):
    """σ-outlier detection on the MoM pct-change series (Y1,
    eda.py:159-166): reduce-to-scalars, broadcast back, filter."""
    m = monthly_flows(spark, sf_dir)
    out = sigma_outliers(m, "export_usd", order=["year", "month_num"])
    return out.select("year", "month_num", "pct").orderBy("year", "month_num")


# ---------------------------------------------------------------------- q28
@register(
    "q28_ranked_in_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey) AS INT)
             AS rank_in_group
    FROM part
    QUALIFY rank_in_group <= 3
    ORDER BY p_brand, rank_in_group
    """,
    tags=("T7", "ranking"),
)
def q28_ranked_in_group(spark, sf_dir):
    """Top-3 per group via row_number (the ranking surface SURVEY §2.5
    notes; parameterized-sort shape of app.py:617-624), deterministic
    tiebreak on the key."""
    p = t(spark, sf_dir, "part")
    return (
        ranked_in_group(p.select("p_brand", "p_partkey", "p_retailprice"),
                        ["p_brand"], "p_retailprice", 3, "p_partkey")
        .orderBy("p_brand", "rank_in_group")
    )


# ---------------------------------------------------------------------- q29
@register(
    "q29_tail_window",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT * FROM (
      SELECT year, month_num, export_usd, import_usd
      FROM monthly ORDER BY year DESC, month_num DESC LIMIT 6
    ) ORDER BY year, month_num
    """,
    tags=("T5",),
)
def q29_tail_window(spark, sf_dir):
    """Chronological tail-k of the detail series (T5, app.py:376
    tail(24)): top-k on the reversed key, re-sorted ascending — never a
    global sort."""
    m = monthly_flows(spark, sf_dir)
    return tail_k(m.select("year", "month_num", "export_usd", "import_usd"),
                  ["year", "month_num"], 6)


# ---------------------------------------------------------------------- q88
@register(
    "q88_rank_distribution",
    oracle="""
    WITH cat AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
             p_type AS category,
             round(sum(l_extendedprice), 2) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2
    )
    SELECT year, category, revenue,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM cat
    WINDOW w AS (PARTITION BY year ORDER BY revenue, category)
    ORDER BY year, revenue, category
    """,
    tags=("windows", "rank-distribution"),
)
def q88_rank_distribution(spark, sf_dir):
    """Distribution-rank window family over per-year category revenue:
    percent_rank, cume_dist, and quartile (ntile) — the W-family
    completeness row the suite lacked. The window orders by
    (revenue, category) so every key is unique: no peer groups, which
    makes percent_rank/cume_dist single-valued and deterministic on
    both engines (revenue is pre-rounded to 2dp; rank ratios are
    integer-quotient doubles rounded at 6dp).

    Scale shape: the category×year aggregate is vocabulary-bounded, so
    the per-year window sorts bounded partitions — never raw facts.
    ntile over an aggregate this size is fine; corpus-grain quantile
    bucketing would use the two-pass percentile-cut pattern (q83)
    instead."""
    from pyspark.sql import Window

    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    cat = (
        li.join(p, p["p_partkey"] == li["l_partkey"])
        .groupBy(F.year("l_shipdate").cast("bigint").alias("year"),
                 F.col("p_type").alias("category"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("year").orderBy("revenue", "category")
    return (
        cat.select(
            "year", "category", "revenue",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("year", "revenue", "category")
    )
