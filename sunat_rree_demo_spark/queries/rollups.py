"""M2 rollups & multi-table joins (SURVEY.md §7.2): quarter/annual
re-aggregation, the dim-join chain, seasonality/profile bundles, YTD.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators import aggregates as agg_ops
from sunat_rree_demo_spark.operators.analytics import monthly_profile, ytd_vs_prior
from sunat_rree_demo_spark.operators.windows import yoy_over_annual
from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t


# ---------------------------------------------------------------------- q18
@register(
    "q18_quarterly_rollup",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year,
           CAST(floor((month_num - 1) / 3 + 1) AS INT) AS quarter,
           round(sum(export_usd), 2) AS exports,
           round(sum(import_usd), 2) AS imports,
           round(sum(export_usd) - sum(import_usd), 2) AS balance
    FROM monthly
    GROUP BY 1, 2
    ORDER BY year, quarter
    """,
    tags=("A12",),
)
def q18_quarterly_rollup(spark, sf_dir):
    """Quarterly bucketed re-aggregation of the monthly base (A12,
    models/metrics.sql:56-70)."""
    m = monthly_flows(spark, sf_dir)
    return agg_ops.quarterly_rollup(
        m, export_col="export_usd", import_col="import_usd"
    ).orderBy("year", "quarter")


# ---------------------------------------------------------------------- q19
@register(
    "q19_annual_performance",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    annual AS (
      SELECT year,
             round(sum(export_usd), 2) AS exports,
             round(sum(import_usd), 2) AS imports,
             round(sum(export_usd) - sum(import_usd), 2) AS balance
      FROM monthly GROUP BY year
    )
    SELECT year, exports, imports, balance,
           CASE WHEN lag(exports) OVER (ORDER BY year) IS NOT NULL
                 AND lag(exports) OVER (ORDER BY year) <> 0
                THEN round((exports / lag(exports) OVER (ORDER BY year) - 1) * 100, 2)
           END AS yoy_growth_pct
    FROM annual
    ORDER BY year
    """,
    tags=("W7",),
)
def q19_annual_performance(spark, sf_dir):
    """Window over an aggregate: YoY growth of annual sums (W7 — the
    annual_performance view, models/metrics.sql:73-82). The window runs
    on the per-year reduction, never the raw facts."""
    m = monthly_flows(spark, sf_dir)
    annual = m.groupBy("year").agg(
        F.round(F.sum("export_usd"), 2).alias("exports"),
        F.round(F.sum("import_usd"), 2).alias("imports"),
        F.round(F.sum("export_usd") - F.sum("import_usd"), 2).alias("balance"),
    )
    return yoy_over_annual(annual, value_col="exports").orderBy("year")


# ---------------------------------------------------------------------- q20
@register(
    "q20_region_revenue",
    oracle="""
    SELECT r.r_name AS region,
           CAST(year(o.o_orderdate) AS BIGINT) AS year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    ORDER BY region, year
    """,
    tags=("J1", "A1", "A6"),
)
def q20_region_revenue(spark, sf_dir):
    """The dim-join chain: facts ⋈ orders ⋈ customer ⋈ nation ⋈ region
    (J1 generalized). orders/lineitem co-shuffle on the order key once;
    every dim is broadcast — no fact-side shuffle for dims."""
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, n, r = (t(spark, sf_dir, x) for x in ("customer", "nation", "region"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"),
                       F.year("o_orderdate").cast("bigint").alias("year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.countDistinct("o_orderkey").alias("n_orders"))
        .orderBy("region", "year")
    )


# ---------------------------------------------------------------------- q21
@register(
    "q21_seasonality_matrix",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT month_num, year, export_usd
    FROM monthly
    ORDER BY month_num, year
    """,
    tags=("Y2",),
)
def q21_seasonality_matrix(spark, sf_dir):
    """Seasonality month × year matrix in long form (Y2, eda.py:93-99 —
    the wide pivot is presentation-shaped; the engine emits long so the
    schema is scale-factor-independent)."""
    m = monthly_flows(spark, sf_dir)
    return m.select("month_num", "year", "export_usd").orderBy("month_num", "year")


# ---------------------------------------------------------------------- q22
@register(
    "q22_monthly_profile",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT month_num,
           round(avg(export_usd), 2) AS mean_value,
           round(stddev_samp(export_usd), 2) AS std_value,
           count(export_usd) AS n_obs
    FROM monthly
    GROUP BY month_num
    ORDER BY month_num
    """,
    tags=("Y3", "A11"),
)
def q22_monthly_profile(spark, sf_dir):
    """Per-calendar-month mean±std profile (Y3/A11, app.py:336-338)."""
    m = monthly_flows(spark, sf_dir)
    return monthly_profile(m, value_col="export_usd")


# ---------------------------------------------------------------------- q23
@register(
    "q23_ytd_vs_prior",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    cutoff AS (
      SELECT max(month_num) AS c FROM monthly
      WHERE year = (SELECT max(year) FROM monthly)
    ),
    ytd AS (
      SELECT year,
             round(sum(export_usd), 2) AS ytd_export_usd,
             round(sum(import_usd), 2) AS ytd_import_usd
      FROM monthly, cutoff
      WHERE month_num <= c
      GROUP BY year
    )
    SELECT year, ytd_export_usd, ytd_import_usd,
           CASE WHEN lag(ytd_export_usd) OVER (ORDER BY year) IS NOT NULL
                 AND lag(ytd_export_usd) OVER (ORDER BY year) <> 0
                THEN round((ytd_export_usd / lag(ytd_export_usd) OVER (ORDER BY year) - 1) * 100, 2)
           END AS ytd_export_usd_delta_pct,
           CASE WHEN lag(ytd_import_usd) OVER (ORDER BY year) IS NOT NULL
                 AND lag(ytd_import_usd) OVER (ORDER BY year) <> 0
                THEN round((ytd_import_usd / lag(ytd_import_usd) OVER (ORDER BY year) - 1) * 100, 2)
           END AS ytd_import_usd_delta_pct
    FROM ytd
    ORDER BY year
    """,
    tags=("Y4", "J4"),
)
def q23_ytd_vs_prior(spark, sf_dir):
    """YTD totals scoped to the months available in the latest year,
    with prior-year delta % (Y4/J4, app.py:197-216) — cutoff derived
    in-plan (broadcast scalar), no driver round-trip."""
    m = monthly_flows(spark, sf_dir)
    return ytd_vs_prior(m, value_cols=("export_usd", "import_usd")).orderBy("year")


# ---------------------------------------------------------------------- q90
@register(
    "q90_grouping_sets",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT coalesce(CAST(year AS VARCHAR), 'ALL') AS year_label,
           coalesce(CAST(month_num AS VARCHAR), 'ALL') AS month_label,
           round(sum(export_usd), 2) AS exports,
           count(*) AS n_cells
    FROM monthly
    GROUP BY GROUPING SETS ((year), (month_num), ())
    ORDER BY year_label, month_label
    """,
    tags=("rollups", "grouping-sets"),
)
def q90_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the lattice slices ROLLUP (q47) and
    CUBE (q53) can't express: per-year totals, per-calendar-month
    totals (the seasonality margin), and the grand total in ONE pass.
    Spark plans a single Expand + hash aggregate, exactly like its
    rollup/cube cousins; labels are coalesced strings so the oracle
    needs no grouping_id() compatibility. Input is the monthly base
    relation — a calendar-bounded reduction at any corpus size."""
    m = monthly_flows(spark, sf_dir)
    return (
        m.groupingSets([["year"], ["month_num"], []], "year", "month_num")
        .agg(F.round(F.sum("export_usd"), 2).alias("exports"),
             F.count("*").alias("n_cells"))
        .select(
            F.coalesce(F.col("year").cast("string"), F.lit("ALL"))
            .alias("year_label"),
            F.coalesce(F.col("month_num").cast("string"), F.lit("ALL"))
            .alias("month_label"),
            "exports", "n_cells")
        .orderBy("year_label", "month_label")
    )


# --------------------------------------------------------------------- q139
@register(
    "q139_share_of_parent",
    oracle="""
    WITH f AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT region, nation, rev_c,
             sum(rev_c) OVER (PARTITION BY region) AS region_c,
             sum(rev_c) OVER () AS world_c
      FROM f
    )
    SELECT region, nation, rev_c,
           CAST((2 * 10000 * rev_c + region_c) // (2 * region_c)
                AS DOUBLE) / 10000.0 AS share_of_region,
           CAST((2 * 10000 * region_c + world_c) // (2 * world_c)
                AS DOUBLE) / 10000.0 AS region_share_of_world
    FROM w ORDER BY region, nation
    """,
    tags=("rollup", "share-of-parent"),
)
def q139_share_of_parent(spark, sf_dir):
    """Hierarchical share-of-parent rollup (nation→region→world): each
    nation's revenue share of its region and each region's share of the
    world, on EXACT integer cents with the half-up 4dp device — the
    drill-down percentage view every OLAP dashboard layers over a
    geography dimension (A12's rollup gives subtotals; this gives each
    level as a fraction of its parent).

    Scale shape: one fact aggregate down to nation grain (the q20 join
    chain — dims broadcast, facts co-shuffle on the order key once),
    then two window sums OVER THE 25-ROW AGGREGATE — the W7
    window-over-aggregate pattern, where the unpartitioned world total
    runs on an already-tiny frame, never the fact table."""
    from pyspark.sql import Window

    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, n, r = (t(spark, sf_dir, x) for x in ("customer", "nation", "region"))
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"),
                 F.col("n_name").alias("nation"))
        .agg(F.sum(cents).cast("bigint").alias("rev_c"))
    )
    w = (f.withColumn("region_c",
                      F.sum("rev_c").over(Window.partitionBy("region")))
         .withColumn("world_c", F.sum("rev_c").over(Window.partitionBy())))
    return (
        w.select("region", "nation", "rev_c",
                 (F.expr("(2 * 10000 * rev_c + region_c)"
                         " div (2 * region_c)").cast("double") / 10000.0)
                 .alias("share_of_region"),
                 (F.expr("(2 * 10000 * region_c + world_c)"
                         " div (2 * world_c)").cast("double") / 10000.0)
                 .alias("region_share_of_world"))
        .orderBy("region", "nation")
    )
