"""Trade-economics analytics (the reference's domain, SURVEY.md §2.9
Y-family extended): revealed comparative advantage, export-concentration
HHI, and CUSUM drift detection over the monthly series — the indicator
math a trade-stats portal publishes next to the raw KPIs.

Float discipline: every money aggregate runs in integer CENTS
(``round(price·100)`` per line, bigint sums — exact and addend-order
free); ratios divide exact integers as doubles (IEEE division is
correctly rounded, so both engines produce the same double) and round
once at presentation.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t

#: revenue in integer cents per lineitem row — shared by q99/q100.
_CENTS_CTE = """
    l AS (
      SELECT n_name AS nation, p_brand AS mfgr,
             CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
    ),
    g AS (
      SELECT nation, mfgr, CAST(sum(cents) AS BIGINT) AS x
      FROM l GROUP BY 1, 2
    )
"""


def _cents_grouped(spark, sf_dir):
    """Spark twin of ``_CENTS_CTE``: (nation, mfgr, x=exact cents)."""
    li, s = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "supplier")
    n, p = t(spark, sf_dir, "nation"), t(spark, sf_dir, "part")
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100, 0).cast("bigint")
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.col("p_brand").alias("mfgr"))
        .agg(F.sum(cents).alias("x"))
    )


# ---------------------------------------------------------------------- q99
@register(
    "q99_rca_matrix",
    oracle=f"""
    WITH {_CENTS_CTE}
    SELECT nation, mfgr,
           round(CAST(x AS DOUBLE) / 100.0, 2) AS revenue,
           round((CAST(x AS DOUBLE)
                  * CAST(sum(x) OVER () AS DOUBLE))
                 / (CAST(sum(x) OVER (PARTITION BY nation) AS DOUBLE)
                    * CAST(sum(x) OVER (PARTITION BY mfgr) AS DOUBLE)),
                 4) AS rca
    FROM g
    ORDER BY nation, mfgr
    """,
    tags=("econ", "rca"),
)
def q99_rca_matrix(spark, sf_dir):
    """Revealed comparative advantage (Balassa index) per supplier
    nation × manufacturer line: RCA = (X_nc/X_n)/(X_wc/X_w), computed
    as the overflow-free cross ratio (x·X_w)/(X_n·X_c) on exact cent
    integers cast to double at the division.

    Scale shape: ONE fact aggregate to (nation, mfgr) grain — bounded
    by the dimension product (|nations|·|mfgrs|), never corpus-sized —
    then three window sums over that tiny frame. nation broadcasts;
    part/supplier joins are AQE-decided. Window sums stay exact
    (integer cents) in any partition order; Spark sums them as
    decimal so a 100 TB year's cents can't overflow int64."""
    g = _cents_grouped(spark, sf_dir)
    # decimal window sums: exact at any scale, cast to double once
    xd = F.col("x").cast("double")
    xw = F.sum(F.col("x").cast("decimal(38,0)")).over(
        Window.partitionBy()).cast("double")
    xn = F.sum(F.col("x").cast("decimal(38,0)")).over(
        Window.partitionBy("nation")).cast("double")
    xc = F.sum(F.col("x").cast("decimal(38,0)")).over(
        Window.partitionBy("mfgr")).cast("double")
    return (
        g.select("nation", "mfgr",
                 F.round(xd / 100.0, 2).alias("revenue"),
                 F.round((xd * xw) / (xn * xc), 4).alias("rca"))
        .orderBy("nation", "mfgr")
    )


# --------------------------------------------------------------------- q100
@register(
    "q100_hhi_concentration",
    oracle=f"""
    WITH {_CENTS_CTE},
    s AS (
      SELECT nation, x,
             CAST(sum(x) OVER (PARTITION BY nation) AS DOUBLE) AS xn
      FROM g
    ),
    term AS (
      SELECT nation,
             CAST(round(100000000.0 * (CAST(x AS DOUBLE) / xn)
                        * (CAST(x AS DOUBLE) / xn)) AS BIGINT) AS u
      FROM s
    )
    SELECT nation, CAST(count(*) AS BIGINT) AS n_categories,
           round(CAST(sum(u) AS BIGINT) / 10000.0, 4) AS hhi
    FROM term GROUP BY nation ORDER BY nation
    """,
    tags=("econ", "hhi"),
)
def q100_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman export-concentration index per nation over
    manufacturer lines (0–10000 scale): HHI = Σ_c (share_c)² · 10⁴.

    Scale shape: reuses the (nation, mfgr) cent aggregate; one window
    for the nation totals and a nation-grain reduction. Each share² is
    quantized to an integer 1e-8 unit BEFORE the per-nation sum (the
    q74 discipline), so the Σ over categories is exact integer math —
    a float Σ of squares would drift with addend order across
    engines."""
    g = _cents_grouped(spark, sf_dir)
    xn = F.sum(F.col("x").cast("decimal(38,0)")).over(
        Window.partitionBy("nation")).cast("double")
    sh = F.col("x").cast("double") / F.col("xn")
    return (
        g.select("nation", F.col("x"), xn.alias("xn"))
        .select("nation",
                F.round(F.lit(100000000.0) * sh * sh, 0)
                .cast("bigint").alias("u"))
        .groupBy("nation")
        .agg(F.count("*").cast("bigint").alias("n_categories"),
             F.round(F.sum("u").cast("bigint") / 10000.0, 4).alias("hhi"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------- q101
@register(
    "q101_cusum_drift",
    oracle=f"""
    WITH m AS (
      SELECT year, month_num,
             CAST(round(export_usd * 100) AS BIGINT) AS cents
      FROM ({MONTHLY_SQL}) WHERE export_usd IS NOT NULL
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(cents) AS sx,
             sum(CAST(cents AS HUGEINT) * cents) AS sxx
      FROM m
    ),
    c AS (
      SELECT year, month_num, cents,
             CAST(sum(cents) OVER (ORDER BY year, month_num
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(row_number() OVER (ORDER BY year, month_num)
                  AS BIGINT) AS i
      FROM m
    )
    SELECT year, month_num,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS export_usd,
           round((CAST(n AS DOUBLE) * CAST(cum AS DOUBLE)
                  - CAST(i AS DOUBLE) * CAST(sx AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE)
                    * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 0.0),
                 4) AS cusum,
           abs((CAST(n AS DOUBLE) * CAST(cum AS DOUBLE)
                - CAST(i AS DOUBLE) * CAST(sx AS DOUBLE))
               / NULLIF(CAST(n AS DOUBLE)
                  * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 0.0))
             > 3.0 AS drift_flag
    FROM c, st
    ORDER BY year, month_num
    """,
    tags=("econ", "cusum", "drift"),
)
def q101_cusum_drift(spark, sf_dir):
    """CUSUM drift chart over monthly exports: the cumulative sum of
    mean-centered values in σ units, S_i = (n·Σ_{j≤i}x_j − i·Σx)/(n·σ)
    — the classic change-detection chart; |S| > 3 flags drift.

    Float discipline end to end: the series is exact integer cents, the
    cumulative and global sums are integer (n·cum − i·Sx never leaves
    int64; Σx² rides decimal/hugeint), and σ derives from the exact
    (n·Σx² − (Σx)²)/n² with one sqrt — every double op has identical
    exact inputs in both engines, so even the 4dp round cannot drift.

    Scale shape: the series is calendar-grain (≤ hundreds of rows at
    any corpus size) after the monthly base aggregate, so the
    single-partition ordered window is bounded by the calendar, not the
    data; the stats ride a broadcast 1-row frame."""
    m = (monthly_flows(spark, sf_dir)
         .filter(F.col("export_usd").isNotNull())
         .select("year", "month_num",
                 F.round(F.col("export_usd") * 100, 0)
                 .cast("bigint").alias("cents")))
    stats = m.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents").cast("decimal(28,0)") * F.col("cents"))
        .alias("sxx"))
    w = Window.orderBy("year", "month_num")
    c = m.select(
        "year", "month_num", "cents",
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint").alias("cum"),
        F.row_number().over(w).cast("bigint").alias("i"))
    nd = F.col("n").cast("double")
    num = nd * F.col("cum").cast("double") - F.col("i").cast("double") \
        * F.col("sx").cast("double")
    var = (nd * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double")) \
        / (nd * nd)
    # ANSI/NULL guard: a constant series has σ = 0 → NULL, not NaN
    den = nd * F.sqrt(var)
    s = F.when(den != 0.0, num / den)
    return (
        c.join(F.broadcast(stats))
        .select("year", "month_num",
                F.round(F.col("cents").cast("double") / 100.0, 2)
                .alias("export_usd"),
                F.round(s, 4).alias("cusum"),
                (F.abs(s) > 3.0).alias("drift_flag"))
        .orderBy("year", "month_num")
    )


# --------------------------------------------------------------------- q106
@register(
    "q106_rolling_correlation",
    oracle=f"""
    WITH m AS (
      SELECT year, month_num,
             CAST(round(export_usd * 100) AS BIGINT) AS x,
             CAST(round(import_usd * 100) AS BIGINT) AS y
      FROM ({MONTHLY_SQL})
      WHERE export_usd IS NOT NULL AND import_usd IS NOT NULL
    ),
    w AS (
      SELECT year, month_num,
             count(*) OVER win AS c,
             sum(x) OVER win AS sx,
             sum(y) OVER win AS sy,
             sum(CAST(x AS HUGEINT) * x) OVER win AS sxx,
             sum(CAST(y AS HUGEINT) * y) OVER win AS syy,
             sum(CAST(x AS HUGEINT) * y) OVER win AS sxy
      FROM m
      WINDOW win AS (ORDER BY year, month_num
                     ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    )
    SELECT year, month_num,
           round((12.0 * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(sqrt((12.0 * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (12.0 * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0),
                 4) AS corr_12m
    FROM w WHERE c = 12
    ORDER BY year, month_num
    """,
    tags=("econ", "rolling", "correlation"),
)
def q106_rolling_correlation(spark, sf_dir):
    """Rolling 12-month Pearson correlation between the export and
    import series — the co-movement indicator behind terms-of-trade
    dashboards (the windowed sibling of q49's global correlation).

    Determinism: all five window sums run on exact integer cents (the
    squares/cross-products as decimal/hugeint so a 100 TB-scale month
    can't overflow int64), and the Pearson formula consumes those exact
    integers as doubles — both engines produce bit-identical r. Only
    full 12-month windows emit (c = 12).

    Scale shape: calendar-grain input (the monthly base aggregate), so
    the ordered window is bounded by the calendar; one window frame
    computes all five sums in a single pass."""
    m = (monthly_flows(spark, sf_dir)
         .filter(F.col("export_usd").isNotNull()
                 & F.col("import_usd").isNotNull())
         .select("year", "month_num",
                 F.round(F.col("export_usd") * 100, 0)
                 .cast("bigint").alias("x"),
                 F.round(F.col("import_usd") * 100, 0)
                 .cast("bigint").alias("y")))
    win = (Window.orderBy("year", "month_num")
           .rowsBetween(-11, Window.currentRow))
    dec = lambda c: F.col(c).cast("decimal(28,0)")  # noqa: E731
    w = m.select(
        "year", "month_num",
        F.count("*").over(win).alias("c"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(dec("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(dec("y") * F.col("y")).over(win).alias("syy"),
        F.sum(dec("x") * F.col("y")).over(win).alias("sxy"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = 12.0 * d("sxy") - d("sx") * d("sy")
    den = F.sqrt((12.0 * d("sxx") - d("sx") * d("sx"))
                 * (12.0 * d("syy") - d("sy") * d("sy")))
    # ANSI/NULL guard: a constant window makes either variance 0
    corr = F.when(den != 0.0, num / den)
    return (
        w.filter(F.col("c") == 12)
        .select("year", "month_num", F.round(corr, 4).alias("corr_12m"))
        .orderBy("year", "month_num")
    )
