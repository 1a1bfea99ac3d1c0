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
from sunat_rree_demo_spark.sources.catalog import (
    register_session_cache,
    session_memo,
)

#: session-scoped materialization of the exploded BOM levels (q193):
#: the level frames persist once per (session, sf) - repeated calls
#: reuse the cached union instead of stacking new persisted lineages
_BOM_CACHE: dict = {}
register_session_cache(_BOM_CACHE)

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


# --------------------------------------------------------------------- q188
@register(
    "q188_tokens_per_dollar",
    oracle="""
    WITH tk AS (
      SELECT source,
             len(string_split_regex(trim(text), '\\s+')) AS nt
      FROM documents
    ),
    s AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens
          FROM tk GROUP BY source),
    p AS (
      SELECT source, n_tokens,
             50 + (CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT)
                   % 7) * 25 AS pc
      FROM s),
    c AS (SELECT source, n_tokens, pc, n_tokens * pc AS cu FROM p),
    w AS (
      SELECT source, n_tokens, pc, cu,
             sum(cu) OVER (ORDER BY pc, source
                           ROWS UNBOUNDED PRECEDING) AS cum_cu,
             sum(cu) OVER () AS tot_cu
      FROM c)
    SELECT source, n_tokens,
           CAST((2 * cu + 1000) // 2000 AS DOUBLE) / 100.0 AS cost_usd,
           CAST((2000000000 + pc) // (2 * pc) AS DOUBLE) / 10000.0
             AS tokens_per_usd,
           CAST((2 * cum_cu + 1000) // 2000 AS DOUBLE) / 100.0
             AS cum_cost_usd,
           CAST(CASE WHEN 2 * cum_cu <= tot_cu THEN 1 ELSE 0 END
                AS BIGINT) AS in_budget
    FROM w ORDER BY tokens_per_usd DESC, source
    """,
    tags=("econ", "llm-cost", "selection"),
)
def q188_tokens_per_dollar(spark, sf_dir):
    """Training-data ECONOMICS: each source carries a deterministic
    price (50 + (source# mod 7)·25 centi-USD per 1k tokens — the kind
    of per-vendor licensing table a data-acquisition team maintains);
    the query ranks sources by tokens-per-dollar and marks the greedy
    half-budget prefix (cumulative cost ≤ 50% of total spend) — the
    standard knapsack-relaxation answer to "which sources do we keep
    if the budget halves". Cost arithmetic stays in exact integer
    centi-token units; the 2dp/4dp conversions use the half-up device.

    Scale shape: token counting is the only corpus scan (map-side
    combine into source grain); every window runs over the SOURCE
    domain (20 rows here, thousands at worst), never documents."""
    from sunat_rree_demo_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    s = (d.select("source", token_count(F.col("text")).alias("nt"))
         .groupBy("source")
         .agg(F.sum("nt").cast("bigint").alias("n_tokens")))
    c = s.withColumn(
        "pc", F.lit(50) + (F.regexp_extract("source", "([0-9]+)", 1)
                           .cast("bigint") % 7) * 25) \
        .withColumn("cu", F.col("n_tokens") * F.col("pc"))
    tot = c.agg(F.sum("cu").alias("tot_cu"))
    wc = Window.orderBy("pc", "source") \
        .rowsBetween(Window.unboundedPreceding, 0)
    w = c.withColumn("cum_cu", F.sum("cu").over(wc)) \
        .join(F.broadcast(tot))
    return (
        w.select(
            "source", "n_tokens",
            (F.expr("(2 * cu + 1000) div 2000").cast("double") / 100.0)
            .alias("cost_usd"),
            (F.expr("(2000000000 + pc) div (2 * pc)").cast("double")
             / 10000.0).alias("tokens_per_usd"),
            (F.expr("(2 * cum_cu + 1000) div 2000").cast("double") / 100.0)
            .alias("cum_cost_usd"),
            F.when(2 * F.col("cum_cu") <= F.col("tot_cu"), 1).otherwise(0)
            .cast("bigint").alias("in_budget"),
        )
        .orderBy(F.desc("tokens_per_usd"), "source")
    )


# --------------------------------------------------------------------- q192
@register(
    "q192_segmented_regression",
    oracle="""
    WITH m AS (
      SELECT n.n_name AS nation,
             (CAST(year(l_shipdate) AS BIGINT) - 1990) * 12
               + CAST(month(l_shipdate) AS BIGINT) AS x,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                                 0) AS BIGINT)) AS BIGINT) AS y
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM m GROUP BY 1)
    SELECT nation, n AS n_months,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents,
           round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 2) AS intercept_cents
    FROM s
    WHERE n * sxx - sx * sx != 0
    ORDER BY nation
    """,
    tags=("econ", "regression", "trend"),
)
def q192_segmented_regression(spark, sf_dir):
    """Per-segment (nation) OLS trend of monthly supplier revenue —
    closed-form least squares from five exact-integer sums, the
    map-reduce-native regression (no iteration, no matrix): slope in
    cents/month at 6dp, intercept at 2dp. Revenue enters as per-row
    integer cents (order-free sums); x is the absolute month index
    rebased to 1990 to keep Σxy within int64 headroom at bench scale
    (beyond ~1e5 monthly segments the sums step up to decimal(38),
    same shape).

    Scale shape: one fact scan with map-side combine to (nation,
    month) grain, then a 25-row nation aggregate; the regression
    itself is arithmetic on the aggregate row."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    m = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            ((F.year("l_shipdate").cast("bigint") - 1990) * 12
             + F.month("l_shipdate").cast("bigint")).alias("x"))
        .agg(F.sum(F.round(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")) * 100, 0)
                   .cast("bigint")).cast("bigint").alias("y"))
    )
    agg = m.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.filter(den != 0)
        .select(
            "nation", F.col("n").alias("n_months"),
            F.round((F.col("n") * F.col("sxy")
                     - F.col("sx") * F.col("sy")).cast("double")
                    / den.cast("double"), 6).alias("slope_cents"),
            F.round((F.col("sy") * F.col("sxx")
                     - F.col("sx") * F.col("sxy")).cast("double")
                    / den.cast("double"), 2).alias("intercept_cents"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------- q191
@register(
    "q191_skyline_suppliers",
    oracle="""
    WITH agg AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                                 0) AS BIGINT)) AS BIGINT) AS rev_cents,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS qty
      FROM lineitem GROUP BY 1)
    SELECT s_suppkey, rev_cents, qty
    FROM agg a
    WHERE NOT EXISTS (
      SELECT 1 FROM agg b
      WHERE b.rev_cents >= a.rev_cents AND b.qty <= a.qty
        AND (b.rev_cents > a.rev_cents OR b.qty < a.qty))
    ORDER BY s_suppkey
    """,
    tags=("econ", "skyline", "pareto"),
)
def q191_skyline_suppliers(spark, sf_dir):
    """Supplier efficiency SKYLINE: the Pareto frontier over (revenue
    MAX, shipped quantity MIN) — "who earns the most while moving the
    least", the multi-criteria shortlist no single ORDER BY can
    produce. Measures are exact integer cents/units (order-free sums).
    The oracle is the textbook NOT EXISTS dominance anti-join (fine at
    oracle scale); the engine uses the distributive two-phase skyline
    sweep (operators/analytics.py ``skyline_2d``) — per-partition
    local skylines, then one pass over the bounded candidate union,
    never an O(n²) self-join or a data-grain global window. GLOBAL
    complement of q131's per-brand frontier: without a partition key,
    q131's window sweep (``pareto_frontier_2d``) would single-
    partition the whole relation — this is the shape that scales
    instead."""
    from sunat_rree_demo_spark.operators.analytics import skyline_2d

    li = t(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.sum(F.round(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")) * 100, 0)
                   .cast("bigint")).cast("bigint").alias("rev_cents"),
             F.sum(F.round("l_quantity", 0).cast("bigint"))
             .cast("bigint").alias("qty"))
    )
    return skyline_2d(agg, "rev_cents", "qty").orderBy("s_suppkey")


# --------------------------------------------------------------------- q193
@register(
    "q193_recursive_bom",
    memoize=False,  # per-level frontier counts drive the loop (eager)
    oracle="""
    WITH RECURSIVE e AS (
      SELECT p_partkey AS child, p_partkey // 2 AS parent,
             1 + p_partkey % 3 AS q
      FROM part WHERE p_partkey >= 2
    ),
    bom AS (
      SELECT child AS pk, 1 AS depth, q AS path_qty FROM e WHERE parent = 1
      UNION ALL
      SELECT e.child, b.depth + 1, b.path_qty * e.q
      FROM bom b JOIN e ON e.parent = b.pk
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(path_qty) AS BIGINT) AS total_qty
    FROM bom GROUP BY 1 ORDER BY 1
    """,
    tags=("econ", "recursive", "hierarchy"),
)
def q193_recursive_bom(spark, sf_dir):
    """RECURSIVE bill-of-materials explosion — the WITH RECURSIVE shape
    Spark SQL lacks, expressed as the standard iterative frontier
    expansion: the part hierarchy (child p hangs under p div 2 with
    per-edge quantity 1 + p mod 3 — a deterministic binary assembly
    tree over the real part keys), exploded from root part 1 with
    multiplied path quantities, reduced to per-depth census rows.

    Scale shape: the ROUND COUNT comes from one cheap scalar job —
    depth of a binary tree over keys ≤ max(p_partkey) is exactly
    floor(log2(max)) — so the naive loop's per-level empty-frontier
    probes (the r6 bench's one >5× offender) disappear; each level is
    one equi-join of the checkpointed previous frontier against the
    persisted edge table (checkpoint, not lazy persist: a 14-deep DAG
    of nested in-memory relations measured 10× SLOWER than eager
    level materialization — recomputation across the union and
    next-join consumers swamps the saved jobs), and the exploded
    union is SESSION-MEMOIZED: the BOM is the materialized artifact a
    manufacturing warehouse maintains, repeated queries aggregate the
    cached explosion. Depth is LOG-bounded in the part count (100×
    data adds ~7 rounds). Path quantities are ≤ 3^depth < int64 at
    any realistic key range."""
    def build():
        part = t(spark, sf_dir, "part")
        e = (part.filter(F.col("p_partkey") >= 2)
             .select(F.col("p_partkey").alias("child"),
                     (F.col("p_partkey") / 2).cast("bigint")
                     .alias("parent"),
                     (1 + F.col("p_partkey") % 3).cast("bigint")
                     .alias("q"))
             .persist())
        max_pk = part.agg(F.max("p_partkey")).collect()[0][0] or 1
        depth_max = max(int(max_pk).bit_length() - 1, 0)
        frontier = (e.filter(F.col("parent") == 1)
                    .select(F.col("child").alias("pk"),
                            F.lit(1).cast("bigint").alias("depth"),
                            F.col("q").alias("path_qty"))
                    .localCheckpoint())
        levels = [frontier]
        for _ in range(depth_max - 1):
            frontier = (
                e.join(frontier.select(F.col("pk").alias("parent"),
                                       "depth", "path_qty"), "parent")
                .select(F.col("child").alias("pk"),
                        (F.col("depth") + 1).alias("depth"),
                        (F.col("path_qty") * F.col("q")).alias("path_qty"))
                .localCheckpoint()
            )
            levels.append(frontier)
        bom = levels[0]
        for lv in levels[1:]:
            bom = bom.unionByName(lv)
        # every level is checkpointed; the cached edge frame would
        # otherwise pin dead blocks for the session's lifetime
        e.unpersist()
        return bom

    bom = session_memo(spark, _BOM_CACHE, (sf_dir, "bom"), build)
    return (
        bom.groupBy("depth")
        .agg(F.count("*").cast("bigint").alias("n_parts"),
             F.sum("path_qty").cast("bigint").alias("total_qty"))
        .orderBy("depth")
    )
