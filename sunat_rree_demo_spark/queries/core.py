"""M1 core relational queries (SURVEY.md §7.2): filters, conditional
projection, grouped/conditional aggregation, unions, distinct, top-k.

Each query exercises a specific operator row from SURVEY.md §2 on the
driver's star schema; the oracle SQL is the semantic ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.functions.months import MONTH_NAMES_ES, month_name_es, month_name_es_sql
from sunat_rree_demo_spark.functions.scalars import safe_div
from sunat_rree_demo_spark.operators import aggregates as agg_ops
from sunat_rree_demo_spark.operators import joins as join_ops
from sunat_rree_demo_spark.operators import sorts as sort_ops
from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t


# ---------------------------------------------------------------------- q01
@register(
    "q01_annual_balance",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year,
           round(sum(export_usd), 2) AS export_total,
           round(sum(import_usd), 2) AS import_total,
           round(sum(export_usd) - sum(import_usd), 2) AS balance
    FROM monthly
    GROUP BY year
    ORDER BY year
    """,
    tags=("flagship", "A2", "F6", "F8", "T4"),
)
def q01_annual_balance(spark, sf_dir):
    """Flagship: annual trade balance — the reference's headline query
    (README.md:124-134; view form models/metrics.sql:73-82). Conditional
    agg (A2) + derived balance (F8) + ordered output (T4)."""
    m = monthly_flows(spark, sf_dir)
    return (
        m.groupBy("year")
        .agg(
            F.round(F.sum("export_usd"), 2).alias("export_total"),
            F.round(F.sum("import_usd"), 2).alias("import_total"),
            F.round(F.sum("export_usd") - F.sum("import_usd"), 2).alias("balance"),
        )
        .orderBy("year")
    )


# ---------------------------------------------------------------------- q02
@register(
    "q02_filter_range_membership",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE CAST(year(o_orderdate) AS BIGINT) BETWEEN 1995 AND 1996
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND o_totalprice IS NOT NULL
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("F2", "F3", "F4", "F5", "A1"),
)
def q02_filter_range_membership(spark, sf_dir):
    """Conjunctive range + membership + validity predicates (F2-F5,
    app.py:483 mask shape) feeding a grouped sum (A1)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.year("o_orderdate").between(1995, 1996)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
            & F.col("o_totalprice").isNotNull()
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------- q03
@register(
    "q03_conditional_pivot_agg",
    oracle="""
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END), 2) AS flow_n,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END), 2) AS flow_r,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END), 2) AS flow_a
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("A2", "F6"),
)
def q03_conditional_pivot_agg(spark, sf_dir):
    """Conditional (pivoted) aggregation with deliberate NULL
    else-branches so SUM skips other flows (metrics.py:23-24)."""
    li = t(spark, sf_dir, "lineitem")
    def flow(v):
        return F.round(F.sum(F.when(F.col("l_returnflag") == v,
                                    F.col("l_extendedprice"))), 2)
    return (
        li.groupBy("l_linestatus")
        .agg(flow("N").alias("flow_n"), flow("R").alias("flow_r"),
             flow("A").alias("flow_a"))
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------- q04
@register(
    "q04_pivot_table",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS rf_n,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS rf_r,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS rf_a
    FROM lineitem
    GROUP BY 1
    ORDER BY year
    """,
    tags=("A3",),
)
def q04_pivot_table(spark, sf_dir):
    """pivot_table long→wide with explicit pivot values (A3,
    metrics.py:33-36) — explicit values keep the schema deterministic and
    skip the extra distinct-values job at scale."""
    li = t(spark, sf_dir, "lineitem")
    p = agg_ops.pivot_table(
        li.select(F.year("l_shipdate").cast("bigint").alias("year"),
                  "l_returnflag", "l_quantity"),
        index=["year"], pivot_col="l_returnflag",
        pivot_values=["N", "R", "A"], agg=F.sum("l_quantity"),
    )
    return (
        p.select(
            "year",
            F.round(F.col("N"), 2).alias("rf_n"),
            F.round(F.col("R"), 2).alias("rf_r"),
            F.round(F.col("A"), 2).alias("rf_a"),
        ).orderBy("year")
    )


# ---------------------------------------------------------------------- q05
_MONTH_CASE = month_name_es_sql("CAST(month(l_shipdate) AS BIGINT)")


@register(
    "q05_month_name_map",
    oracle=f"""
    SELECT CAST(month(l_shipdate) AS BIGINT) AS month_num,
           {_MONTH_CASE} AS month,
           count(*) AS n_items
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY month_num
    """,
    tags=("F7", "X5"),
)
def q05_month_name_map(spark, sf_dir):
    """Value-map projection: month number ↔ Spanish month name (F7,
    metrics.py:49-53 / models/metrics.sql:10-23) via a constant-folded
    create_map literal — no UDF."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(F.month("l_shipdate").cast("bigint").alias("month_num"))
        .groupBy("month_num")
        .agg(F.count("*").alias("n_items"))
        .withColumn("month", month_name_es("month_num"))
        .select("month_num", "month", "n_items")
        .orderBy("month_num")
    )


# ---------------------------------------------------------------------- q06
@register(
    "q06_scalar_stats",
    oracle="""
    SELECT count(l_extendedprice) AS n,
           round(avg(l_extendedprice), 4) AS mean,
           round(stddev_samp(l_extendedprice), 4) AS std,
           round(min(l_extendedprice), 2) AS min,
           round(max(l_extendedprice), 2) AS max,
           round(sum(l_extendedprice), 2) AS sum
    FROM lineitem
    """,
    tags=("A4", "A7", "A8"),
)
def q06_scalar_stats(spark, sf_dir):
    """Global scalar stats bundle (A8, eda.py:162-164) — stddev_samp to
    match pandas .std() sample semantics."""
    li = t(spark, sf_dir, "lineitem")
    c = F.col("l_extendedprice")
    return li.agg(
        F.count(c).alias("n"),
        F.round(F.avg(c), 4).alias("mean"),
        F.round(F.stddev_samp(c), 4).alias("std"),
        F.round(F.min(c), 2).alias("min"),
        F.round(F.max(c), 2).alias("max"),
        F.round(F.sum(c), 2).alias("sum"),
    )


# ---------------------------------------------------------------------- q07
@register(
    "q07_count_distinct",
    oracle="""
    SELECT c.c_mktsegment,
           count(DISTINCT o.o_custkey) AS n_buyers,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("A6", "J1"),
)
def q07_count_distinct(spark, sf_dir):
    """COUNT DISTINCT per segment (A6) through a broadcast dim join (J1).
    At 100 TB the exact distinct shuffles expanded rows; the documented
    scale variant is approx_count_distinct (HLL, one pass, no expansion)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n_buyers"),
             F.count("*").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------- q08
@register(
    "q08_topn_categories",
    oracle="""
    SELECT p.p_type AS category,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    ORDER BY revenue DESC, category
    LIMIT 5
    """,
    tags=("T1", "A1", "J1"),
)
def q08_topn_categories(spark, sf_dir):
    """Top-N categories by summed revenue (T1, app.py:447-459 shape with
    category ↔ p_type). orderBy+limit plans TakeOrderedAndProject — never
    a global sort."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = joined.groupBy(F.col("p_type").alias("category")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"))
    return sort_ops.top_n(rev, "revenue", 5, "category")


# ---------------------------------------------------------------------- q09
@register(
    "q09_top_abs",
    oracle="""
    SELECT event_id, event_type, round(value, 4) AS value
    FROM events
    ORDER BY abs(value) DESC, event_id
    LIMIT 20
    """,
    tags=("T2", "X8"),
)
def q09_top_abs(spark, sf_dir):
    """Top-N by absolute value (T2, insights_engine.py:75-78 ranks by
    |YoY|), deterministic via event_id tiebreak."""
    e = t(spark, sf_dir, "events")
    return sort_ops.top_n_abs(
        e.select("event_id", "event_type", F.round("value", 4).alias("value")),
        "value", 20, "event_id")


# ---------------------------------------------------------------------- q10
@register(
    "q10_anti_join",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL)
    ORDER BY p_partkey
    """,
    tags=("J3", "U2"),
)
def q10_anti_join(spark, sf_dir):
    """Anti-join: parts never shipped (J3; the reference does key-domain
    set difference in python sets, tests/test_products_qa.py:151-160)."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return join_ops.anti_join(p.select("p_partkey", "p_name"), li,
                              ["p_partkey"]).orderBy("p_partkey")


# ---------------------------------------------------------------------- q11
@register(
    "q11_union_distinct",
    oracle="""
    SELECT n.n_name AS nation, k.nationkey
    FROM (
      SELECT DISTINCT nationkey FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
      )
    ) k
    JOIN nation n ON k.nationkey = CAST(n.n_nationkey AS BIGINT)
    ORDER BY k.nationkey
    """,
    tags=("U1", "U3", "J1"),
)
def q11_union_distinct(spark, sf_dir):
    """UNION ALL (U1, pd.concat at etl.py:78-79) + DISTINCT (U3) + dim
    join: nations having customers or suppliers."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("bigint").alias("nationkey"))
    n = t(spark, sf_dir, "nation")
    keys = join_ops.union_frames(c, s).distinct()
    return (
        keys.join(F.broadcast(n),
                  keys.nationkey == n.n_nationkey.cast("bigint"))
        .select(F.col("n_name").alias("nation"), "nationkey")
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------- q12
@register(
    "q12_having_max_case",
    oracle="""
    SELECT l_orderkey,
           round(max(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2)
             AS max_returned
    FROM lineitem
    GROUP BY l_orderkey
    HAVING max(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) > 60000
    ORDER BY l_orderkey
    """,
    tags=("A5",),
)
def q12_having_max_case(spark, sf_dir):
    """Conditional MAX + HAVING (A5, tests/test_products_qa.py:28-43 —
    the reconciliation query shape)."""
    li = t(spark, sf_dir, "lineitem")
    mx = F.max(F.when(F.col("l_returnflag") == "R",
                      F.col("l_extendedprice")).otherwise(F.lit(0)))
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(mx, 2).alias("max_returned"), mx.alias("_raw"))
        .filter(F.col("_raw") > 60000)
        .drop("_raw")
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------- q13
@register(
    "q13_argmax_month",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    ranked AS (
      SELECT year, month_num, export_usd,
             row_number() OVER (PARTITION BY year
                                ORDER BY export_usd DESC, month_num) AS rn
      FROM monthly
    )
    SELECT year, month_num AS best_month, export_usd AS best_export
    FROM ranked WHERE rn = 1
    ORDER BY year
    """,
    tags=("A9",),
)
def q13_argmax_month(spark, sf_dir):
    """argmax: best month per year by export (A9, eda.py:256,
    insights_engine.py:216) — row_number form so tie-breaking is
    deterministic across engines (max_by ties are engine-defined)."""
    m = monthly_flows(spark, sf_dir)
    out = agg_ops.argmax(m.select("year", "month_num", "export_usd"),
                         ["year"], "export_usd", "month_num",
                         tiebreak="month_num")
    return (out.select("year",
                       F.col("top_month_num").alias("best_month"),
                       F.col("max_export_usd").alias("best_export"))
               .orderBy("year"))


# ---------------------------------------------------------------------- q14
@register(
    "q14_coverage_ratio",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year, month_num,
           CASE WHEN import_usd IS NOT NULL AND import_usd <> 0
                THEN round(export_usd / import_usd * 100, 2) END AS cov_ratio
    FROM monthly
    ORDER BY year, month_num
    """,
    tags=("F9", "Y5", "X13"),
)
def q14_coverage_ratio(spark, sf_dir):
    """Inf-guarded coverage ratio export/import% (F9/Y5,
    metrics_products.py:72): guard the division instead of scrubbing
    ±inf afterwards."""
    m = monthly_flows(spark, sf_dir)
    return (
        m.select(
            "year", "month_num",
            F.round(safe_div(F.col("export_usd"), F.col("import_usd"), 100.0), 2)
            .alias("cov_ratio"),
        ).orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q15
@register(
    "q15_bool_count_surplus",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT count(*) AS n_months,
           CAST(sum(CASE WHEN export_usd - import_usd > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS surplus_months
    FROM monthly
    """,
    tags=("A10",),
)
def q15_bool_count_surplus(spark, sf_dir):
    """Boolean-count aggregate: months in surplus (A10, eda.py:257)."""
    m = monthly_flows(spark, sf_dir)
    return m.agg(
        F.count("*").alias("n_months"),
        agg_ops.count_if(F.col("export_usd") - F.col("import_usd") > 0,
                         "surplus_months"),
    )


# ---------------------------------------------------------------------- q16
@register(
    "q16_string_funcs",
    oracle="""
    SELECT lower(trim(p_type)) AS category_norm,
           substr(trim(p_type), 1, 8) AS category_trunc,
           CAST(length(p_type) AS BIGINT) AS name_len,
           count(*) AS n_parts,
           CAST(sum(CASE WHEN lower(p_type) LIKE 'eco%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_prefix
    FROM part
    GROUP BY 1, 2, 3
    ORDER BY category_norm, name_len
    """,
    tags=("X1", "X3", "X4"),
)
def q16_string_funcs(spark, sf_dir):
    """String scalar family: trim/lower (X1), prefix+length predicates
    (X3, etl_products.py:70-72 noise filter), substring truncation (X4,
    etl_products.py:144)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            F.lower(F.trim(F.col("p_type"))).alias("category_norm"),
            F.substring(F.trim(F.col("p_type")), 1, 8).alias("category_trunc"),
            F.length("p_type").cast("bigint").alias("name_len"),
            F.when(F.lower(F.col("p_type")).startswith("eco"), 1).otherwise(0).alias("_pfx"),
        )
        .groupBy("category_norm", "category_trunc", "name_len")
        .agg(F.count("*").alias("n_parts"), F.sum("_pfx").alias("n_prefix"))
        .orderBy("category_norm", "name_len")
    )


# ---------------------------------------------------------------------- q17
@register(
    "q17_date_funcs",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(make_date(CAST(year(o_orderdate) AS INT),
                          CAST(month(o_orderdate) AS INT), 1) AS VARCHAR) AS month_start,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY ym
    """,
    tags=("X5", "X6"),
)
def q17_date_funcs(spark, sf_dir):
    """Date construction + formatting (X5 make_date ↔ eda.py:53 synth
    date; X6 date_format ↔ strftime('%Y-%m'))."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1))
            .cast("string").alias("month_start"),
            "o_totalprice",
        )
        .groupBy("ym", "month_start")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("ym")
    )
