"""Data-quality queries: the expectation/violation report a platform
runs before publishing a refresh, and a χ² independence test between
two categorical columns — the statistical sibling of the q102 Benford
audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.queries.base import register, t


# --------------------------------------------------------------------- q116
@register(
    "q116_dq_report",
    oracle="""
    WITH li AS (
      SELECT CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_shipdate,
             CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nonpositive_price,
             CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                           THEN 1 ELSE 0 END) AS BIGINT) AS discount_out_of_range
      FROM lineitem
    ),
    orphans AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ),
    childless AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    ),
    dup_pk AS (
      SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
      WHERE c > 1
    )
    SELECT 'childless_orders' AS check_name, n AS n_violations
      FROM childless
    UNION ALL SELECT 'discount_out_of_range', discount_out_of_range FROM li
    UNION ALL SELECT 'duplicate_order_pk', n FROM dup_pk
    UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM li
    UNION ALL SELECT 'null_shipdate', null_shipdate FROM li
    UNION ALL SELECT 'orphan_lineitems', n FROM orphans
    UNION ALL SELECT 'qty_out_of_range', qty_out_of_range FROM li
    ORDER BY check_name
    """,
    tags=("dq", "expectations"),
)
def q116_dq_report(spark, sf_dir):
    """Data-quality expectation report: null/range violations in one
    fact pass, referential orphans both directions (anti-joins), and a
    primary-key duplication count — the publish gate of a warehouse
    refresh (the dbt-test / Great-Expectations shape as one plan).

    Scale shape: all four column checks ride ONE scan as conditional
    sums (map-side combined scalar aggregates); the referential checks
    are two anti-join counts on the order key — the same shuffle both
    directions, and Spark reuses the exchange; the pk check is a
    key-grain aggregate. Output is a constant 7-row report."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    li_checks = li.agg(
        cnt(F.col("l_shipdate").isNull()).alias("null_shipdate"),
        cnt(F.col("l_extendedprice") <= 0).alias("nonpositive_price"),
        cnt((F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)).alias("qty_out_of_range"),
        cnt((F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1)).alias("discount_out_of_range"))
    orphans = (li.join(o.select(F.col("o_orderkey").alias("l_orderkey")),
                       "l_orderkey", "left_anti")
               .agg(F.count("*").cast("bigint").alias("n")))
    childless = (o.join(li.select(F.col("l_orderkey").alias("o_orderkey"))
                        .distinct(), "o_orderkey", "left_anti")
                 .agg(F.count("*").cast("bigint").alias("n")))
    dup_pk = (o.groupBy("o_orderkey").agg(F.count("*").alias("c"))
              .filter(F.col("c") > 1)
              .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
                   .cast("bigint").alias("n")))

    def row(name, frame, col):
        return frame.select(F.lit(name).alias("check_name"),
                            F.col(col).cast("bigint").alias("n_violations"))

    report = (
        row("childless_orders", childless, "n")
        .unionByName(row("discount_out_of_range", li_checks,
                         "discount_out_of_range"))
        .unionByName(row("duplicate_order_pk", dup_pk, "n"))
        .unionByName(row("nonpositive_price", li_checks,
                         "nonpositive_price"))
        .unionByName(row("null_shipdate", li_checks, "null_shipdate"))
        .unionByName(row("orphan_lineitems", orphans, "n"))
        .unionByName(row("qty_out_of_range", li_checks, "qty_out_of_range"))
    )
    return report.orderBy("check_name")


# --------------------------------------------------------------------- q117
@register(
    "q117_chi2_independence",
    oracle="""
    WITH g AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT status, priority, n,
             CAST(sum(n) OVER (PARTITION BY status) AS BIGINT) AS rs,
             CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS cs,
             CAST(sum(n) OVER () AS BIGINT) AS tot
      FROM g
    )
    SELECT status, priority, n,
           CAST(round(CAST(rs AS DOUBLE) * cs / tot * 100.0) AS BIGINT)
             / 100.0 AS expected,
           CAST(round(1000000.0
                      * ((n - CAST(rs AS DOUBLE) * cs / tot)
                         * (n - CAST(rs AS DOUBLE) * cs / tot))
                      / (CAST(rs AS DOUBLE) * cs / tot)) AS BIGINT)
             / 1000000.0 AS chi_term
    FROM m
    ORDER BY status, priority
    """,
    tags=("dq", "chi2", "contingency"),
)
def q117_chi2_independence(spark, sf_dir):
    """Contingency table + χ² independence contributions for order
    status × priority — the categorical-association screen behind
    segmentation sanity checks (is priority assigned independently of
    status?). Expected counts and χ² terms derive from exact integer
    marginals (one |status|·|priority|-bounded aggregate + three
    windows over it) and quantize to integers before presentation, the
    q102 discipline.

    Scale shape: one fact aggregate to the category-product grain;
    everything after is constant-size."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    g = (o.groupBy(F.col("o_orderstatus").alias("status"),
                   F.col("o_orderpriority").alias("priority"))
         .agg(F.count("*").cast("bigint").alias("n")))
    rs = F.sum("n").over(Window.partitionBy("status")).cast("bigint")
    cs = F.sum("n").over(Window.partitionBy("priority")).cast("bigint")
    tot = F.sum("n").over(Window.partitionBy()).cast("bigint")
    m = g.select("status", "priority", "n", rs.alias("rs"),
                 cs.alias("cs"), tot.alias("tot"))
    e = F.col("rs").cast("double") * F.col("cs") / F.col("tot")
    return (
        m.select(
            "status", "priority", "n",
            (F.round(e * 100.0, 0).cast("bigint") / 100.0).alias("expected"),
            (F.round(1000000.0 * ((F.col("n") - e) * (F.col("n") - e)) / e,
                     0).cast("bigint") / 1000000.0).alias("chi_term"))
        .orderBy("status", "priority")
    )
