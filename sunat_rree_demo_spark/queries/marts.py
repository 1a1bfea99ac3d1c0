"""Star-schema mart queries over the full TPC-H-ish fixture graph
(SURVEY.md §2 J1/A1 family, stretched to the multi-join shapes a
warehouse actually runs): a TPC-H Q5-style regional market-share
rollup and a user-funnel conversion report over the events stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.functions.scalars import in_year
from sunat_rree_demo_spark.queries.base import register, t


# ---------------------------------------------------------------------- q76
@register(
    "q76_regional_market_share",
    oracle="""
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY 1, 2
    ORDER BY year, revenue DESC, n_name
    """,
    tags=("mart", "multi-join"),
)
def q76_regional_market_share(spark, sf_dir):
    """TPC-H Q5-shaped five-way join: local-supplier revenue by nation
    and year inside one region (the reference's J1 left-join family at
    warehouse multiplicity).

    Scale shape: nation/region are constant-size — explicitly
    broadcast, so the region filter prunes BEFORE the big joins and no
    exchange carries them. customer⋈orders⋈lineitem⋈supplier are all
    corpus-proportional: left un-hinted so AQE picks
    broadcast-vs-shuffle per actual build size (same policy as commit
    "un-hint corpus-sized size joins"); the l_orderkey join and the
    final (n_name, year) aggregate each shuffle once with map-side
    partials. The s_nationkey = c_nationkey local-supplier predicate
    rides the supplier join as a non-equi conjunct, not a post-filter."""
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    n, r = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    nr = (F.broadcast(n).join(F.broadcast(r),
                              n["n_regionkey"] == r["r_regionkey"])
          .filter(F.col("r_name") == "AMERICA")
          .select("n_nationkey", "n_name"))
    return (
        c.join(F.broadcast(nr), c["c_nationkey"] == F.col("n_nationkey"))
        .join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"])
                 & (s["s_nationkey"] == c["c_nationkey"]))
        .groupBy("n_name",
                 F.year("o_orderdate").cast("bigint").alias("year"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.countDistinct("o_orderkey").alias("n_orders"))
        .orderBy("year", F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------- q77
@register(
    "q77_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(ts) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > t0 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > t1 GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, count(*) AS n_users,
           CAST(NULL AS DOUBLE) AS avg_step_sec
    FROM v
    UNION ALL
    SELECT '2_click', count(*),
           round(avg((epoch_us(t1) - epoch_us(t0)) / 1000000.0), 2)
    FROM c JOIN v USING (user_id)
    UNION ALL
    SELECT '3_purchase', count(*),
           round(avg((epoch_us(t2) - epoch_us(t1)) / 1000000.0), 2)
    FROM p JOIN c USING (user_id)
    ORDER BY stage
    """,
    tags=("mart", "funnel", "sequence"),
)
def q77_event_funnel(spark, sf_dir):
    """Ordered-sequence funnel (view → click after it → purchase after
    that) with per-step conversion counts and mean step latency — the
    MATCH_RECOGNIZE-ish pattern expressed as min-timestamp semi-stages.

    Scale shape: every stage is a filtered aggregate + join keyed on
    user_id, so one hash partitioning serves the whole funnel (no
    windows, no per-user sort) and stage outputs are user-grain —
    strictly shrinking. All three stages assemble into ONE user-grain
    frame via left joins and a single aggregate + ``stack`` unpivot
    emits the report: no union-of-aggregates that would re-run earlier
    stages once per branch (the shared stage subtrees that do repeat
    dedupe through Spark's exchange reuse; each event type is scanned
    with its filter pushed down)."""
    ev = t(spark, sf_dir, "events")
    sec = 1_000_000.0

    def first_after(etype, prev, tcol, out):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return (e.groupBy("user_id").agg(F.min("ts").alias(out)))
        return (e.join(prev.select("user_id", tcol), "user_id")
                .filter(F.col("ts") > F.col(tcol))
                .groupBy("user_id").agg(F.min("ts").alias(out)))

    v = first_after("view", None, None, "t0")
    cl = first_after("click", v, "t0", "t1")
    p = first_after("purchase", cl, "t1", "t2")
    funnel = v.join(cl, "user_id", "left").join(p, "user_id", "left")
    agg = funnel.agg(
        F.count("t0").alias("_n1"),
        F.count("t1").alias("_n2"),
        F.count("t2").alias("_n3"),
        F.round(F.avg((F.unix_micros("t1") - F.unix_micros("t0")) / sec), 2)
        .alias("_a2"),
        F.round(F.avg((F.unix_micros("t2") - F.unix_micros("t1")) / sec), 2)
        .alias("_a3"),
    )
    return (
        agg.select(F.expr(
            "stack(3, '1_view', _n1, CAST(NULL AS DOUBLE), "
            "'2_click', _n2, _a2, '3_purchase', _n3, _a3) "
            "AS (stage, n_users, avg_step_sec)"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------- q79
@register(
    "q79_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           count(*) AS n_lines,
           round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa USING (l_partkey)
    WHERE l_quantity < qty_cut
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("mart", "correlated-subquery"),
)
def q79_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from small-quantity order lines, where
    'small' is relative to each part's own average quantity — the
    correlated aggregate subquery DECORRELATED into a per-part
    aggregate joined back to the facts (what Catalyst's
    RewriteCorrelatedScalarSubquery does; here stated directly so the
    plan is explicit).

    Scale shape: the facts are scanned twice (per-part cut, then the
    filtered join) and both the cut table and the join shuffle on
    l_partkey — one co-partitioning serves agg and join; part is
    key+brand only after pruning. The cut is rounded to 6dp on both
    engines: avg() addend order differs across engines by ULPs, and an
    unrounded cut could flip the integer-valued quantity comparison."""
    li, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    cuts = (li.groupBy("l_partkey")
            .agg(F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_cut")))
    return (
        li.join(cuts, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .join(p, p["p_partkey"] == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------- q85
@register(
    "q85_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS prev_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT prev_type, next_type, count(*) AS n,
           round(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY prev_type), 4) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    tags=("mart", "sequence", "markov"),
)
def q85_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with counts — the behavioral
    model behind funnels and next-action prediction features.

    Scale shape: one lead window partitioned by the high-cardinality
    user_id (event_id tiebreak for simultaneous rows), then a
    (prev, next) aggregate whose row-normalizing window runs over the
    |types|² aggregate — 25 rows here, bounded by the type vocabulary
    at any corpus size, never the raw events. The probability is ONE
    integer→double division on both engines, so 4dp rounding is
    exact-input deterministic."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.select(F.col("event_type").alias("prev_type"),
                     F.lead("event_type").over(w).alias("next_type"))
           .filter(F.col("next_type").isNotNull()))
    norm = Window.partitionBy("prev_type")
    return (
        seq.groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
        .withColumn("p", F.round(F.col("n") * 1.0
                                 / F.sum("n").over(norm), 4))
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------- q86
@register(
    "q86_retention_cohorts",
    oracle="""
    WITH firstday AS (
      SELECT user_id, min(ts::DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
           date_diff('day', cohort_day, day) AS offset_days,
           count(DISTINCT user_id) AS n_users
    FROM act JOIN firstday USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("mart", "retention"),
)
def q86_retention_cohorts(spark, sf_dir):
    """Retention-cohort triangle: users grouped by first-seen day, with
    distinct active users at each day offset — the classic warehouse
    retention report.

    Scale shape: first-seen and the distinct (user, day) activity grid
    both aggregate on user_id — one partitioning serves the min, the
    distinct, and the join probe; the final (cohort, offset) aggregate
    is calendar²-bounded. At warehouse scale the cohort join broadcasts
    nothing corpus-sized (both sides are user-grain reductions, AQE
    decides)."""
    ev = t(spark, sf_dir, "events")
    firstday = (ev.groupBy("user_id")
                .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(firstday, "user_id")
        .groupBy(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
                 F.datediff("day", "cohort_day").cast("bigint")
                 .alias("offset_days"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort", "offset_days")
    )


# ---------------------------------------------------------------------- q93
@register(
    "q93_dormant_high_value",
    oracle="""
    WITH avg_bal AS (
      SELECT round(avg(c_acctbal), 6) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("mart", "anti-join", "scalar-subquery"),
)
def q93_dormant_high_value(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    order, per segment — the scalar-aggregate subquery + NOT EXISTS
    combination, decorrelated explicitly: the average enters as a
    broadcast 1-row frame (never an eager .first() literal) and the
    NOT EXISTS is a left-anti join against the pre-filtered orders
    side. The cut is rounded to 6dp so avg() addend order can't flip a
    balance comparison.

    Scale shape: one anti-join shuffle on the customer key (both sides
    key-grain; urgent orders pre-filtered at the scan with pushdown)
    plus the bounded-cardinality segment aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.round(F.avg("c_acctbal"), 6).alias("_ab")))
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------- q118
@register(
    "q118_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("mart", "tpch-q3"),
)
def q118_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 unshipped high-revenue orders for one
    market segment as of a cutoff date — the classic
    filter-join-aggregate-topk mart query.

    Scale shape: both date predicates and the segment filter push into
    their scans (the segment prunes customers BEFORE the join); the
    two joins shuffle on their keys with AQE sizing, the aggregate is
    order-grain, and the top-10 plans as TakeOrderedAndProject with
    the l_orderkey tiebreak."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd")
                 .alias("orderdate"),
                 "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------- q119
@register(
    "q119_returned_item_losses",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
           round(CAST(c_acctbal AS DOUBLE), 2) AS acctbal
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1994-01-01'
      AND o_orderdate < DATE '1994-07-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("mart", "tpch-q10"),
)
def q119_returned_item_losses(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year window — the churn-risk report.

    Scale shape: the return flag and the order-date range push into
    the scans; nation broadcasts; the customer-grain aggregate and
    TakeOrdered top-20 carry a full tiebreak."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01")
        & (F.col("o_orderdate") < "1994-07-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("lost_revenue"))
        .select("c_custkey", "c_name", "n_name", "lost_revenue",
                F.round(F.col("c_acctbal").cast("double"), 2)
                .alias("acctbal"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------- q120
@register(
    "q120_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(CAST(o_totalprice AS DOUBLE), 2) AS totalprice,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big USING (l_orderkey)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("mart", "tpch-q18"),
)
def q120_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold — the semi-join-on-aggregate pattern (HAVING subquery
    feeding the main join).

    Scale shape: the qualifying-order set is an order-grain aggregate
    (integer quantities) reused as a semi-join filter BEFORE the wide
    join — Spark shares the l_orderkey partitioning between the
    HAVING aggregate, the semi-join, and the final aggregate, so one
    co-partitioning serves all three."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_q"))
           .filter(F.col("_q") > 150).select("l_orderkey"))
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(big, "l_orderkey", "left_semi")
        .groupBy("c_custkey", "c_name",
                 F.col("o_orderkey"),
                 F.date_format("o_orderdate", "yyyy-MM-dd")
                 .alias("orderdate"),
                 "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
             .alias("total_qty"))
        .select("c_custkey", "c_name", "o_orderkey", "orderdate",
                F.round(F.col("o_totalprice").cast("double"), 2)
                .alias("totalprice"), "total_qty")
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------- q121
@register(
    "q121_cheapest_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 6) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, min(unit_cost) AS min_cost
      FROM cost GROUP BY 1
    )
    SELECT c.l_partkey AS partkey, p_name,
           min(s_name) AS supplier, min(c.unit_cost) AS unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey
               AND c.unit_cost = b.min_cost
    JOIN supplier ON s_suppkey = c.l_suppkey
    JOIN part ON p_partkey = c.l_partkey
    GROUP BY c.l_partkey, p_name
    ORDER BY partkey
    LIMIT 25
    """,
    tags=("mart", "tpch-q2"),
)
def q121_cheapest_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted to the fixture's schema — no partsupp
    table, so observed unit cost = avg price/qty per (part, supplier)):
    for each part, the supplier offering the minimum unit cost — the
    correlated-MIN subquery decorrelated into a per-part aggregate
    joined back on (part, cost).

    Determinism: the unit cost rounds to 6dp at the aggregate (both
    engines average the same per-(part,supplier) doubles — avg addend
    order differs, hence the early round), and cost ties collapse via
    min(supplier name) so the selected SET is stable.

    Scale shape: both the cost table and the per-part min shuffle on
    l_partkey — one co-partitioning serves aggregate, min, and join;
    supplier/part joins are AQE-decided; top-25 with a key order."""
    li = t(spark, sf_dir, "lineitem")
    s, p = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "part")
    cost = (li.filter(F.col("l_quantity") > 0)
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.round(F.avg(F.col("l_extendedprice")
                               / F.col("l_quantity")), 6)
                 .alias("unit_cost")))
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(best, ["l_partkey"])
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(s, cost["l_suppkey"] == s["s_suppkey"])
        .join(p, cost["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("l_partkey").alias("partkey"), "p_name")
        .agg(F.min("s_name").alias("supplier"),
             F.min("unit_cost").alias("unit_cost"))
        .orderBy("partkey")
        .limit(25)
    )


# --------------------------------------------------------------------- q122
@register(
    "q122_bottleneck_suppliers",
    oracle="""
    WITH lastship AS (
      SELECT l_orderkey, max(l_shipdate) AS last_date,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY 1
    )
    SELECT s_name,
           CAST(count(*) AS BIGINT) AS n_waiting
    FROM lineitem l1
    JOIN lastship ls ON l1.l_orderkey = ls.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE ls.n_supp >= 2
      AND l1.l_shipdate = ls.last_date
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
          AND l2.l_shipdate = ls.last_date
      )
    GROUP BY s_name
    ORDER BY n_waiting DESC, s_name
    LIMIT 15
    """,
    tags=("mart", "tpch-q21"),
)
def q122_bottleneck_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: no receipt/commit dates in the
    fixture, so 'kept the order waiting' = SOLE supplier shipping on a
    multi-supplier order's final ship date): suppliers most often the
    last one out the door, with the EXISTS (another supplier
    participated) and NOT EXISTS (nobody else shipped that late)
    pair expressed as an order-grain aggregate + anti-join.

    Scale shape: the per-order last-date/supplier-count aggregate, the
    late-line filter, and the sole-supplier anti-join all key on
    l_orderkey — one co-partitioning end to end; the supplier name
    join is AQE-decided and the result is supplier-grain."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    lastship = (li.groupBy("l_orderkey")
                .agg(F.max("l_shipdate").alias("last_date"),
                     F.countDistinct("l_suppkey").alias("n_supp")))
    late = (li.join(lastship, "l_orderkey")
            .filter((F.col("n_supp") >= 2)
                    & (F.col("l_shipdate") == F.col("last_date"))))
    # NOT EXISTS other-supplier-on-last-date == the late set restricted
    # to orders with exactly ONE distinct late supplier
    sole = (late.groupBy("l_orderkey")
            .agg(F.countDistinct("l_suppkey").alias("_nlate"))
            .filter(F.col("_nlate") == 1)
            .select("l_orderkey"))
    return (
        late.join(sole, "l_orderkey", "left_semi")
        .join(s, late["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("n_waiting"))
        .orderBy(F.desc("n_waiting"), "s_name")
        .limit(15)
    )


# --------------------------------------------------------------------- q123
@register(
    "q123_supplier_diversity",
    oracle="""
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY n_suppliers DESC, p_brand, p_size
    LIMIT 20
    """,
    tags=("mart", "tpch-q16"),
)
def q123_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, size),
    excluding one brand and a NOT-IN supplier blocklist (adapted:
    negative account balance stands in for the complaints predicate).

    Scale shape: the blocklist is a filtered dim reduction —
    broadcast anti-join against the facts BEFORE the wide part join;
    the distinct count shuffles once on the bounded (brand, size)
    grain with a partial distinct; top-20 carries the full
    tiebreak."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    blocked = (s.filter(F.col("s_acctbal") < 0)
               .select(F.col("s_suppkey").alias("l_suppkey")))
    return (
        li.join(F.broadcast(blocked), "l_suppkey", "left_anti")
        .join(p, p["p_partkey"] == li["l_partkey"])
        .filter(F.col("p_brand") != "Brand#45")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint")
             .alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), "p_brand", "p_size")
        .limit(20)
    )


# --------------------------------------------------------------------- q131
@register(
    "q131_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT p_brand, p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             p_size
      FROM part
    )
    SELECT p_brand, p_partkey, price_c, p_size
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.p_brand = a.p_brand
        AND b.price_c <= a.price_c AND b.p_size >= a.p_size
        AND (b.price_c < a.price_c OR b.p_size > a.p_size))
    ORDER BY p_brand, p_partkey
    """,
    tags=("analytics", "skyline"),
)
def q131_pareto_frontier(spark, sf_dir):
    """Per-brand Pareto frontier (skyline) of parts on (price low, size
    high): a part survives iff no same-brand part is at least as cheap
    AND at least as large with one strict. The oracle is the textbook
    quadratic NOT-EXISTS; the engine plans the O(n log n) sweep
    instead — sort each brand by price and take two window maxima
    (max size over strictly-cheaper rows via a RANGE frame ending at
    1 PRECEDING, and max size within the same price tick), so dominance
    is a per-row comparison, not a self-join. One shuffle on the brand
    partition key; brands sweep in parallel; no O(n²) anywhere.
    Prices quantize to integer cents before comparison on both sides.
    (Operator: operators.analytics.pareto_frontier_2d — also the unit
    under tests/test_retrieval_ops' brute-force equivalence check.)"""
    from sunat_rree_demo_spark.operators.analytics import pareto_frontier_2d

    p = t(spark, sf_dir, "part")
    pts = p.select(
        "p_brand", "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
        .alias("price_c"),
        "p_size")
    return (pareto_frontier_2d(pts, "p_brand", "price_c", "p_size")
            .orderBy("p_brand", "p_partkey"))


# --------------------------------------------------------------------- q142
@register(
    "q142_customer_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE year(o_orderdate) = 1996)
    SELECT 'churned' AS segment,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'new', CAST(count(*) AS BIGINT)
    FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    UNION ALL
    SELECT 'retained', CAST(count(*) AS BIGINT)
    FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
    ORDER BY segment
    """,
    tags=("set-ops", "U-family"),
)
def q142_customer_set_ops(spark, sf_dir):
    """Year-over-year customer movement as native set algebra: buyers
    of 1995 vs 1996 split into churned (EXCEPT), new (reverse EXCEPT)
    and retained (INTERSECT) — the U2 set-difference operator under a
    real oracle instead of only the QA plan's pytest (its driver-
    checkable upgrade). Spark's intersect/exceptAll plan as left-semi /
    left-anti joins over the distinct key sets — two scans of the same
    year-pruned aggregate, each shuffling the bounded distinct-customer
    key set, never raw orders twice per side."""
    o = t(spark, sf_dir, "orders")
    a = (o.filter(in_year("o_orderdate", 1995))
         .select("o_custkey").distinct())
    b = (o.filter(in_year("o_orderdate", 1996))
         .select("o_custkey").distinct())

    def seg(name, df):
        return df.agg(F.count("*").cast("bigint").alias("n_customers")) \
            .select(F.lit(name).alias("segment"), "n_customers")

    return (
        seg("churned", a.exceptAll(b).distinct())
        .unionAll(seg("new", b.exceptAll(a).distinct()))
        .unionAll(seg("retained", a.intersect(b)))
        .orderBy("segment")
    )


# --------------------------------------------------------------------- q152
@register(
    "q152_slow_ship_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("mart", "tpch-q4"),
)
def q152_slow_ship_priority(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): orders with at least
    one line shipped more than 60 days after the order date, counted by
    priority — the correlated EXISTS decorrelated into one LEFT SEMI
    join on the order key (the only scalable plan: the fact side is
    filtered by the date predicate INSIDE the semi-join, never
    materialized per order). The schema has no l_commitdate/
    l_receiptdate (reference testdata), so the lateness predicate is
    ship-vs-order-date at the same 2-table shape."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = (li.join(o.select("o_orderkey", "o_orderdate"), F.expr(
        "l_orderkey = o_orderkey AND l_shipdate > o_orderdate + "
        "INTERVAL 60 DAY"))
        .select("l_orderkey"))
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------- q153
@register(
    "q153_promo_revenue_share",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
           CAST(month(l_shipdate) AS BIGINT) AS month_num,
           CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN
                  CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT) ELSE 0 END) AS BIGINT) AS DOUBLE)
             / 100.0 AS promo_rev,
           CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 100, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS total_rev,
           CAST((2 * 1000000
                 * sum(CASE WHEN p_type = 'PROMO' THEN
                       CAST(round(l_extendedprice * (1 - l_discount) * 100,
                                  0) AS BIGINT) ELSE 0 END)
                 + sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                                  0) AS BIGINT)))
                // (2 * sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100, 0) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("mart", "tpch-q14"),
)
def q153_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): share of discounted revenue
    from PROMO-type parts per ship month. Revenue quantizes to integer
    cents BEFORE summing (the q89 discipline) and the percentage is the
    integer micro-unit half-up mean device, so neither engine's sum
    order can drift a cent or a basis point. The part dimension
    broadcasts; one fact scan, map-side combined."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100, 0).cast("bigint")
    j = (li.join(F.broadcast(p.select("p_partkey", "p_type")),
                 li.l_partkey == p.p_partkey)
         .select(F.year("l_shipdate").cast("bigint").alias("year"),
                 F.month("l_shipdate").cast("bigint").alias("month_num"),
                 cents.alias("_c"),
                 F.when(F.col("p_type") == "PROMO", cents).otherwise(0)
                 .alias("_pc")))
    return (
        j.groupBy("year", "month_num")
        .agg(F.sum("_pc").cast("bigint").alias("_pcs"),
             F.sum("_c").cast("bigint").alias("_cs"))
        .select("year", "month_num",
                (F.col("_pcs").cast("double") / 100.0).alias("promo_rev"),
                (F.col("_cs").cast("double") / 100.0).alias("total_rev"),
                (F.expr("(2 * 1000000 * _pcs + _cs) div (2 * _cs)")
                 .cast("double") / 10000.0).alias("promo_pct"))
        .orderBy("year", "month_num")
    )


# --------------------------------------------------------------------- q154
@register(
    "q154_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 100, 0) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100.0 AS revenue
    FROM customer
    JOIN orders    ON o_custkey = c_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    JOIN supplier  ON l_suppkey = s_suppkey
                  AND s_nationkey = c_nationkey
    JOIN nation    ON c_nationkey = n_nationkey
    JOIN region    ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND year(o_orderdate) = 1996
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("mart", "tpch-q5"),
)
def q154_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    orders where the SUPPLIER sits in the customer's own nation — the
    canonical 6-table join whose distinguishing predicate
    (s_nationkey = c_nationkey) rides the supplier join, not a filter.
    Every dimension broadcasts; the two fact-side joins hash on their
    natural keys; revenue is integer cents before summing. The year
    and region filters prune at the orders scan / dimension
    broadcast."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100, 0).cast("bigint")
    return (
        o.filter(in_year("o_orderdate", 1996))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey)
              & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
              n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents).cast("bigint").alias("_c"))
        .select("n_name",
                (F.col("_c").cast("double") / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------- q155
@register(
    "q155_nation_market_share",
    oracle="""
    WITH allrev AS (
      SELECT year(o_orderdate) AS yr, s_nationkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    ),
    tot AS (
      SELECT CAST(yr AS BIGINT) AS yr,
             sum(CASE WHEN s_nationkey = 0 THEN cents ELSE 0 END) AS nc,
             sum(cents) AS tc
      FROM allrev GROUP BY 1
    )
    SELECT yr,
           CAST(CAST(nc AS BIGINT) AS DOUBLE) / 100.0 AS nation_rev,
           CAST(CAST(tc AS BIGINT) AS DOUBLE) / 100.0 AS total_rev,
           CAST((2 * 1000000 * nc + tc) // (2 * tc) AS DOUBLE) / 10000.0
             AS share_pct
    FROM tot WHERE tc > 0 ORDER BY yr
    """,
    tags=("mart", "tpch-q8"),
)
def q155_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): the share of AMERICA-
    region customer revenue supplied by nation 0, per order year — the
    conditional-numerator-over-total pattern computed in ONE pass
    (sum(CASE)/sum, never two scans), integer cents + the micro-unit
    half-up percentage so neither engine's float order can drift a
    basis point."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100, 0).cast("bigint")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
               n.n_regionkey == r.r_regionkey)
         .select(F.year("o_orderdate").cast("bigint").alias("yr"),
                 F.col("s_nationkey"), cents.alias("_c")))
    return (
        j.groupBy("yr")
        .agg(F.sum(F.when(F.col("s_nationkey") == 0, F.col("_c"))
                   .otherwise(0)).cast("bigint").alias("_nc"),
             F.sum("_c").cast("bigint").alias("_tc"))
        .filter(F.col("_tc") > 0)
        .select("yr",
                (F.col("_nc").cast("double") / 100.0).alias("nation_rev"),
                (F.col("_tc").cast("double") / 100.0).alias("total_rev"),
                (F.expr("(2 * 1000000 * _nc + _tc) div (2 * _tc)")
                 .cast("double") / 10000.0).alias("share_pct"))
        .orderBy("yr")
    )
