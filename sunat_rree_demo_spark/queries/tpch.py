"""The remaining classic TPC-H query shapes (Q1, Q6, Q7, Q9, Q12, Q13,
Q15, Q19, Q20, Q11 — adapted to the driver's star schema where a TPC-H
column has no counterpart: no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate).

Together with q76/q79/q93/q118-q123/q152-q155 these complete the
TPC-H-shape inventory: every one of the 22 canonical query patterns now
has at least one engine twin.  The reference's own query surface
(app.py KPI pulls, models/metrics.sql rollups) is a strict subset of
these shapes — the multi-way broadcast-dimension join, the
conditional-aggregate share, the decorrelated EXISTS, the
two-level aggregate histogram — so this module doubles as the parity
stress bed for the operator inventory (SURVEY.md §2.3/§2.4).

Float discipline (CLAUDE.md): every money aggregate quantizes to
integer cents (or 1e-4 / 1e-6 dollar micro-units after exact integer
discount/tax multiplies) BEFORE summing; every average uses the
integer half-up mean device ``(2*scale*sum + n) div (2*n)``; every
HAVING-style share threshold compares integers cross-multiplied, never
floats.  Quantities and discount/tax fractions are exact 2dp doubles in
the fixture (verified), so ``round(x*100)`` is lossless.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.functions.scalars import in_year
from sunat_rree_demo_spark.queries.base import register, t

# exact integer micro-units shared by the module (functions, not
# module-level Columns: building a Column needs an active session) ------
def _cents():
    return F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")


def _d100():
    return F.round(F.col("l_discount") * 100, 0).cast("bigint")


def _t100():
    return F.round(F.col("l_tax") * 100, 0).cast("bigint")


def _disc_du():
    """Discounted price in 1e-4 dollars — cents × integer (100 − d)."""
    return _cents() * (100 - _d100())


def _charge_mu():
    """Discounted+taxed charge in 1e-6 dollars — du × integer (100 + t)."""
    return _disc_du() * (100 + _t100())


# --------------------------------------------------------------------- q157
@register(
    "q157_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                     AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                         * (100 + CAST(round(l_tax * 100, 0) AS BIGINT)))
                     AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST((2 * 10000 * sum(CAST(l_quantity AS BIGINT)) + count(*))
                // (2 * count(*)) AS DOUBLE) / 10000.0 AS avg_qty,
           CAST((2 * 100 * sum(CAST(round(l_extendedprice * 100, 0)
                                    AS BIGINT)) + count(*))
                // (2 * count(*)) AS DOUBLE) / 10000.0 AS avg_price,
           CAST((2 * 10000 * sum(CAST(round(l_discount * 100, 0) AS BIGINT))
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0
             AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("mart", "tpch-q1"),
)
def q157_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (pricing summary report): the canonical one-scan
    nine-aggregate rollup by return flag and line status (reference KPI
    analog: app.py's flow×status totals at full-fact grain).

    Scale shape: a single fact scan with the date filter pushed to
    parquet, map-side partial aggregation into ≤ 6 groups (3 flags × 2
    statuses), so the shuffle carries six rows per task — the textbook
    whole-stage-codegen aggregate.  All nine aggregates derive from
    four integer partial sums (qty, cents, disc-du, charge-mu) plus the
    count; the three averages are computed FROM those sums with the
    half-up integer mean, never a second pass."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("date"))
    g = (li.groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_q"),
              F.sum(_cents()).cast("bigint").alias("_c"),
              F.sum(_disc_du()).cast("bigint").alias("_du"),
              F.sum(_charge_mu()).cast("bigint").alias("_mu"),
              F.sum(_d100()).cast("bigint").alias("_d"),
              F.count("*").cast("bigint").alias("count_order")))
    return (
        g.select(
            "l_returnflag", "l_linestatus",
            F.col("_q").alias("sum_qty"),
            (F.col("_c").cast("double") / 100.0).alias("sum_base_price"),
            (F.col("_du").cast("double") / 10000.0).alias("sum_disc_price"),
            (F.col("_mu").cast("double") / 1000000.0).alias("sum_charge"),
            (F.expr("(2 * 10000 * _q + count_order) div (2 * count_order)")
             .cast("double") / 10000.0).alias("avg_qty"),
            (F.expr("(2 * 100 * _c + count_order) div (2 * count_order)")
             .cast("double") / 10000.0).alias("avg_price"),
            (F.expr("(2 * 10000 * _d + count_order) div (2 * count_order)")
             .cast("double") / 1000000.0).alias("avg_disc"),
            "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------- q158
@register(
    "q158_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * CAST(round(l_discount * 100, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    tags=("mart", "tpch-q6"),
)
def q158_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): what the year's
    revenue would gain if discounts in the 5-7% band on small-quantity
    lines were eliminated — one filtered scan, one global sum.

    The discount-band predicate compares INTEGER hundredths on both
    sides (``round(d*100) BETWEEN 5 AND 7``), never raw doubles, so a
    float rounding flip at the band edge cannot disagree between
    engines.  Scale shape: every predicate is scan-level (pushdown +
    row-group skipping on l_shipdate), zero joins, one-row result."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(in_year("l_shipdate", 1996)
                  & _d100().between(5, 7)
                  & (F.col("l_quantity") < 24))
        .agg((F.sum(_cents() * _d100()).cast("bigint").cast("double")
              / 10000.0).alias("revenue"),
             F.count("*").cast("bigint").alias("n_lines"))
    )


# --------------------------------------------------------------------- q159
@register(
    "q159_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0)
                                       AS BIGINT))) AS BIGINT) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("mart", "tpch-q7"),
)
def q159_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): revenue flowing between an
    ordered pair of nations, by ship year — the two-role dimension
    pattern (nation joined TWICE under different keys, with a
    disjunctive cross-role predicate).

    Scale shape: both nation roles broadcast (constant-size), so the
    pair predicate evaluates as soon as both nationkeys are in hand;
    orders⋈lineitem and customer⋈orders are the only fact shuffles and
    AQE picks their strategy.  The disjunction cannot prune the fact
    scans (either nation may appear on either side) — the honest plan
    filters at the first point both roles are bound, exactly what
    Catalyst does here."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg((F.sum(_disc_du()).cast("bigint").cast("double")
              / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------- q160
@register(
    "q160_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                         - CAST(l_quantity AS BIGINT)
                           * CAST(round(p_retailprice * 100, 0) AS BIGINT)
                           * 50) AS BIGINT) AS DOUBLE) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, l_year DESC
    """,
    tags=("mart", "tpch-q9"),
)
def q160_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product type profit): per supplier-nation,
    per-year profit on parts whose name matches a pattern.  The fixture
    has no partsupp/ps_supplycost, so cost is proxied as 50% of the
    part's retail price per unit — the same join tree and
    revenue-minus-cost aggregand as the canonical query, which is the
    point of the shape (a LIKE-filtered dimension cutting a multi-join
    profit rollup).

    Profit stays in EXACT integer 1e-4 dollars per line (cents ×
    integer discount complement, minus integral-qty × retail-cents ×
    50), so the subtraction — the part of Q9 most sensitive to float
    order — is associative in both engines.  Scale shape: the LIKE
    filter prunes part BEFORE its broadcast; supplier/nation broadcast;
    one fact shuffle for the part join if AQE doesn't broadcast it."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    profit_du = (_disc_du()
                 - F.col("l_quantity").cast("bigint")
                 * F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
                 * 50)
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg((F.sum(profit_du).cast("bigint").cast("double")
              / 10000.0).alias("profit"))
        .orderBy("nation", F.desc("l_year"))
    )


# --------------------------------------------------------------------- q161
@register(
    "q161_late_line_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("mart", "tpch-q12"),
)
def q161_late_line_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes / order priority): count late
    lines by a lineitem attribute, split into high- vs low-priority
    order classes with sum(CASE) — the fixture has no l_shipmode or
    commit/receipt dates, so the group key is l_linestatus and
    lateness is ship-vs-order-date beyond 45 days (same
    join-then-classify shape, distinct from q152's EXISTS
    decorrelation: here the LINE is the output grain, not the order).

    Scale shape: one orders⋈lineitem hash join (orders projected to
    two columns before the shuffle), the date predicate evaluated as a
    join residual, map-side partial sums into ≤ 2 groups."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                F.expr("l_orderkey = o_orderkey AND "
                       "l_shipdate > o_orderdate + INTERVAL 45 DAY"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------- q162
@register(
    "q162_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("mart", "tpch-q13"),
)
def q162_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): the two-level
    aggregate histogram — orders per customer (keeping zero-order
    customers via LEFT OUTER with the filter ON THE JOIN CLAUSE, the
    part of Q13 that trips naive rewrites: filtering in WHERE would
    drop the zeros), then customers per order-count.

    Scale shape: the outer join shuffles on custkey; count(o_orderkey)
    ignores the nulls the outer join manufactures, so no separate
    zero-fill pass; the second aggregate is over ≤ max-orders-per-
    customer distinct counts — tiny.  The priority filter stands in
    for Q13's ``o_comment NOT LIKE`` (no comment column)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o.select("o_custkey", "o_orderkey"),
               c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------- q163
@register(
    "q163_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS rev_du
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(rev_du AS BIGINT) AS DOUBLE) / 10000.0
             AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = supplier_no
    WHERE rev_du = (SELECT max(rev_du) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("mart", "tpch-q15"),
)
def q163_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the revenue view over a quarter
    plus the scalar-max subquery selecting every supplier that attains
    it (ties kept, as the canonical query requires — NOT a top-1 limit,
    which would drop co-maxima).

    Scale shape: the quarter filter prunes the fact scan; one shuffle
    to supplier grain; the max is a 1-row broadcast joined back with an
    integer equality (revenue stays in exact 1e-4 dollar units until
    display, so "equals the max" cannot float-drift).  No global
    window — the same TakeOrderedAndProject-class discipline as the
    q110 fix.  The supplier-grain revenue view is referenced twice
    (join side + scalar max); exchange reuse does NOT fire across the
    differently-pruned subtrees, so it is persisted — one fact pass,
    both consumers read the cached supplier-grain frame (the
    monthly_flows / S12 result-cache idiom, base.py:152; same device
    in q165/q166)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_du()).cast("bigint").alias("rev_du"))
        .persist())
    mx = rev.agg(F.max("rev_du").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.rev_du == F.col("_mx"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                (F.col("rev_du").cast("double") / 10000.0)
                .alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------- q164
@register(
    "q164_disjunctive_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0)
                                       AS BIGINT))) AS BIGINT) AS DOUBLE)
             / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("mart", "tpch-q19"),
)
def q164_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    an OR of three brand/size/quantity conjunction blocks spanning BOTH
    join sides — the shape that forces the optimizer to keep the
    disjunction as a join residual while still extracting the common
    equi-key (p_partkey = l_partkey).  (The canonical query's
    container/shipmode legs have no fixture columns; brand × size ×
    quantity preserves the cross-side structure.)

    Scale shape: part broadcasts (2k rows/sf; bounded dimension), the
    disjunction evaluates inside the broadcast-hash-join residual, one
    scan each side, one-row result.  Catalyst additionally pushes the
    per-side implied filters (brand IN …, qty ≤ 40) below the join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    blocks = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & q.between(20, 40)))
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                F.col("p_partkey") == F.col("l_partkey"))
        .filter(blocks)
        .agg((F.sum(_disc_du()).cast("bigint").cast("double")
              / 10000.0).alias("revenue"),
             F.count("*").cast("bigint").alias("n_lines"))
    )


# --------------------------------------------------------------------- q165
@register(
    "q165_dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS sq
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO' AND year(l_shipdate) = 1996
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, sum(sq) AS tq FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM shipped
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE 10 * sq > 3 * tq
    ORDER BY s_suppkey
    """,
    tags=("mart", "tpch-q20"),
)
def q165_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped quantity of some PROMO part exceeds a fraction of that
    part's total — the aggregate-vs-aggregate threshold semi-join.
    The fixture has no partsupp/ps_availqty, so 'availability' is the
    part's total shipped quantity and the canonical 50%-of-shipped
    threshold becomes 30%-of-total; the decorrelated two-level
    aggregate + fractional-threshold join IS the shape.

    The threshold compares exact integers cross-multiplied
    (``10*sq > 3*tq``) — never a float ratio.  Scale shape: one
    (part, supplier)-grain aggregate from the pruned fact scan; the
    per-part total REUSES that aggregate (persisted — sum of sq, no
    second fact scan); the part-grain join shuffles only part-grain
    rows; supplier
    and nation broadcast; DISTINCT collapses multi-part winners at
    supplier grain."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    shipped = (
        li.filter(in_year("l_shipdate", 1996))
        .join(F.broadcast(p.select("p_partkey")),
              F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
        .persist())
    tot = shipped.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    return (
        shipped.join(tot, "l_partkey")
        .filter(10 * F.col("sq") > 3 * F.col("tq"))
        .join(F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name").distinct()
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------- q166
@register(
    "q166_brand_value_share",
    oracle="""
    WITH v AS (
      SELECT p_brand,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS val_du
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 3
      GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(CAST(val_du AS BIGINT) AS DOUBLE) / 10000.0 AS brand_value
    FROM v
    WHERE 1000 * val_du > 25 * (SELECT sum(val_du) FROM v)
    ORDER BY brand_value DESC, p_brand
    """,
    tags=("mart", "tpch-q11"),
)
def q166_brand_value_share(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): per-group
    value restricted to one nation's suppliers, keeping groups whose
    value exceeds a fixed fraction of the TOTAL — the
    scalar-aggregate-subquery HAVING.  No partsupp in the fixture, so
    value is discounted lineitem revenue at brand grain and the
    threshold is 2.5% (25/1000); the grouped-value vs
    global-scalar-threshold join is the shape.

    The share test cross-multiplies exact integers
    (``1000*val > 25*total``) — a float ratio at the threshold
    boundary could disagree between engines.  Scale shape: one pruned
    fact pass to brand grain (25 groups), the global total REUSES the
    brand aggregate (persisted) via a 1-row broadcast, no second scan,
    no global window."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    v = (li.join(F.broadcast(s.select("s_suppkey")),
                 F.col("s_suppkey") == F.col("l_suppkey"))
         .join(F.broadcast(p.select("p_partkey", "p_brand")),
               F.col("p_partkey") == F.col("l_partkey"))
         .groupBy("p_brand")
         .agg(F.sum(_disc_du()).cast("bigint").alias("val_du"))
         .persist())
    tot = v.agg(F.sum("val_du").alias("_t"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(1000 * F.col("val_du") > 25 * F.col("_t"))
        .select("p_brand",
                (F.col("val_du").cast("double") / 10000.0)
                .alias("brand_value"))
        .orderBy(F.desc("brand_value"), "p_brand")
    )
