"""Scale-path variants and remaining surface: approx distinct (A6 scale
form), ROLLUP subtotals (A12 general form), the trade-shaped round trip
(F1 Total-row filter + F7 month map on reference-shaped data), and the
grouped-map UDAF twin of the base index (UD1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.functions.months import (
    month_name_es_sql,
    month_num_from_name_sql,
)
from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t


# ---------------------------------------------------------------------- q46
@register(
    "q46_approx_distinct",
    oracle=None,  # HLL estimates are engine-specific; bounds asserted in tests
    tags=("A6-scale", "approx"),
)
def q46_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) per segment — the 100 TB form of A6:
    one pass, fixed sketch memory, no expansion shuffle. Rows-only check;
    tests assert ≤5% relative error vs exact."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_buyers"),
             F.count("*").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------- q47
@register(
    "q47_rollup_subtotals",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year,
           CAST(floor((month_num - 1) / 3 + 1) AS INT) AS quarter,
           round(sum(export_usd), 2) AS exports,
           CAST(grouping(CAST(floor((month_num - 1) / 3 + 1) AS INT)) AS INT)
             AS is_subtotal
    FROM monthly
    GROUP BY ROLLUP(year, quarter)
    HAVING grouping(year) = 0
    ORDER BY year, is_subtotal, quarter
    """,
    tags=("A12-general", "rollup"),
)
def q47_rollup_subtotals(spark, sf_dir):
    """ROLLUP(year, quarter): quarterly rows plus per-year subtotal rows
    in one aggregation — the grouping-sets generalization SURVEY §2.4
    notes for A12 (one shuffle produces every subtotal level)."""
    m = monthly_flows(spark, sf_dir).withColumn(
        "quarter", F.floor((F.col("month_num") - 1) / 3 + 1).cast("int"))
    return (
        m.rollup("year", "quarter")
        .agg(F.round(F.sum("export_usd"), 2).alias("exports"),
             F.grouping("quarter").cast("int").alias("is_subtotal"))
        .filter(F.grouping("year") == 0)
        .orderBy("year", "is_subtotal", "quarter")
    )


# ---------------------------------------------------------------------- q48
_TRADE_CTE = f"""
  SELECT year, {month_name_es_sql("month_num")} AS month,
         'export' AS flow, export_usd AS usd
  FROM monthly
  UNION ALL
  SELECT year, {month_name_es_sql("month_num")} AS month,
         'import' AS flow, import_usd AS usd
  FROM monthly
  UNION ALL
  SELECT year, 'Total' AS month, 'export' AS flow,
         round(sum(export_usd), 2) AS usd
  FROM monthly GROUP BY year
"""

_MONTH_TO_NUM = month_num_from_name_sql("month")


@register(
    "q48_trade_roundtrip",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    trade_shaped AS ({_TRADE_CTE})
    SELECT year,
           CAST({_MONTH_TO_NUM} AS BIGINT) AS month_num,
           round(sum(CASE WHEN flow = 'export' THEN usd END), 2) AS export,
           round(sum(CASE WHEN flow = 'import' THEN usd END), 2) AS import_usd
    FROM trade_shaped
    WHERE month != 'Total'
    GROUP BY year, month
    ORDER BY year, month_num
    """,
    tags=("F1", "F7", "A2", "trade-parity"),
)
def q48_trade_roundtrip(spark, sf_dir):
    """Reference-shaped round trip: build a trade-like long table
    (Spanish month names + embedded 'Total' QA rows) from the facts,
    then apply the canonical consumer path — month != 'Total' filter
    (F1), name→number map (F7 inverse), conditional pivot (A2). Proves
    the reference's consumer semantics end-to-end on oracle-checked
    data."""
    from sunat_rree_demo_spark.functions.months import (
        month_name_es,
        month_num_from_name,
    )
    from sunat_rree_demo_spark.operators.relational import filter_not_total

    m = monthly_flows(spark, sf_dir)
    named = m.withColumn("month", month_name_es("month_num"))
    trade_shaped = (
        named.select("year", "month", F.lit("export").alias("flow"),
                     F.col("export_usd").alias("usd"))
        .unionByName(named.select("year", "month",
                                  F.lit("import").alias("flow"),
                                  F.col("import_usd").alias("usd")))
        .unionByName(m.groupBy("year")
                     .agg(F.round(F.sum("export_usd"), 2).alias("usd"))
                     .select("year", F.lit("Total").alias("month"),
                             F.lit("export").alias("flow"), "usd"))
    )
    return (
        filter_not_total(trade_shaped)
        .groupBy("year", "month")
        .agg(F.round(F.sum(F.when(F.col("flow") == "export", F.col("usd"))), 2)
             .alias("export"),
             F.round(F.sum(F.when(F.col("flow") == "import", F.col("usd"))), 2)
             .alias("import_usd"))
        .withColumn("month_num", month_num_from_name("month").cast("bigint"))
        .select("year", "month_num", "export", "import_usd")
        .orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q89
@register(
    "q89_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
           count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("scale", "skew"),
)
def q89_salted_skew_agg(spark, sf_dir):
    """Skew-mitigated aggregation over the WORST key distribution in
    the schema — l_returnflag has 3 values across the whole fact table,
    so a naive groupBy lands ~N/3 rows on three reducers. The engine
    path is the two-phase salted form (operators/skew.py): partial
    aggregate on (key, salt) — uniform, map-side combined — then a
    3-row final reduce; distinct supplier counting salts by the VALUE
    hash so equal suppliers collapse inside their salt before the
    per-key count. The oracle computes the plain aggregation — hash
    equality IS the proof that salting preserves values. Revenue is
    quantized to integer cents before summing, so the two-phase float
    order can't drift a cent."""
    from sunat_rree_demo_spark.operators.skew import (
        salted_count_distinct,
        salted_sum,
    )

    li = t(spark, sf_dir, "lineitem").withColumn(
        "_cents", F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
    rev = salted_sum(li, ["l_returnflag"], "_cents", alias="_c")
    nd = salted_count_distinct(li, ["l_returnflag"], "l_suppkey",
                               alias="n_suppliers")
    return (
        rev.join(nd, "l_returnflag")
        .select("l_returnflag",
                (F.col("_c").cast("double") / 100.0).alias("revenue"),
                "n_suppliers")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------- q91
_KMV_K = 8
_KMV_SALTS = 16  # q91 two-phase bound: 2nd window sees <= k*salts rows/group
_TWO48 = 281474976710656.0  # 2^48; (k-1)*2^48 has 3 significant bits -> exact


@register(
    "q91_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag AS flag,
             ('0x' || substr(sha256('kmv:' || CAST(l_suppkey AS VARCHAR)),
                             1, 12))::UBIGINT AS hv
      FROM lineitem
    ),
    kth AS (
      SELECT flag, hv AS kmin FROM (
        SELECT flag, hv,
               row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn
        FROM h) WHERE rn = {_KMV_K}
    ),
    exact AS (
      SELECT l_returnflag AS flag, count(DISTINCT l_suppkey) AS n_exact
      FROM lineitem GROUP BY 1
    )
    SELECT flag, n_exact,
           round({_KMV_K - 1}.0 * {_TWO48} / kmin, 4) AS n_kmv
    FROM exact JOIN kth USING (flag)
    ORDER BY flag
    """,
    tags=("scale", "sketch"),
)
def q91_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch next to the exact
    count — the ORACLE-CHECKED approximate-distinct the rows-only HLL
    (q46) can't be: with the sha-256-prefix hash the k-th smallest
    value, and therefore the estimate (k−1)/h_k, is bit-identical on
    both engines (Bar-Yossef et al. 2002; the estimator Theta sketches
    build on). (k−1)·2⁴⁸ has 3 significant bits so the one division is
    exact-input IEEE.

    Scale shape: the sketch consumes the DISTINCT (group, hash) table —
    suppliers, not fact rows. The k-th min here is a per-group window
    over that reduction; when group members themselves outgrow a
    partition, the mergeable form is q89's salted two-phase (per-salt
    k minima, then merge k·salts candidates) — KMV's union-mergeability
    is exactly why warehouses use it. Exactness of the estimate is
    pinned by the oracle; its ACCURACY (vs n_exact) is visible in the
    output."""
    li = t(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    # dedup to supplier grain BEFORE hashing (hash runs once per
    # distinct member, not per fact row); the second distinct keeps
    # the oracle's exact set semantics under a hash collision
    h = (li.select(F.col("l_returnflag").alias("flag"), "l_suppkey")
         .distinct()
         .select(
             "flag",
             F.conv(F.substring(
                 F.sha2(F.concat(F.lit("kmv:"),
                                 F.col("l_suppkey").cast("string")), 256),
                 1, 12), 16, 10).cast("bigint").alias("hv"))
         .distinct())
    # two-phase per-group k-min (q89's salt pattern): the kth-smallest
    # hash per flag is found among the per-(flag, salt) k minima, so
    # the second window sorts at most k * _KMV_SALTS rows per flag
    # instead of every distinct supplier hash in one partition.
    salted = h.withColumn("_salt", F.pmod(F.col("hv"), F.lit(_KMV_SALTS)))
    w1 = Window.partitionBy("flag", "_salt").orderBy("hv")
    cand = (salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= _KMV_K).drop("_rn", "_salt"))
    w = Window.partitionBy("flag").orderBy("hv")
    kth = (cand.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == _KMV_K)
           .select("flag", F.col("hv").alias("kmin")))
    exact = (li.groupBy(F.col("l_returnflag").alias("flag"))
             .agg(F.countDistinct("l_suppkey").alias("n_exact")))
    return (
        exact.join(kth, "flag")
        .select("flag", "n_exact",
                F.round(F.lit(float(_KMV_K - 1)) * _TWO48
                        / F.col("kmin"), 4).alias("n_kmv"))
        .orderBy("flag")
    )


# ---------------------------------------------------------------------- q95
@register(
    "q95_native_unpivot",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT year, month_num, 'export_usd' AS flow,
           round(export_usd, 2) AS usd
    FROM monthly WHERE export_usd IS NOT NULL
    UNION ALL
    SELECT year, month_num, 'import_usd', round(import_usd, 2)
    FROM monthly WHERE import_usd IS NOT NULL
    ORDER BY year, month_num, flow
    """,
    tags=("scale", "unpivot"),
)
def q95_native_unpivot(spark, sf_dir):
    """Wide→long via the NATIVE ``DataFrame.unpivot`` (melt) API —
    the S6 operator family expressed through Spark's dedicated
    Expand-based operator rather than the stack()/union composition
    (q48 exercises the consumer path; this pins the API surface). One
    Expand node, no join, null measures dropped like the reference's
    melt; values re-rounded at 2dp only to pin the emitted type."""
    m = monthly_flows(spark, sf_dir)
    return (
        m.unpivot(
            ids=["year", "month_num"],
            values=["export_usd", "import_usd"],
            variableColumnName="flow",
            valueColumnName="_usd",
        )
        .filter(F.col("_usd").isNotNull())
        .select("year", "month_num", "flow",
                F.round("_usd", 2).alias("usd"))
        .orderBy("year", "month_num", "flow")
    )


# --------------------------------------------------------------------- q110
_KMV_SET_K = 16


@register(
    "q110_kmv_set_ops",
    oracle=f"""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1994),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE year(o_orderdate) = 1995),
    ha AS (
      SELECT DISTINCT
             ('0x' || substr(sha256('kmv:' || CAST(o_custkey AS VARCHAR)),
                             1, 12))::UBIGINT AS hv
      FROM a
    ),
    hb AS (
      SELECT DISTINCT
             ('0x' || substr(sha256('kmv:' || CAST(o_custkey AS VARCHAR)),
                             1, 12))::UBIGINT AS hv
      FROM b
    ),
    hu AS (SELECT DISTINCT hv FROM (SELECT hv FROM ha
                                    UNION ALL SELECT hv FROM hb)),
    topk AS (
      SELECT hv FROM (
        SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hu)
      WHERE rn <= {_KMV_SET_K}
    ),
    kth AS (
      SELECT max(hv) AS kmin, CAST(count(*) AS BIGINT) AS kn FROM topk
    ),
    inboth AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM topk JOIN ha USING (hv) JOIN hb USING (hv)
    ),
    ex AS (
      SELECT CAST((SELECT count(*) FROM (SELECT o_custkey FROM a
                   UNION SELECT o_custkey FROM b)) AS BIGINT) AS n_union,
             CAST((SELECT count(*) FROM a JOIN b USING (o_custkey))
                  AS BIGINT) AS n_inter
    )
    SELECT n_union, n_inter,
           round(CASE WHEN kn < {_KMV_SET_K}
                      THEN CAST(kn AS DOUBLE)
                      ELSE {_KMV_SET_K - 1}.0 * 281474976710656.0 / kmin
                 END, 4) AS est_union,
           round(CAST(c AS DOUBLE) / NULLIF(kn, 0), 4) AS jaccard_est,
           round((CAST(c AS DOUBLE) / NULLIF(kn, 0))
                 * (CASE WHEN kn < {_KMV_SET_K}
                         THEN CAST(kn AS DOUBLE)
                         ELSE {_KMV_SET_K - 1}.0 * 281474976710656.0 / kmin
                    END), 4) AS est_inter
    FROM ex, kth, inboth
    """,
    tags=("scale", "sketch", "set-ops"),
)
def q110_kmv_set_ops(spark, sf_dir):
    """KMV sketch SET ALGEBRA (Beyer et al. 2007): estimate the union
    size, Jaccard, and intersection size of two customer cohorts (1994
    vs 1995 buyers) from k-minimum-value sketches, next to the exact
    answers — the mergeable-summary operation behind cross-partition
    COUNT DISTINCT and audience-overlap queries at warehouse scale.

    The union sketch is the k smallest hashes of A∪B, the Jaccard
    estimate the fraction of those present in both sets; everything
    derives from the q91 sha-48 hash device, so both engines compute
    the identical kth-min, membership count, and 4dp estimates.

    Scale shape: per-set distinct reductions feed the hash table; the
    global k-th min is a window over the distinct-hash reduction
    (mergeable per-partition top-k + merge is the cluster form —
    sketches compose by union, which is the point); membership checks
    join the k-row topk frame (broadcast) against the per-set hash
    tables."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")

    def cohort(year):
        # raw-column date-range compare (not year()) so the predicate
        # reaches the parquet reader and skips whole row groups
        return (o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("date")))
            .select("o_custkey").distinct())

    def hashes(c):
        return c.select(
            F.conv(F.substring(
                F.sha2(F.concat(F.lit("kmv:"),
                                F.col("o_custkey").cast("string")), 256),
                1, 12), 16, 10).cast("bigint").alias("hv")).distinct()

    a, b = cohort(1994), cohort(1995)
    ha, hb = hashes(a), hashes(b)
    hu = ha.unionByName(hb).distinct()
    # global k smallest hashes via orderBy+limit: plans as
    # TakeOrderedAndProject (per-partition top-k, then a k-row merge) —
    # no single-partition global-window sort of the full hash set
    topk = hu.orderBy("hv").limit(_KMV_SET_K).select("hv")
    kth = topk.agg(F.max("hv").alias("kmin"),
                   F.count("*").cast("bigint").alias("kn"))
    inboth = (topk.join(ha, "hv").join(hb, "hv")
              .agg(F.count("*").cast("bigint").alias("c")))
    n_union = (a.unionByName(b).distinct()
               .agg(F.count("*").cast("bigint").alias("n_union")))
    n_inter = (a.join(b, "o_custkey")
               .agg(F.count("*").cast("bigint").alias("n_inter")))
    two48 = 281474976710656.0
    # Beyer et al.: a NON-FULL sketch (union distinct < k) IS the set —
    # return the exact count; Jaccard divides by the sketch size either
    # way (kn == k when full)
    est_u = F.when(F.col("kn") < _KMV_SET_K, F.col("kn").cast("double")) \
        .otherwise(F.lit(float(_KMV_SET_K - 1)) * two48 / F.col("kmin"))
    # ANSI guard (kn = 0 only for an empty cohort union)
    jacc = F.when(F.col("kn") != 0,
                  F.col("c").cast("double") / F.col("kn"))
    return (
        n_union.join(F.broadcast(n_inter))
        .join(F.broadcast(kth)).join(F.broadcast(inboth))
        .select("n_union", "n_inter",
                F.round(est_u, 4).alias("est_union"),
                F.round(jacc, 4).alias("jaccard_est"),
                F.round(jacc * est_u, 4).alias("est_inter"))
    )
