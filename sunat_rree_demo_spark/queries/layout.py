"""Z-order layout query: Morton-bucket clustering statistics over
orders — measures how well a Z-ordered layout would co-bound BOTH
filter dimensions per file (operators.layout).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.layout import (
    morton_code,
    morton_sql,
    with_scaled_bits,
)
from sunat_rree_demo_spark.queries.base import register, t

_BITS = 16
#: bucket = top 8 bits of the 2·16-bit Z value → 256 would-be files.
_BUCKET_SHIFT = 2 * _BITS - 8


# --------------------------------------------------------------------- q107
@register(
    "q107_zorder_stats",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(min(o_custkey) AS BIGINT) AS xmin,
             CAST(max(o_custkey) AS BIGINT) AS xmax,
             CAST(min(date_diff('day', DATE '1992-01-01', o_orderdate)) AS BIGINT) AS ymin,
             CAST(max(date_diff('day', DATE '1992-01-01', o_orderdate)) AS BIGINT) AS ymax
      FROM orders
    ),
    scaled AS (
      SELECT CASE WHEN xmax > xmin
               THEN ((CAST(o_custkey AS BIGINT) - xmin) * {(1 << _BITS) - 1})
                    // (xmax - xmin)
               ELSE CAST(0 AS BIGINT) END AS xb,
             CASE WHEN ymax > ymin
               THEN ((CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) - ymin)
                     * {(1 << _BITS) - 1}) // (ymax - ymin)
               ELSE CAST(0 AS BIGINT) END AS yb,
             o_custkey,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS yday
      FROM orders, stats
    ),
    z AS (
      SELECT ({morton_sql("xb", "yb", _BITS)}) >> {_BUCKET_SHIFT} AS zbucket,
             o_custkey, yday
      FROM scaled
    )
    SELECT zbucket, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(o_custkey) - min(o_custkey) AS BIGINT) AS cust_span,
           CAST(max(yday) - min(yday) AS BIGINT) AS day_span
    FROM z GROUP BY 1 ORDER BY 1
    """,
    tags=("layout", "zorder"),
)
def q107_zorder_stats(spark, sf_dir):
    """Z-order clustering report: scale (o_custkey, order-day) into
    16-bit grids, interleave to the Morton code, group into 256
    curve-order buckets (the would-be files of an OPTIMIZE ZORDER
    rewrite) and report each bucket's row count and min-max span on
    BOTH dimensions — small spans on both axes are exactly what makes
    file-level min/max statistics prune scans filtered on either
    column.

    Determinism: grid scaling is integer ``div`` on exact ints; the
    interleave is pure bit arithmetic generated from one loop in both
    renderings. Scale shape: the min/max stats ride a broadcast 1-row
    frame over the scan; the Z computation is per-row JVM bit math
    (codegen), and the only shuffle is the 256-key bucket aggregate
    with map-side combine. (An actual rewrite would ``repartitionByRange
    (zbucket)`` + sortWithinPartitions(z) before the write — the sink
    side of this plan, covered by the bucketed-table sink.)"""
    o = t(spark, sf_dir, "orders")
    yday = F.datediff("o_orderdate", F.lit("1992-01-01")).cast("bigint")
    stats = o.agg(
        F.min("o_custkey").cast("bigint").alias("xmin"),
        F.max("o_custkey").cast("bigint").alias("xmax"),
        F.min(yday).alias("ymin"), F.max(yday).alias("ymax"))
    scaled = o.select(F.col("o_custkey"), yday.alias("yday")) \
        .join(F.broadcast(stats))
    scaled = with_scaled_bits(scaled, "o_custkey", "xmin", "xmax", "xb",
                              _BITS)
    scaled = with_scaled_bits(scaled, "yday", "ymin", "ymax", "yb", _BITS)
    z = scaled.select(
        F.shiftright(morton_code(F.col("xb"), F.col("yb"), _BITS),
                     _BUCKET_SHIFT).alias("zbucket"),
        "o_custkey", "yday")
    return (
        z.groupBy("zbucket")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             (F.max("o_custkey") - F.min("o_custkey")).cast("bigint")
             .alias("cust_span"),
             (F.max("yday") - F.min("yday")).cast("bigint")
             .alias("day_span"))
        .orderBy("zbucket")
    )
