"""Incremental-view-maintenance query: merging pre-aggregated partials
must equal the full recompute (operators.aggregates.merge_partial_sums)
— the refresh algebra behind every materialized rollup at 100 TB, where
re-scanning the base on each delta is not an option.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.aggregates import merge_partial_sums
from sunat_rree_demo_spark.queries.base import register, t

#: ingest-shard count for the simulated delta batches.
_SHARDS = 3


# --------------------------------------------------------------------- q105
@register(
    "q105_incremental_agg",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(year(l_shipdate) AS BIGINT) AS year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 + count(*)) // (2 * count(*)) AS BIGINT) / 100.0
             AS avg_usd
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY flag, year
    """,
    tags=("incremental", "ivm"),
)
def q105_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance: the facts arrive as three
    disjoint ingest shards (hash of l_suppkey), each pre-aggregated to
    (returnflag, year) grain, then MERGED — and the merge must equal
    the oracle's single full aggregate bit for bit. This is the
    q103-adjacent refresh path: base aggregate + delta aggregates,
    zero re-scans of absorbed data.

    The avg is derived from the merged (cents, n) with integer half-up
    division — composing avg from associative parts is exactly what a
    float running-average cannot do.

    Scale shape: each shard partial shuffles once on the group key with
    map-side combine; the merge shuffles only aggregate-grain rows.
    (In production the shards would be stored parquet partials — the
    CDC upsert sink covers that half; here all three derive from one
    scan so the oracle can see the same rows, and Spark's exchange
    reuse dedupes the triple scan.)"""
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    parts = []
    for shard in range(_SHARDS):
        parts.append(
            li.filter(F.pmod(F.col("l_suppkey"), _SHARDS) == shard)
            .groupBy(F.col("l_returnflag").alias("flag"),
                     F.year("l_shipdate").cast("bigint").alias("year"))
            .agg(F.count("*").cast("bigint").alias("n_lines"),
                 F.sum(cents).cast("bigint").alias("cents")))
    merged = merge_partial_sums(parts, ["flag", "year"],
                                ["n_lines", "cents"])
    return (
        merged.select(
            "flag", "year",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("cents").cast("bigint").alias("cents"),
            (F.expr("(2 * cents + n_lines) div (2 * n_lines)")
             .cast("bigint") / 100.0).alias("avg_usd"))
        .orderBy("flag", "year")
    )
