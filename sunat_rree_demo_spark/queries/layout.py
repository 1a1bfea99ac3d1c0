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


# --------------------------------------------------------------------- q195
_BM_SOURCES = ("src1", "src3", "src5", "src7")


@register(
    "q195_bitmap_index_intersect",
    oracle=f"""
    WITH b1 AS (
      SELECT lang, doc_id // 63 AS word,
             bit_or(1::BIGINT << CAST(doc_id % 63 AS INT)) AS m
      FROM documents GROUP BY 1, 2
    ),
    b2 AS (
      SELECT doc_id // 63 AS word,
             bit_or(1::BIGINT << CAST(doc_id % 63 AS INT)) AS m
      FROM documents
      WHERE source IN {_BM_SOURCES!r}
      GROUP BY 1
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(bit_count(b1.m & b2.m)) AS BIGINT) AS n_docs
    FROM b1 JOIN b2 USING (word)
    GROUP BY lang ORDER BY lang
    """,
    tags=("layout", "bitmap-index", "set-intersection"),
)
def q195_bitmap_index_intersect(spark, sf_dir):
    """BITMAP-INDEX set intersection: doc-id membership per predicate
    value packed into 63-bit words (word = id div 63, bit = id mod 63 —
    63 keeps every mask positive in signed int64 on both engines), one
    bitmap per language and one for a source whitelist; the conjunctive
    count comes from joining word-aligned bitmaps and popcounting the
    AND — the Roaring/word-aligned-hybrid device warehouses use for
    multi-predicate filters without rescanning the fact table.

    Scale shape: each bitmap build is one map-side-combined groupBy
    (output 63× smaller than the id list); the intersection joins on
    the word key only — at 100 TB the AND+popcount touches bitmap
    words, never documents. The companion test pins bitmap counts ==
    direct predicate counts."""
    d = t(spark, sf_dir, "documents")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 63 AS INT))")
    word = (F.col("doc_id") / 63).cast("bigint").alias("word")
    b1 = (d.select("lang", word, mask.alias("mk"))
          .groupBy("lang", "word").agg(F.bit_or("mk").alias("m1")))
    b2 = (d.filter(F.col("source").isin(*_BM_SOURCES))
          .select(word, mask.alias("mk"))
          .groupBy("word").agg(F.bit_or("mk").alias("m2")))
    return (
        b1.join(b2, "word")
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_words"),
             F.sum(F.bit_count(F.col("m1").bitwiseAND(F.col("m2"))))
             .cast("bigint").alias("n_docs"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------- q196
_BLOOM_WORDS = 64                 # m = 64*63 = 4032 bits
_BLOOM_K = 3                      # hash functions
_BLOOM_M = _BLOOM_WORDS * 63


def _bloom_pos_sql(key_expr: str, i: int) -> str:
    """DuckDB: i-th bloom position of a key (28-bit sha prefix mod m —
    the repo's engine-independent hash device)."""
    return (f"(('0x' || substr(sha256({key_expr} || '#{i}'), 1, 7))"
            f"::BIGINT % {_BLOOM_M})")


@register(
    "q196_bloom_filter_join",
    oracle=f"""
    WITH urgent AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    bloom AS (
      SELECT pos // 63 AS word,
             bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS m
      FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql("CAST(o_orderkey AS VARCHAR)", i) for i in range(_BLOOM_K))}]) AS pos
        FROM urgent)
      GROUP BY 1
    ),
    probe AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem
    ),
    pp AS (
      SELECT k, unnest([{", ".join(_bloom_pos_sql("CAST(k AS VARCHAR)", i) for i in range(_BLOOM_K))}]) AS pos
      FROM probe
    ),
    hits AS (
      SELECT pp.k,
             min(CASE WHEN b.m IS NOT NULL
                       AND (b.m >> CAST(pos % 63 AS INT)) & 1 = 1
                 THEN 1 ELSE 0 END) AS ok
      FROM pp LEFT JOIN bloom b ON pos // 63 = b.word
      GROUP BY 1
    ),
    flagged AS (
      SELECT o.o_orderpriority AS priority, h.ok,
             CASE WHEN u.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS mem
      FROM hits h
      JOIN orders o ON h.k = o.o_orderkey
      LEFT JOIN urgent u ON h.k = u.o_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(ok) AS BIGINT) AS n_bloom_pass,
           CAST(sum(mem) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN ok = 1 AND mem = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
    tags=("layout", "bloom-filter", "semi-join"),
)
def q196_bloom_filter_join(spark, sf_dir):
    """BLOOM-FILTER SEMI-JOIN, fully deterministic: the urgent-order
    key set builds a {_BLOOM_K}-hash, {_BLOOM_M}-bit filter (63-bit
    words, positions from the repo's 28-bit sha device — identical on
    every engine, unlike Spark's native murmur-based runtime filter);
    probing the fact's distinct keys classifies each as bloom-pass or
    reject, and the exact membership join quantifies FALSE POSITIVES
    per order priority — the table you read before sizing a real
    runtime filter (Spark's own bloom pushdown does this invisibly;
    here the mechanism itself is a queryable, engine-portable object).

    Scale shape: the filter is {_BLOOM_WORDS} words regardless of
    corpus size — it broadcasts; probe cost is {_BLOOM_K} map-side
    lookups per DISTINCT key; nothing pairwise, nothing corpus-grain
    beyond the one distinct()."""
    from sunat_rree_demo_spark.operators.dedup import base_hash_col

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey").distinct())

    def positions(key_col):
        return F.array(*[
            base_hash_col(F.concat(key_col.cast("string"),
                                   F.lit(f"#{i}"))) % _BLOOM_M
            for i in range(_BLOOM_K)])

    bloom = (urgent.select(F.explode(positions(F.col("o_orderkey")))
                           .alias("pos"))
             .select((F.col("pos") / 63).cast("bigint").alias("word"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pos % 63 AS INT))").alias("mk"))
             .groupBy("word").agg(F.bit_or("mk").alias("m")))
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    pp = probe.select("k", F.explode(positions(F.col("k"))).alias("pos")) \
        .withColumn("word", (F.col("pos") / 63).cast("bigint"))
    hits = (
        pp.join(F.broadcast(bloom), "word", "left")
        .withColumn("hit", F.when(
            F.col("m").isNotNull()
            & (F.expr("(m >> CAST(pos % 63 AS INT)) & 1") == 1), 1)
            .otherwise(0))
        .groupBy("k").agg(F.min("hit").alias("ok"))
    )
    flagged = (
        hits.join(o.select(F.col("o_orderkey").alias("k"),
                           F.col("o_orderpriority").alias("priority")), "k")
        .join(urgent.select(F.col("o_orderkey").alias("k"),
                            F.lit(1).alias("mem")), "k", "left")
        .withColumn("mem", F.coalesce("mem", F.lit(0)))
    )
    return (
        flagged.groupBy("priority")
        .agg(F.count("*").cast("bigint").alias("n_keys"),
             F.sum("ok").cast("bigint").alias("n_bloom_pass"),
             F.sum("mem").cast("bigint").alias("n_members"),
             F.sum(F.when((F.col("ok") == 1) & (F.col("mem") == 0), 1)
                   .otherwise(0)).cast("bigint").alias("n_false_pos"))
        .orderBy("priority")
    )
