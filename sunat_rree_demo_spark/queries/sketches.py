"""Frequency-sketch queries: the count-min sketch (Cormode &
Muthukrishnan 2005) built and probed in-engine with the repo's shared
sha-48 hash device, so the whole sketch — counters AND estimates — is
oracle-checked. Complements the KMV (q91/q110) and HLL (q46)
cardinality sketches and the streaming Misra-Gries heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_estimates,
    cms_partial_counts,
)
from sunat_rree_demo_spark.queries.base import register, t

#: probe set size (top exact terms).
CMS_PROBES = 20

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _bucket_sql(term_expr: str, j: int) -> str:
    return (f"('0x' || substring(sha256('cms{j}:' || {term_expr}), 1, 12))"
            f"::BIGINT % {CMS_WIDTH}")


def _cms_rows_sql(src: str, term: str) -> str:
    """UNION ALL of the depth rows — (j, bucket[, …]) per term row."""
    return " UNION ALL ".join(
        f"SELECT {j} AS j, {_bucket_sql(term, j)} AS bucket, * FROM {src}"
        for j in range(CMS_DEPTH))


# --------------------------------------------------------------------- q135
@register(
    "q135_count_min_sketch",
    oracle=f"""
    WITH tk AS (SELECT unnest({_TOKS}) AS term FROM documents),
    rows_ AS ({_cms_rows_sql('tk', 'term')}),
    cms AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
            FROM rows_ GROUP BY 1, 2),
    ex AS (SELECT term, CAST(count(*) AS BIGINT) AS n_exact
           FROM tk GROUP BY 1),
    probes AS (SELECT term, n_exact FROM ex
               ORDER BY n_exact DESC, term LIMIT {CMS_PROBES}),
    pb AS ({_cms_rows_sql('probes', 'term')}),
    est AS (
      SELECT pb.term, pb.n_exact, min(cms.c) AS cms_est
      FROM pb JOIN cms USING (j, bucket)
      GROUP BY 1, 2
    )
    SELECT term, n_exact, cms_est,
           cms_est - n_exact AS overestimate
    FROM est ORDER BY n_exact DESC, term
    """,
    tags=("sketch", "count-min"),
)
def q135_count_min_sketch(spark, sf_dir):
    """Count-min sketch (4 × 64) over the corpus token stream, probed
    at the 20 highest-frequency terms: per probe, the exact count, the
    sketch estimate (min over the 4 hash rows), and the one-sided
    overestimate — the sketch guarantee (est ≥ exact) that
    test_retrieval_ops also pins. Hash rows use the shared sha-48
    device with a ``cms{{j}}:`` domain separator, so both engines place
    every counter identically.

    Scale shape: the sketch build is ONE shuffle of (j, bucket) keys —
    4·W = 256 distinct keys regardless of corpus size, with map-side
    combine doing almost all the work (this is why CMS exists: fixed
    memory at any scale). The probe set is a bounded TakeOrdered
    broadcast; estimates join on the 256-key sketch."""
    from sunat_rree_demo_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    tk = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    cms = cms_partial_counts(tk)
    ex = tk.groupBy("term").agg(F.count("*").cast("bigint").alias("n_exact"))
    probes = ex.orderBy(F.desc("n_exact"), "term").limit(CMS_PROBES)
    return (
        cms_estimates(cms, probes)
        .select("term", "n_exact", "cms_est",
                (F.col("cms_est") - F.col("n_exact")).alias("overestimate"))
        .orderBy(F.desc("n_exact"), "term")
    )


# --------------------------------------------------------------------- q189
@register(
    "q189_quantile_sketch_merge",
    oracle="""
    WITH h AS (
      SELECT l_returnflag AS scope,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 10000
               AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT scope, bin, c FROM h
      UNION ALL
      SELECT 'ALL', bin, CAST(sum(c) AS BIGINT) FROM h GROUP BY 2
    ),
    cum AS (
      SELECT scope, bin, c,
             sum(c) OVER (PARTITION BY scope ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY scope) AS n
      FROM m
    ),
    q AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90'),
                                (99, 100, 'p99')) t(qn, qd, qname)),
    hit AS (
      SELECT scope, qname, min(bin) AS bin
      FROM cum, q
      WHERE cum >= (n * qn + qd - 1) // qd
      GROUP BY 1, 2
    ),
    est AS (
      SELECT c2.scope, h2.qname,
             c2.bin * 10000
               + (((c2.n * q.qn + q.qd - 1) // q.qd
                   - (c2.cum - c2.c)) * 10000) // c2.c AS est_cents
      FROM hit h2
      JOIN cum c2 ON h2.scope = c2.scope AND h2.bin = c2.bin
      JOIN q ON q.qname = h2.qname
    )
    SELECT scope, qname AS quantile,
           CAST(est_cents AS DOUBLE) / 100.0 AS est_usd
    FROM est ORDER BY scope, quantile
    """,
    tags=("sketch", "quantile", "mergeable"),
)
def q189_quantile_sketch_merge(spark, sf_dir):
    """MERGEABLE QUANTILE SKETCH (equi-width histogram family): each
    return-flag partition builds its own $100-bin histogram of
    extended price, the 'ALL' scope is the MERGE (bin-wise count sum —
    the property that makes the sketch distributable: partials combine
    map-side, shards combine by addition), and p50/p90/p99 come from
    the cumulative counts with exact-integer uniform interpolation
    inside the hit bin (ceil-rank, floor interpolation — every engine
    reproduces it bit-for-bit, unlike t-digest centroids).

    Scale shape: one fact scan → (scope, bin) partials with map-side
    combine (bin domain is price-range/100 ≈ 1k rows, data-independent)
    — the cumulative window runs over that bounded bin domain, never
    rows. At 100 TB the same two-level merge handles per-executor then
    per-shard combination with no extra machinery.

    Binning note: this query's inline bin (truncating cast, matching
    its frozen SQL oracle's ``//`` on the POSITIVE price domain)
    coincides with the floor-division general operator
    (operators/sketches.py ``equi_width_histogram``) exactly because
    l_extendedprice > 0; signed inputs must go through the operator
    (negative-bin test in tests/test_sketch_stream.py)."""
    from sunat_rree_demo_spark.operators.sketches import (
        HIST_BIN_CENTS,
        histogram_quantiles,
    )

    li = t(spark, sf_dir, "lineitem")
    h = (li.groupBy(
            F.col("l_returnflag").alias("scope"),
            (F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
             / HIST_BIN_CENTS).cast("bigint").alias("bin"))
         .agg(F.count("*").cast("bigint").alias("c")))
    merged = h.unionByName(
        h.groupBy("bin").agg(F.sum("c").cast("bigint").alias("c"))
        .select(F.lit("ALL").alias("scope"), "bin", "c"))
    return histogram_quantiles(merged, scope_cols=("scope",))
