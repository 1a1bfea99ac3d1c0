"""Pattern-mining queries: per-document token entropy (the information
signal of the quality family) and pairwise frequent itemsets over order
baskets (the market-basket staple). Both oracle-checked with integer
quantization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.text import tokens
from sunat_rree_demo_spark.queries.base import register, t

#: minimum pair support for q115.
MIN_SUPPORT = 3


# --------------------------------------------------------------------- q114
@register(
    "q114_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    tc AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
    e AS (
      SELECT tc.doc_id,
             CAST(round((CAST(c AS DOUBLE) / n)
                        * (-log2(CAST(c AS DOUBLE) / n))
                        * 1000000.0) AS BIGINT) AS eu
      FROM tc JOIN n USING (doc_id)
    )
    SELECT e.doc_id, min(n.n) AS n_tokens,
           CAST(sum(eu) AS BIGINT) / 1000000.0 AS entropy
    FROM e JOIN n ON e.doc_id = n.doc_id
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """,
    tags=("text", "entropy"),
)
def q114_token_entropy(spark, sf_dir):
    """Shannon entropy of each document's token distribution (bits) —
    the information-content quality signal: boilerplate and degenerate
    repetition score low, diverse prose scores high (complements the
    q72 repetition fractions and q74 corpus-level surprisal with a
    purely WITHIN-document measure).

    Determinism: each distinct token's −p·log2(p) term quantizes to
    integer micro-bits before the per-doc sum (the q74 discipline).
    Scale shape: one (doc, token) aggregate and one doc-grain
    reduction, both shuffling on high-cardinality uniform keys with
    map-side combine; no per-doc state beyond one document's distinct
    tokens."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(F.col("doc_id"),
                  F.explode(tokens(F.col("text"))).alias("w"))
    tc = tk.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("c"))
    n = tc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    eu = F.round(p * (-F.log2(p)) * 1000000.0, 0).cast("bigint")
    return (
        tc.join(n, "doc_id")
        .select("doc_id", F.col("n"), eu.alias("eu"))
        .groupBy("doc_id")
        .agg(F.min("n").alias("n_tokens"),
             (F.sum("eu").cast("bigint") / 1000000.0).alias("entropy"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------- q115
@register(
    "q115_copurchase_pairs",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    p AS (
      SELECT a.l_partkey AS p1, c.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS support
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
    )
    SELECT p1, p2, support FROM p
    WHERE support >= {MIN_SUPPORT}
    ORDER BY support DESC, p1, p2
    LIMIT 20
    """,
    tags=("mining", "itemsets"),
)
def q115_copurchase_pairs(spark, sf_dir):
    """Pairwise frequent itemsets over order baskets: part pairs
    bought together in ≥ 3 orders, top-20 by support — the
    market-basket / co-occurrence mining staple (the 2-itemset pass of
    Apriori; higher orders iterate the same join shape on the
    survivors).

    Scale shape: the basket self-join keys on the order id, so the
    fan-out per order is C(basket, 2) — bounded by basket size
    (TPC-H ≤ 7 lines → ≤ 21 pairs), NOT corpus size; the pair
    aggregate shuffles on the uniform (p1, p2) key with map-side
    combine, and the top-k plans as TakeOrderedAndProject. A hot SKU
    pair is just a heavy aggregate cell — unlike the hot-shingle
    problem, no row explosion precedes the combine."""
    li = t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    c = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    return (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(20)
    )

