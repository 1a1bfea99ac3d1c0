"""Similarity-search queries over the embeddings table (driver
mandate): exact brute-force cosine top-k (oracle-checked — Spark's
sequential fold is bit-identical to DuckDB's list_cosine_similarity),
embedding near-dup pairs, and the LSH-bucketed ANN variant (rows-only;
recall vs brute force is asserted in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    near_dup_pairs_blocked,
)
from sunat_rree_demo_spark.queries.base import register, t


# ---------------------------------------------------------------------- q43
@register(
    "q43_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             round(list_cosine_similarity(q.v, e.v), 6) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id
    )
    SELECT q_id, n_id, cos,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, n_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY q_id, rank
    """,
    tags=("similarity", "ann-baseline"),
)
def q43_cosine_topk(spark, sf_dir):
    """Exact cosine top-5 for a broadcast query batch (vec_id < 8) —
    the ANN ground-truth baseline, computed as Arrow-batched numpy block
    products with per-batch pruning; cosines rounded to 6 decimals on
    both engines."""
    e = t(spark, sf_dir, "embeddings")
    return (
        brute_force_topk(e, e.filter(F.col("vec_id") < 8), k=5)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------- q44
@register(
    "q44_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    ORDER BY id1, id2
    """,
    tags=("similarity", "near-dup"),
)
def q44_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cos ≥ 0.3) — both sides blocked
    by hashed id, co-partitioned by block pair, numpy block matmul per
    group: no driver collect at any corpus size; the LSH bucketing (q45)
    is the sub-quadratic path."""
    e = t(spark, sf_dir, "embeddings")
    return near_dup_pairs_blocked(e, threshold=0.3).orderBy("id1", "id2")


# ---------------------------------------------------------------------- q45
@register(
    "q45_ann_lsh_topk",
    oracle=None,  # approximate; recall vs q43 asserted in tests
    tags=("similarity", "ann-lsh"),
)
def q45_ann_lsh_topk(spark, sf_dir):
    """Approximate top-5 via random-hyperplane LSH buckets — each query
    scans only its bucket (~N/2^8 of the corpus)."""
    e = t(spark, sf_dir, "embeddings")
    return (
        lsh_bucketed_topk(e, e.filter(F.col("vec_id") < 8), k=5)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------- q54
@register(
    "q54_ann_ivf_topk",
    oracle=None,  # approximate; recall vs q43 asserted in tests
    tags=("similarity", "ann-ivf"),
)
def q54_ann_ivf_topk(spark, sf_dir):
    """Approximate top-5 via an IVF coarse quantizer (deterministic
    k-means, 16 cells, 4 probes) — each query scans ~n_probe/n_centroids
    of the corpus; the corpus shuffles once by cell id."""
    e = t(spark, sf_dir, "embeddings")
    return (
        ivf_topk(e, e.filter(F.col("vec_id") < 8), k=5)
        .orderBy("q_id", "rank")
    )
