"""Similarity search over embedding columns (driver mandate,
SURVEY.md §7.4): brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH-bucketed variant as the scale path.

Vectors are ``array<float>``; all arithmetic casts to double and folds
sequentially (``aggregate``/``zip_with``) — verified bit-identical to
DuckDB's ``list_cosine_similarity``/``list_dot_product`` on the same
data, so the oracle can compare raw doubles.

Scale notes: brute force is O(Q×N) — fine when Q (the query batch) is
small and broadcastable; the LSH variant buckets both sides by sign
patterns so each query only scans its bucket (recall < 1, tunable via
number of tables/planes). An IVF variant (k-means coarse quantizer)
would slot in the same shape: assign → co-partition by centroid → local
top-k → global top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (bit-compatible with DuckDB)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the query batch against the corpus,
    rank per query with a deterministic tiebreak. One pass over the
    corpus regardless of |queries|."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       as_double(F.col(vec_col)).alias("q_vec"))
    c = emb.select(F.col(id_col).alias("n_id"),
                   as_double(F.col(vec_col)).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id",
                cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs(emb: DataFrame, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cos ≥ t).
    Exact form is a self-cross join — the verification baseline; the LSH
    bucketing below is the scale path."""
    a = emb.select(F.col(id_col).alias("id1"), as_double(F.col(vec_col)).alias("v1"))
    b = emb.select(F.col(id_col).alias("id2"), as_double(F.col(vec_col)).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (fixed LCG —
    no RNG state, reproducible across sessions/engines)."""
    planes = []
    state = 88172645463325252
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 2000001) / 1000000.0) - 1.0)
        planes.append(row)
    return planes


def lsh_bucketed_topk(emb: DataFrame, queries: DataFrame, k: int,
                      n_tables: int = 4, n_planes: int = 4, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH (OR-construction):
    per table, bucket = sign pattern of ``n_planes`` projections; a
    corpus vector is a candidate if it shares the query's bucket in ANY
    table; exact cosine re-rank over the distinct candidate set.

    Equi-join on (table, bucket) replaces the cross join — at 100 TB the
    corpus shuffles once by bucket key and each query touches
    ~N·(1−(1−2^−planes)^tables) candidates. Recall/latency trades via
    (n_tables, n_planes); recall is tested against ``brute_force_topk``."""
    planes = _hyperplanes(dim, n_tables * n_planes)

    def bucket_entries(vec: Column) -> Column:
        """array<struct<tbl,bucket>> — one bucket id per table."""
        entries = []
        for ti in range(n_tables):
            bits = [
                F.when(dot(vec, F.array(*[F.lit(x) for x in planes[ti * n_planes + i]])) >= 0,
                       F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(n_planes)
            ]
            entries.append(F.struct(F.lit(ti).alias("tbl"),
                                    sum(bits).cast("bigint").alias("bucket")))
        return F.array(*entries)

    c = (emb.select(F.col(id_col).alias("n_id"),
                    as_double(F.col(vec_col)).alias("n_vec"))
            .withColumn("be", F.explode(bucket_entries(F.col("n_vec"))))
            .select("n_id", "n_vec", "be.tbl", "be.bucket"))
    q = (queries.select(F.col(id_col).alias("q_id"),
                        as_double(F.col(vec_col)).alias("q_vec"))
                .withColumn("be", F.explode(bucket_entries(F.col("q_vec"))))
                .select("q_id", "q_vec", "be.tbl", "be.bucket"))

    cand = (
        c.join(F.broadcast(q), on=["tbl", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = cand.select(
        "q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
