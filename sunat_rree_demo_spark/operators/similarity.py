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

from sunat_rree_demo_spark.localrel import local_df
from sunat_rree_demo_spark.operators.skew import fan_out


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


def _score_candidates(cand: DataFrame, k: int) -> DataFrame:
    """Shared re-rank tail for the ANN variants: numpy cosine per
    (q_vec, n_vec) candidate row, then window rank with the
    deterministic (cos desc, n_id) tiebreak, keep top-k. One definition
    so LSH/IVF scoring can never drift from each other."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    score_schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("n_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qm = np.array(list(pdf["q_vec"]), dtype="float64")
            nm = np.array(list(pdf["n_vec"]), dtype="float64")
            num = np.einsum("ij,ij->i", qm, nm)
            den = (np.sqrt((qm * qm).sum(axis=1))
                   * np.sqrt((nm * nm).sum(axis=1)))
            den[den == 0] = 1.0
            yield pd.DataFrame({
                "q_id": pdf["q_id"].to_numpy(dtype="int64"),
                "n_id": pdf["n_id"].to_numpy(dtype="int64"),
                "cos": np.round(num / den, COS_DECIMALS)})

    scored = cand.mapInPandas(score, schema=score_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


#: decimals both engines round cosines to — pins cross-engine equality
#: (BLAS/pairwise vs sequential summation differ only in the last ulps).
COS_DECIMALS = 6


def brute_force_topk_fold(emb: DataFrame, queries: DataFrame, k: int,
                          id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Fold-based exact top-k (bit-identical to DuckDB, but the
    higher-order-function fold is interpreted, not codegen'd — kept as
    the verification twin of the numpy path below)."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       as_double(F.col(vec_col)).alias("q_vec"))
    c = emb.select(F.col(id_col).alias("n_id"),
                   as_double(F.col(vec_col)).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id",
                F.round(cosine(F.col("q_vec"), F.col("n_vec")), COS_DECIMALS)
                .alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Small side → driver numpy matrix (broadcast via task closure)."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    return ids, mat, norms


def _blockwise_topk(emb: DataFrame, k: int, id_col: str, vec_col: str,
                    q_ids, qn, label_col: str | None = None,
                    q_labels=None) -> DataFrame:
    """Shared Arrow-batched block-matmul top-k core (the q43 device):
    the query matrix rides the task closure; each corpus Arrow batch is
    one BLAS matmul with a per-batch k-prune (lexsort on (-cos, n_id)
    for determinism) so tasks emit ≤ k·Q rows at any corpus size; a
    final window rank merges batch winners. Candidate eligibility is
    the one variation point: by default the query's own id is excluded;
    with ``label_col``/``q_labels`` set, SAME-LABEL rows are excluded
    instead (hard-negative mining) — the mask applies INSIDE the batch,
    before pruning."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("n_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])
    cols = [id_col, vec_col] + ([label_col] if label_col else [])

    def score(batches):
        for pdf in batches:
            n_ids = pdf[id_col].to_numpy(dtype="int64")
            # labels compare generically (!=) — int, string, or
            # categorical all work; no int64 hard-cast
            n_labels = (pdf[label_col].to_numpy()
                        if label_col else None)
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            scores = np.round((mat / norms[:, None]) @ qn, COS_DECIMALS)
            frames = []
            for qi in range(len(q_ids)):
                col = scores[:, qi]
                if label_col:
                    mask = n_labels != q_labels[qi]
                else:
                    mask = n_ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # per-batch prune: keep k best (ties included via argsort
                # on (-cos, n_id) for determinism)
                order = np.lexsort((n_ids[cand_idx], -col[cand_idx]))[:k]
                keep = cand_idx[order]
                frames.append(pd.DataFrame({
                    "q_id": q_ids[qi], "n_id": n_ids[keep], "cos": col[keep]}))
            if frames:
                yield pd.concat(frames)

    scored = fan_out(emb.select(*cols)).mapInPandas(
        score, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k — Arrow-batched numpy block products.

    The query batch (small) rides the task closure as a dense matrix;
    each Arrow batch of the corpus becomes one BLAS matmul
    (batch × dim) @ (dim × Q), with per-batch top-k pruning so each task
    emits ≤ k·Q rows no matter the corpus size; a final window rank
    merges batch winners. This is the 100 TB shape: one corpus pass, no
    pairwise shuffle, vectorized math, bounded task output."""
    q_ids, q_mat, q_norms = _collect_matrix(queries, id_col, vec_col)
    qn = (q_mat / q_norms[:, None]).T  # dim × Q
    return _blockwise_topk(emb, k, id_col, vec_col, q_ids, qn)


def near_dup_pairs(emb: DataFrame, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cos ≥ t) —
    numpy block product per Arrow batch against the corpus matrix.

    Here the corpus rides the closure (fine up to ~10⁶ rows × small dim)
    — the small-N fast path: one corpus pass, zero shuffle. Past the
    driver-memory cap use :func:`near_dup_pairs_blocked`, which blocks
    BOTH sides and never collects. Threshold filtering happens inside
    the batch, so only matches leave Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    c_ids, c_mat, c_norms = _collect_matrix(emb, id_col, vec_col)
    cn = (c_mat / c_norms[:, None]).T

    out_schema = T.StructType([
        T.StructField("id1", T.LongType()),
        T.StructField("id2", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            scores = np.round((mat / norms[:, None]) @ cn, COS_DECIMALS)
            rows, cols = np.nonzero((scores >= threshold)
                                    & (ids[:, None] < c_ids[None, :]))
            if len(rows):
                yield pd.DataFrame({"id1": ids[rows], "id2": c_ids[cols],
                                    "cos": scores[rows, cols]})

    return fan_out(emb.select(id_col, vec_col)).mapInPandas(
        score, schema=out_schema)


def near_dup_pairs_blocked(emb: DataFrame, threshold: float,
                           n_blocks: int = 8,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine near-dups with BOTH sides blocked — the 100 TB
    path: no driver collect, no closure-shipped corpus.

    Plan shape: every vector gets a deterministic block id
    (``xxhash64(id) mod n_blocks``); the block-pair table
    {(b1, b2) | b1 ≤ b2} is tiny and broadcast; each vector is tagged
    into every pair where its block participates (side A for
    (blk, b2 ≥ blk), side B for (b1 < blk, blk)), then ONE shuffle
    co-partitions by (b1, b2) and ``applyInPandas`` runs the same numpy
    block matmul per pair group — within-block upper triangle for
    b1 == b2, cross A×B otherwise, so every unordered pair is scored
    exactly once. Replication factor is n_blocks + 1 per row; peak group
    memory is ~2·N/n_blocks × dim doubles, so ``n_blocks`` scales with
    corpus size independent of driver memory (vs the closure cap of
    :func:`near_dup_pairs`). Only pairs with rounded cos ≥ threshold
    leave Python — identical semantics to the closure variant."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    v = emb.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    rng = spark.range(n_blocks)
    bpairs = (
        rng.select(F.col("id").cast("int").alias("b1"))
        .crossJoin(rng.select(F.col("id").cast("int").alias("b2")))
        .filter(F.col("b1") <= F.col("b2"))
    )
    tagged = (
        v.join(F.broadcast(bpairs), v["blk"] == F.col("b1"))
        .select("b1", "b2", "vid", "vec", F.lit(0).alias("side"))
        .unionByName(
            v.join(F.broadcast(bpairs.filter(F.col("b1") < F.col("b2"))),
                   v["blk"] == F.col("b2"))
            .select("b1", "b2", "vid", "vec", F.lit(1).alias("side"))
        )
    )

    out_schema = T.StructType([
        T.StructField("id1", T.LongType()),
        T.StructField("id2", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])
    empty = pd.DataFrame({"id1": pd.Series(dtype="int64"),
                          "id2": pd.Series(dtype="int64"),
                          "cos": pd.Series(dtype="float64")})

    def _unit(pdf: "pd.DataFrame"):
        ids = pdf["vid"].to_numpy(dtype="int64")
        mat = np.array(list(pdf["vec"]), dtype="float64")
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        return ids, mat / norms[:, None]

    def score_pair(key, pdf):
        b1k, b2k = key
        a = pdf[pdf["side"] == 0]
        if not len(a):
            return empty
        ids_a, an = _unit(a)
        if b1k == b2k:
            scores = np.round(an @ an.T, COS_DECIMALS)
            r, c = np.nonzero((scores >= threshold)
                              & (ids_a[:, None] < ids_a[None, :]))
            if not len(r):
                return empty
            return pd.DataFrame({"id1": ids_a[r], "id2": ids_a[c],
                                 "cos": scores[r, c]})
        b = pdf[pdf["side"] == 1]
        if not len(b):
            return empty
        ids_b, bn = _unit(b)
        scores = np.round(an @ bn.T, COS_DECIMALS)
        r, c = np.nonzero(scores >= threshold)
        if not len(r):
            return empty
        # cross-block: id order is arbitrary — normalize to id1 < id2
        return pd.DataFrame({"id1": np.minimum(ids_a[r], ids_b[c]),
                             "id2": np.maximum(ids_a[r], ids_b[c]),
                             "cos": scores[r, c]})

    return tagged.groupBy("b1", "b2").applyInPandas(score_pair, schema=out_schema)


def _train_centroids(emb: DataFrame, n_centroids: int, iters: int,
                     id_col: str, vec_col: str):
    """Deterministic k-means coarse quantizer shared by the IVF and
    SemDeDup paths: init = first ``n_centroids`` vectors by id, fixed
    ``iters`` Lloyd steps on a bounded driver-side sample (no RNG, so
    centroids are reproducible across runs and — at ``iters=0`` — across
    engines, which is what lets the SQL oracles re-derive assignment)."""
    import numpy as np  # noqa: F401 (numpy arrays flow out)

    _ids, mat, _norms = _collect_matrix(
        emb.orderBy(id_col).limit(max(n_centroids * 64, 1024)), id_col, vec_col)
    cent = mat[:n_centroids].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(n_centroids):
            members = mat[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
    return cent


def semantic_dedup(emb: DataFrame, threshold: float,
                   n_centroids: int = 16, iters: int = 0,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with a cheap coarse quantizer, then mark as
    semantic duplicates the vectors that have a near-identical
    (rounded cos ≥ ``threshold``) LOWER-ID neighbor **within their own
    cluster** — the keep-lowest-id rule from the paper, made
    deterministic. Returns (id, cell, is_dup).

    Unlike exact all-pairs (:func:`near_dup_pairs_blocked`, O(N²/B)),
    the pairwise work here is confined to cells — O(Σ|cell|²), i.e.
    O(N²/C) for C balanced cells — and recall is traded at cell
    boundaries exactly as in the paper.

    100 TB shape: centroids are tiny and ride the task closure; the
    corpus shuffles ONCE by cell id and each cell's cosine matrix is a
    numpy matmul inside ``applyInPandas``. Cell count scales with
    corpus size so per-group memory stays bounded (the same knob as
    ``n_blocks`` in the blocked all-pairs). ``iters=0`` pins the
    centroids to the first ``n_centroids`` vectors by id so the DuckDB
    oracle reproduces the assignment; the Lloyd-trained path keeps its
    behavior covered in tests/test_similarity.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent = _train_centroids(emb, n_centroids, iters, id_col, vec_col)

    assign_schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])

    def assign_cells(batches):
        for pdf in batches:
            bids = pdf[id_col].to_numpy(dtype="int64")
            bmat = np.array(list(pdf[vec_col]), dtype="float64")
            d2 = ((bmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            # same decision rule as ivf_topk: rounded Euclidean distance
            # (9dp) with argmin's first-index tie == oracle's (dist, ci)
            d = np.round(np.sqrt(d2), 9)
            yield pd.DataFrame({"vid": bids,
                                "cell": d.argmin(axis=1).astype("int32"),
                                "vec": list(bmat)})

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("is_dup", T.BooleanType()),
    ])

    def flag_cell(key, pdf):
        ids = pdf["vid"].to_numpy(dtype="int64")
        mat = np.array(list(pdf["vec"]), dtype="float64")
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        un = mat / norms[:, None]
        scores = np.round(un @ un.T, COS_DECIMALS)
        dup = ((scores >= threshold)
               & (ids[None, :] < ids[:, None])).any(axis=1)
        return pd.DataFrame({id_col: ids, "cell": key[0], "is_dup": dup})

    assigned = (fan_out(emb.select(id_col, as_double(F.col(vec_col))
                                   .alias(vec_col)))
                .mapInPandas(assign_cells, schema=assign_schema))
    return assigned.groupBy("cell").applyInPandas(flag_cell, schema=out_schema)


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int,
             n_centroids: int = 16, n_probe: int = 4, iters: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse quantizer.

    Train: deterministic k-means on the collected corpus sample
    (init = first ``n_centroids`` vectors by id, fixed ``iters`` Lloyd
    steps — no RNG, reproducible). Serve: assign corpus vectors to their
    nearest centroid (one numpy pass), probe each query's ``n_probe``
    nearest centroids, score only within probed cells, window-rank.

    100 TB shape: the centroid table is tiny and broadcast; the corpus
    shuffles ONCE by cell id (and would be written bucketed-by-cell for
    reuse); each query touches n_probe/n_centroids of the data. Recall
    tuned via (n_centroids, n_probe); tested against brute force."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent = _train_centroids(emb, n_centroids, iters, id_col, vec_col)

    cell_schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])

    def assign_cells(batches):
        for pdf in batches:
            bids = pdf[id_col].to_numpy(dtype="int64")
            bmat = np.array(list(pdf[vec_col]), dtype="float64")
            d2 = ((bmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            # rank by the rounded EUCLIDEAN distance (sqrt, 9dp), the
            # same quantity the SQL oracle ranks by — cross-engine ULP
            # noise collapses onto the grid, and argmin's first-index
            # tie matches the oracle's centroid-id tiebreak
            d = np.round(np.sqrt(d2), 9)
            yield pd.DataFrame({"vid": bids,
                                "cell": d.argmin(axis=1).astype("int32"),
                                "vec": list(bmat)})

    probe_schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])

    def probe_cells(batches):
        for pdf in batches:
            bids = pdf[id_col].to_numpy(dtype="int64")
            bmat = np.array(list(pdf[vec_col]), dtype="float64")
            d2 = ((bmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            # rounded sqrt + STABLE sort: ties on the 9dp grid resolve
            # by centroid index, mirroring the oracle's (dist, ci) sort
            d = np.round(np.sqrt(d2), 9)
            nearest = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
            frames = []
            for p in range(n_probe):
                frames.append(pd.DataFrame({
                    "vid": bids, "cell": nearest[:, p].astype("int32"),
                    "vec": list(bmat)}))
            yield pd.concat(frames)

    c = (fan_out(emb.select(id_col, as_double(F.col(vec_col)).alias(vec_col)))
            .mapInPandas(assign_cells, schema=cell_schema)
            .withColumnsRenamed({"vid": "n_id", "vec": "n_vec"}))
    q = (queries.select(id_col, as_double(F.col(vec_col)).alias(vec_col))
                .mapInPandas(probe_cells, schema=probe_schema)
                .withColumnsRenamed({"vid": "q_id", "vec": "q_vec"}))

    cand = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )

    return _score_candidates(cand, k)


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes. Entry (p, d)
    is a closed form of its flat index i = p·dim + d — the leading 48
    bits of sha-256("plane:i") mapped to [-1, 1]:

        (int(sha256(f"plane:{i}")[:12], 16) % 2000001) / 1e6 − 1

    Closed-form-by-index (no sequential PRNG state) keeps generation
    order-free AND engine-independent: the DuckDB oracle of
    q45/q69 re-derives the identical planes in SQL via
    ``('0x' || substr(sha256('plane:' || i), 1, 12))::UBIGINT`` — the
    same sha-256-prefix device as operators.dedup.base_hash_col."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.sha256(f"plane:{p * dim + d}".encode())
                    .hexdigest()[:12], 16)
            row.append((h % 2000001) / 1000000.0 - 1.0)
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
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    planes = np.array(_hyperplanes(dim, n_tables * n_planes), dtype="float64")

    bucket_schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("tbl", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])
    weights = (1 << np.arange(n_planes)).astype("int64")

    def bucketize(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            # round the projection BEFORE the sign decision: the DuckDB
            # oracle sums the dot product in a different order, and a
            # projection within a few ULPs of 0 must not bucket
            # differently across engines (same float discipline as
            # COS_DECIMALS, applied at the decision point)
            bits = np.round(mat @ planes.T, 9) >= 0          # batch × (T·P)
            frames = []
            for ti in range(n_tables):
                b = bits[:, ti * n_planes:(ti + 1) * n_planes] @ weights
                frames.append(pd.DataFrame({
                    "vid": ids, "tbl": ti, "bucket": b,
                    "vec": list(mat)}))
            yield pd.concat(frames)

    c = (fan_out(emb.select(id_col, as_double(F.col(vec_col)).alias(vec_col)))
            .mapInPandas(bucketize, schema=bucket_schema)
            .withColumnsRenamed({"vid": "n_id", "vec": "n_vec"}))
    q = (queries.select(id_col, as_double(F.col(vec_col)).alias(vec_col))
                .mapInPandas(bucketize, schema=bucket_schema)
                .withColumnsRenamed({"vid": "q_id", "vec": "q_vec"}))

    cand = (
        c.join(F.broadcast(q), on=["tbl", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )

    return _score_candidates(cand, k)


def hard_negative_topk(emb: DataFrame, queries: DataFrame, k: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Hard-negative mining (contrastive-training data prep, e.g. DPR /
    Contriever recipes): per query, the exact top-k most cosine-similar
    corpus vectors whose ``label_col`` DIFFERS from the query's — the
    confusable negatives that make contrastive batches informative.

    Same 100 TB shape as :func:`brute_force_topk` — the small query
    batch rides the task closure (ids + matrix + labels), each corpus
    Arrow batch is one BLAS matmul, and a per-batch label mask + top-k
    prune bounds task output at k·Q rows; a final window rank merges
    batch winners. The label filter happens INSIDE the batch, before
    pruning, so negatives beyond rank k of the unfiltered ranking are
    still found (a post-filter of plain top-k would lose them).

    ``label_col`` may be any equality-comparable type (int, string,
    …) — labels ride the closure uncast and the mask is a generic
    elementwise ``!=``."""
    import numpy as np

    # one collect keeps ids / vectors / labels row-aligned
    q_rows = queries.select(id_col, vec_col, label_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    q_mat = np.array([r[1] for r in q_rows], dtype="float64")
    q_labels = np.array([r[2] for r in q_rows])  # any ==-comparable type
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
    q_norms[q_norms == 0] = 1.0
    qn = (q_mat / q_norms[:, None]).T
    return _blockwise_topk(emb, k, id_col, vec_col, q_ids, qn,
                           label_col=label_col, q_labels=q_labels)


def pq_encode(emb: DataFrame, n_centroids: int = 8, m_subspaces: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Product quantization encode (Jégou et al. 2011, 'Product
    Quantization for Nearest Neighbor Search'): split each vector into
    ``m_subspaces`` contiguous sub-vectors and snap each to the nearest
    of ``n_centroids`` codebook entries — emitting the per-subspace
    codes plus the total reconstruction error. The memory-compression
    step under IVF-PQ indexes (q54's IVF is the coarse half; this is
    the fine half).

    The codebook is DETERMINISTIC, the q54/q75 iters=0 device: the
    sub-vectors of the first ``n_centroids`` corpus vectors (by id), so
    the SQL oracle re-derives it exactly. Sub-distances quantize to
    integer micro-units before the argmin, with the centroid index as
    tiebreak, so code assignment is total-ordered on both engines.

    Scale shape: the codebook (k·m sub-vectors) rides the task closure;
    encoding is ONE corpus pass — one numpy broadcast-subtract matmul
    batch per Arrow batch, zero shuffles, output one row per vector.
    Exactly the shape a 100 TB PQ index build wants (codebook training
    would sample; assignment is embarrassingly parallel)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # the shared q54/q75 codebook device: first K vectors by id,
    # iters=0 → no Lloyd steps, so the SQL oracle re-derives it
    cent = _train_centroids(emb, n_centroids, 0, id_col, vec_col)
    k, dim = cent.shape
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by {m_subspaces}")
    sub = dim // m_subspaces

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(f"code_{m}", T.LongType())
           for m in range(m_subspaces)]
        + [T.StructField("err_micro", T.LongType()),
           T.StructField("err", T.DoubleType())])

    def enc(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            total_u = np.zeros(len(ids), dtype="int64")
            out = {id_col: ids}
            for m in range(m_subspaces):
                a = mat[:, m * sub:(m + 1) * sub]
                c = cent[:, m * sub:(m + 1) * sub]
                d2 = ((a[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                # half-up to match DuckDB round() — np.round's
                # half-to-even could flip a code on an exact .5 micro
                d2u = np.floor(d2 * 1e6 + 0.5).astype("int64")
                code = np.argmin(d2u, axis=1)  # ties → lowest index
                out[f"code_{m}"] = code.astype("int64")
                total_u += d2u[np.arange(len(ids)), code]
            out["err_micro"] = total_u
            out["err"] = total_u / 1e6
            yield pd.DataFrame(out)

    return fan_out(emb.select(id_col, vec_col)).mapInPandas(
        enc, schema=out_schema)


def pq_adc_topk(emb: DataFrame, n_queries: int = 4, k: int = 3,
                n_centroids: int = 8, m_subspaces: int = 4,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search (Jégou et al. 2011
    §IV) — the QUERY half of the IVF-PQ stack (q54 coarse quantizer,
    q134 fine codes, this the scan): the query stays un-quantized; per
    (query, subspace, centroid) a lookup table of exact sub-distances
    is built once, and each corpus vector's distance estimate is the
    sum of M table entries selected by its stored codes — the corpus
    pass reads CODES (M small ints per vector), never the embeddings.

    Deterministic contract, fully SQL-re-derivable: queries = the
    first ``n_queries`` corpus vectors by id, codebook = the shared
    iters=0 device, LUT entries quantized to integer micro-units
    (half-up, matching DuckDB ``round``), ADC = exact BIGINT sum of M
    micro-unit entries, rank ties on vec_id, self-matches excluded.

    Scale shape: the LUT (Q·M·K longs) broadcasts; the corpus side is
    one ``stack`` projection of the codes table, a broadcast join, and
    a (qid)-partitioned top-k window over Q bounded groups — no
    embedding column is shuffled or even read past encoding. Returns
    (qid, vec_id, adc_micro, rank ≤ k)."""
    import numpy as np

    spark = emb.sparkSession
    cent = _train_centroids(emb, n_centroids, 0, id_col, vec_col)
    q_rows = (emb.select(id_col, vec_col)
              .filter(F.col(id_col) < n_queries).collect())
    dim = cent.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by {m_subspaces}")
    sub = dim // m_subspaces
    lut_rows = []
    for r in q_rows:
        qv = np.asarray(r[1], dtype="float64")
        for m in range(m_subspaces):
            a = qv[m * sub:(m + 1) * sub]
            c = cent[:, m * sub:(m + 1) * sub]
            d2 = ((c - a[None, :]) ** 2).sum(axis=1)
            d2u = np.floor(d2 * 1e6 + 0.5).astype("int64")
            lut_rows += [(int(r[0]), m, ci, int(d2u[ci]))
                         for ci in range(len(d2u))]
    lut = local_df(
        spark, lut_rows, "qid long, m int, c long, lutu long")

    codes = pq_encode(emb, n_centroids, m_subspaces, id_col, vec_col)
    stack_expr = "stack({}, {}) AS (m, c)".format(
        m_subspaces,
        ", ".join(f"{m}, code_{m}" for m in range(m_subspaces)))
    melted = codes.select(F.col(id_col),
                          F.expr(stack_expr)) \
        .withColumn("m", F.col("m").cast("int"))
    adc = (melted.join(F.broadcast(lut), ["m", "c"])
           .groupBy("qid", id_col)
           .agg(F.sum("lutu").cast("bigint").alias("adc_micro"))
           .filter(F.col(id_col) != F.col("qid")))
    w = Window.partitionBy("qid").orderBy("adc_micro", id_col)
    return (adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", id_col, "adc_micro",
                    F.col("rank").cast("bigint").alias("rank")))
