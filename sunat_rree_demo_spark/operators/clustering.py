"""Distributed Lloyd k-means over an embedding column, EXACT in int64
micro-units — the curation-scale clustering primitive behind
cluster-balanced sampling and SemDeDup-style partitioning (Abbas et
al. 2023 run k-means before within-cluster dedup; DoReMi-style mixture
work samples per cluster).

No reference counterpart (the reference is a pandas dashboard); this is
part of the mandated LLM-pipeline extension surface. The coarse
driver-sample quantizer in operators/similarity.py:_train_centroids
stays as the cheap IVF/SemDeDup seeder; THIS module is the real
distributed fit: the corpus never leaves the executors, only k×P
partial-sum rows per iteration do.

Why integer micro-units: float k-means is order-sensitive (both the
per-dimension sums inside a centroid update and the distance sums
across dimensions reassociate under Spark partitioning), so results
would vary run-to-run AND could never match a SQL oracle. Quantizing
every component once to ``floor(x·1e6 + 0.5)`` int64 makes every
distance, argmin, and centroid update exact integer arithmetic —
commutative, partitioning-invariant, and bit-reproducible by DuckDB.
Bounds: |x| ≤ ~1 → components ≤ ~1e6, squared diffs ≤ ~4e12, summed
over d=64 dims ≤ ~3e14, summed over any corpus slice ≪ 2^63.

Execution shape per Lloyd iteration (the classic treeAggregate):

1. ``mapInPandas``: each Arrow batch quantizes to an int64 matrix and
   computes assignments via the |x|² − 2x·c + |c|² decomposition (one
   integer matmul per batch, O(n·k) memory — never the O(n·k·d)
   broadcast cube), then emits ONE row per non-empty cluster:
   (cluster, n, per-dimension sums).
2. The ≤ k·P partial rows (k clusters × P partitions, independent of
   corpus size) collect to the driver and reduce in numpy; empty
   clusters keep their previous centroid.

The final assignment pass is the same batch math, emitting
(id, cluster, d2) — one narrow scan, no shuffle. Ties in the integer
distances break to the LOWEST cluster index (numpy argmin order ==
``ORDER BY d2, cluster`` in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

__all__ = ["MICRO_SCALE", "assign_under", "kmeans_fit", "quantize_micros"]

#: components quantize to floor(x * MICRO_SCALE + 0.5) — shared with the
#: SQL oracles, so keep it a power-of-ten literal both engines spell.
MICRO_SCALE = 1_000_000


def quantize_micros(vecs) -> np.ndarray:
    """float32 vectors → int64 micro-unit matrix, half-up like the
    oracle's ``floor(CAST(x AS DOUBLE) * 1e6 + 0.5)`` (float32→float64
    widening is exact, so both engines round the identical double)."""
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(mat * MICRO_SCALE + 0.5).astype(np.int64)


def _assign(xq: np.ndarray, cent: np.ndarray):
    """Integer argmin assignment: d2 = |x|² − 2x·c + |c|², all int64
    exact; numpy argmin takes the first (lowest-index) minimum."""
    cross = xq @ cent.T                      # (n, k) int64, exact
    d2 = ((xq * xq).sum(axis=1, keepdims=True)
          - 2 * cross + (cent * cent).sum(axis=1)[None, :])
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Fit k-means and return ``(centroids, assignment)``:
    ``centroids`` an int64 micro-unit ndarray of shape (k, d),
    ``assignment`` a DataFrame (id_col, cluster int, d2 bigint) of the
    FINAL assignment under those centroids.

    Init is deterministic: the k lowest-``id_col`` vectors, quantized.
    The iteration loop is documented-eager (one partials job per
    round); callers that need the result more than once per session
    should memoize the assignment (see queries/clustering.py).
    """
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    init = (emb.select(id_col, vec_col).orderBy(id_col).limit(k)
            .toPandas())
    if len(init) < k:
        raise ValueError(
            f"kmeans_fit: corpus has only {len(init)} vectors but k={k} "
            "seeds are required — pass k <= corpus size")
    cent = quantize_micros(init[vec_col])
    d = cent.shape[1]

    part_schema = T.StructType([
        T.StructField("cluster", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("sums", T.ArrayType(T.LongType())),
    ])

    for _ in range(iters):
        c = cent  # freeze this round's centroids into the task closure

        def partials(batches, _c=c):
            for pdf in batches:
                if not len(pdf):
                    continue
                xq = quantize_micros(pdf[vec_col])
                a, _d2 = _assign(xq, _c)
                rows = [(int(ci), int((a == ci).sum()),
                         xq[a == ci].sum(axis=0).tolist())
                        for ci in np.unique(a)]
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        # ≤ k rows per Arrow batch regardless of corpus size — the
        # driver-side reduce is over a bounded partial set, not data
        part = (emb.select(vec_col).mapInPandas(partials, part_schema)
                .collect())
        sums = np.zeros((k, d), np.int64)
        ns = np.zeros(k, np.int64)
        for r in part:
            sums[r["cluster"]] += np.asarray(r["sums"], np.int64)
            ns[r["cluster"]] += r["n"]
        new = cent.copy()                    # empty cluster → keep old
        nz = ns > 0
        # half-up integer mean: sums ≤ ~2^31·n so sums/n is exact in
        # float64; floor(+0.5) matches the SQL update expression
        new[nz] = np.floor(sums[nz] / ns[nz, None] + 0.5).astype(np.int64)
        cent = new

    return cent, assign_under(emb, cent, id_col=id_col, vec_col=vec_col)


def assign_under(emb: DataFrame, centroids: np.ndarray,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest FIXED centroid — the
    train-offline/serve-anywhere half of the fit: one narrow scan, no
    shuffle, the (k × d) int64 centroid matrix riding the task closure.
    Returns (id_col, cluster int, d2 bigint); stateless and
    deterministic, so the streaming twin
    (streaming/cluster_stream.py) replays byte-identically."""
    cfin = np.ascontiguousarray(centroids, dtype=np.int64)
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("d2", T.LongType()),
    ])

    def final(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            xq = quantize_micros(pdf[vec_col])
            a, d2 = _assign(xq, cfin)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(np.int64),
                                "cluster": a.astype(np.int32),
                                "d2": d2.astype(np.int64)})

    return emb.select(id_col, vec_col).mapInPandas(final, out_schema)
