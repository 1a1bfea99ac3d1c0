"""Contracts for the exact-integer distributed k-means
(operators/clustering.py): partitioning invariance, empty-cluster keep
rule, tiebreak determinism, and the q167/q168 consumer invariants.

The SQL-oracle parity of the full fit is covered by the q167/q168
registry oracles (unrolled-CTE Lloyd rounds); these tests pin the
operator-level semantics the oracle construction RELIES on."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.clustering import (
    MICRO_SCALE,
    kmeans_fit,
    quantize_micros,
)
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_quantize_micros_half_up():
    q = quantize_micros([[0.0000005, -0.25, 1.0]])
    # floor(x*1e6 + 0.5): 0.0000005 → floor(1.0) = 1 (half-up),
    # -0.25 → -250000, 1.0 → 1000000
    assert q.tolist() == [[1, -250000, MICRO_SCALE]]
    assert q.dtype == np.int64


def test_fit_is_partitioning_invariant(spark):
    """Integer arithmetic makes the fit bit-reproducible under any
    partitioning — the property float k-means lacks."""
    emb = _emb(spark)
    c1, a1 = kmeans_fit(emb, k=4, iters=1)
    c2, a2 = kmeans_fit(emb.repartition(13, "vec_id"), k=4, iters=1)
    assert np.array_equal(c1, c2)
    r1 = sorted(map(tuple, a1.collect()))
    r2 = sorted(map(tuple, a2.collect()))
    assert r1 == r2


def test_iters_zero_assigns_under_seeds(spark):
    """iters=0 must skip the Lloyd loop and assign under the seed
    centroids; each seed vector's own d2 is 0."""
    emb = _emb(spark)
    cent, assign = kmeans_fit(emb, k=3, iters=0)
    seeds = [r.vec_id for r in
             emb.select("vec_id").orderBy("vec_id").limit(3).collect()]
    got = {r.vec_id: (r.cluster, r.d2) for r in
           assign.filter(F.col("vec_id").isin(seeds)).collect()}
    for ci, vid in enumerate(sorted(seeds)):
        assert got[vid] == (ci, 0)


def test_empty_cluster_keeps_previous_centroid(spark):
    """A cluster that captures no points in a round must keep its
    previous coordinates (the oracle's COALESCE arm). Construct one:
    two far-apart seed duplicates → the duplicate seed's cell is empty
    after round 1 yet its centroid must survive unchanged."""
    pdf = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]),
           (3, [1.0, 1.0]), (4, [0.9, 0.9])]
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    cent, assign = kmeans_fit(emb, k=2, iters=2)
    # seed 1 duplicates seed 0; round 1 ties every point to cluster 0,
    # leaving cluster 1 empty — it must keep the seed coordinates
    # (0, 0). Round 2 then has c0 at the global mean while the KEPT c1
    # sits exactly on the origin points, which flip to it: the final
    # assignment splits — direct evidence the empty cell retained its
    # coordinates rather than zeroing or being dropped.
    assert cent[1].tolist() == [0, 0]
    rows = {r.vec_id: r.cluster for r in assign.collect()}
    assert {v: rows[v] for v in sorted(rows)} == {
        0: 1, 1: 1, 2: 0, 3: 0, 4: 0}


def test_tie_breaks_to_lowest_cluster(spark):
    """Equidistant points take the LOWEST cluster index — the numpy
    argmin convention the oracle mirrors with ORDER BY d2, cluster."""
    pdf = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    _cent, assign = kmeans_fit(emb, k=2, iters=0)
    got = {r.vec_id: r.cluster for r in assign.collect()}
    assert got[2] == 0  # exactly between seeds 0 (c0) and 1 (c1)


def test_validates_params(spark):
    with pytest.raises(ValueError):
        kmeans_fit(_emb(spark), k=0)
    with pytest.raises(ValueError):
        kmeans_fit(_emb(spark), iters=-1)


def test_balanced_sample_takes_min_of_cluster_size(spark):
    """q168 semantics: a cluster smaller than the per-cluster quota
    contributes all its members, never pads."""
    from sunat_rree_demo_spark.queries import REGISTRY

    df = REGISTRY["q168_cluster_balanced_sample"].fn(spark, SF_SMOKE)
    census = REGISTRY["q167_kmeans_census"].fn(spark, SF_SMOKE)
    quota = {r.cluster: min(r.n_points, 10) for r in census.collect()}
    got = (df.groupBy("cluster").count().collect())
    assert {r.cluster: r["count"] for r in got} == quota


def test_incremental_components_equals_full_recompute(spark):
    """incremental_components over (labels, new edges) must equal a
    from-scratch CC over the union edge set — merge, internal no-op,
    new-subgraph, and new-node-attachment cases, plus label stability
    for untouched components."""
    from sunat_rree_demo_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31), (31, 32)],
        "id1 long, id2 long")
    labels0 = connected_components(base)
    base_labels = {r.node: r.comp for r in labels0.collect()}
    assert base_labels[3] == 1 and base_labels[11] == 10

    new = spark.createDataFrame(
        [(3, 10),        # merges comp 1 with comp 10
         (30, 32),       # internal edge: no-op for comp 30
         (50, 51),       # brand-new component
         (52, 20)],      # new node attaching to comp 20
        "id1 long, id2 long")

    got = {r.node: r.comp
           for r in incremental_components(labels0, new).collect()}
    want = {r.node: r.comp
            for r in connected_components(
                base.unionByName(new)).collect()}
    assert got == want and want
    assert got[11] == 1          # merged component adopts the global min
    assert got[50] == 50 and got[51] == 50
    assert got[52] == 20
    # untouched component 30's labels did not churn
    assert all(got[n] == base_labels[n] for n in (30, 31, 32))


def test_incremental_components_batch_sequence(spark):
    """Three sequential edge batches applied incrementally converge to
    the same labeling as one full recompute — the ingest-loop shape
    (a chain built across batches, forcing repeated merges)."""
    from sunat_rree_demo_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    batches = [
        [(i, i + 1) for i in range(0, 20, 4)],          # 0-1,4-5,8-9,...
        [(i + 1, i + 2) for i in range(0, 20, 4)],      # extend chains
        [(i + 2, i + 4) for i in range(0, 16, 4)],      # weld into one
    ]
    all_edges = spark.createDataFrame(
        [e for b in batches for e in b], "id1 long, id2 long")
    labels = connected_components(
        spark.createDataFrame(batches[0], "id1 long, id2 long"))
    for b in batches[1:]:
        labels = incremental_components(
            labels, spark.createDataFrame(b, "id1 long, id2 long"))
    got = {r.node: r.comp for r in labels.collect()}
    want = {r.node: r.comp
            for r in connected_components(all_edges).collect()}
    assert got == want
    assert set(got.values()) == {0}  # the welds fuse every chain into one
