"""Similarity-search operator tests: LSH-ANN correctness (scores exact,
ranks consistent) and recall vs the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _tables(spark):
    from sunat_rree_demo_spark.sources.catalog import load_table
    return load_table(spark, SF_SMOKE, "embeddings")


def test_lsh_scores_are_exact_cosines(spark):
    """Every (q, n, cos) the ANN path returns must carry the exact
    cosine — LSH prunes candidates, never perturbs scores. (numpy vs
    JVM-fold summation may differ in the last ulp; both round to 6dp.)"""
    from sunat_rree_demo_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    e = _tables(spark)
    q = e.filter(F.col("vec_id") < 8)
    exact = {(r.q_id, r.n_id): r.cos
             for r in brute_force_topk(e, q, k=500).collect()}
    for r in lsh_bucketed_topk(e, q, k=5).collect():
        assert abs(exact[(r.q_id, r.n_id)] - r.cos) <= 1e-6


def test_numpy_topk_equals_fold_topk(spark):
    """The Arrow/numpy block-product top-k must select the same
    neighbors as the interpreted fold twin."""
    from sunat_rree_demo_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_fold,
    )

    e = _tables(spark)
    q = e.filter(F.col("vec_id") < 8)
    a = {(r.q_id, r.rank): r.n_id for r in brute_force_topk(e, q, k=5).collect()}
    b = {(r.q_id, r.rank): r.n_id
         for r in brute_force_topk_fold(e, q, k=5).collect()}
    assert a == b


def test_lsh_recall_nonzero(spark):
    """Bucketed ANN with 8 hyperplanes on 500 vectors: buckets are tiny,
    but same-bucket vectors are cosine-biased — mean recall@5 must beat
    the random-candidate baseline (~bucket_share ≈ 1/256)."""
    from sunat_rree_demo_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    e = _tables(spark)
    q = e.filter(F.col("vec_id") < 20)
    truth: dict[int, set[int]] = {}
    for r in brute_force_topk(e, q, k=5).collect():
        truth.setdefault(r.q_id, set()).add(r.n_id)
    approx: dict[int, set[int]] = {}
    for r in lsh_bucketed_topk(e, q, k=5).collect():
        approx.setdefault(r.q_id, set()).add(r.n_id)
    recalls = [len(truth[qid] & approx.get(qid, set())) / len(truth[qid])
               for qid in truth]
    assert sum(recalls) / len(recalls) > 0.05


def test_ivf_recall_beats_lsh_floor(spark):
    """IVF with 16 cells / 4 probes scans ~25% of the corpus — mean
    recall@5 must clear a floor well above random candidate share."""
    from sunat_rree_demo_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = _tables(spark)
    q = e.filter(F.col("vec_id") < 20)
    truth: dict[int, set[int]] = {}
    for r in brute_force_topk(e, q, k=5).collect():
        truth.setdefault(r.q_id, set()).add(r.n_id)
    approx: dict[int, set[int]] = {}
    for r in ivf_topk(e, q, k=5).collect():
        approx.setdefault(r.q_id, set()).add(r.n_id)
    recalls = [len(truth[qid] & approx.get(qid, set())) / len(truth[qid])
               for qid in truth]
    assert sum(recalls) / len(recalls) > 0.25


def test_brute_force_topk_is_symmetric_sane(spark):
    from sunat_rree_demo_spark.operators.similarity import brute_force_topk

    e = _tables(spark)
    out = brute_force_topk(e, e.filter(F.col("vec_id") == 0), k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] and all(-1.0 <= r.cos <= 1.0 for r in out)
    ordered = sorted(out, key=lambda r: r.rank)
    assert all(ordered[i].cos >= ordered[i + 1].cos for i in range(len(ordered) - 1))


def test_blocked_near_dup_equals_closure_variant(spark):
    """The both-sides-blocked near-dup (no driver collect) must emit
    exactly the same (id1, id2, cos) set as the closure-matrix fast
    path, for an n_blocks that forces within-block AND cross-block
    groups."""
    from sunat_rree_demo_spark.operators.similarity import (
        near_dup_pairs,
        near_dup_pairs_blocked,
    )

    e = _tables(spark)
    closure = {(r.id1, r.id2): r.cos
               for r in near_dup_pairs(e, threshold=0.3).collect()}
    for n_blocks in (1, 5):
        blocked = {(r.id1, r.id2): r.cos
                   for r in near_dup_pairs_blocked(
                       e, threshold=0.3, n_blocks=n_blocks).collect()}
        assert blocked == closure


def test_adc_is_exact_on_centroid_aligned_corpus(spark):
    """When every corpus vector IS a codebook entry (zero
    reconstruction error), the ADC estimate equals the exact squared
    distance — the Jégou et al. identity the micro-unit LUT must
    preserve. Corpus: 8 distinct 64-dim one-hot-ish vectors (ids 0-7
    double as the codebook), 2 queries."""
    import numpy as np

    from sunat_rree_demo_spark.operators.similarity import pq_adc_topk

    dim, n = 64, 8
    vecs = []
    for i in range(n):
        v = np.zeros(dim)
        v[i] = 2.0 + i          # distinct per subspace 0 (dims 0-15)
        v[16 + i] = 1.0         # and subspace 1, so codes are unique
        vecs.append(v)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")

    got = pq_adc_topk(emb, n_queries=2, k=3, n_centroids=8,
                      m_subspaces=4).collect()
    assert {r.qid for r in got} == {0, 1}
    for r in got:
        true_d2 = float(((vecs[r.qid] - vecs[r.vec_id]) ** 2).sum())
        assert r.adc_micro == round(true_d2 * 1e6), (r, true_d2)
    # ranks are 1..3, distance-then-id ordered, self excluded
    for q in (0, 1):
        rows = sorted((r for r in got if r.qid == q), key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert all(r.vec_id != q for r in rows)
        ds = [(r.adc_micro, r.vec_id) for r in rows]
        assert ds == sorted(ds)
