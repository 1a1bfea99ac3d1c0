"""Deletion propagation across the persisted indexes: forgotten ids
vanish from probes/searches, only touched partitions rewrite, and the
rest of the store stays byte-identical."""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_SMOKE


def _tree_state(root):
    """{relpath: (size, mtime_ns)} for every data file under root."""
    out = {}
    for p in glob.glob(f"{root}/**", recursive=True):
        if os.path.isfile(p):
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_dedup_index_forget(spark, tmp_path):
    from sunat_rree_demo_spark.operators.dedup_index import (
        forget_ids,
        incremental_near_dup_pairs,
        write_minhash_index,
        absorb_batch,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "idx")
    write_minhash_index(d.filter("doc_id % 3 != 2"), path)       # batch -1
    absorb_batch(d.filter("doc_id % 3 = 2"), path, 0)            # batch 0

    # pick a doc that actually pairs with something (so the probe
    # result visibly changes), from the batch-0 slice
    probe_docs = d.limit(60)
    before_pairs = {
        (r.id1, r.id2) for r in incremental_near_dup_pairs(
            spark, probe_docs, path, threshold=0.1).collect()}
    assert before_pairs, "fixture must produce candidate pairs"
    victim = sorted({i for p in before_pairs for i in p})[0]

    pre = _tree_state(path)
    touched = forget_ids(spark, path, [victim])
    post = _tree_state(path)

    # only the touched batches' sig/band partitions changed
    changed = {p for p in pre
               if pre.get(p) != post.get(p)} | (set(post) - set(pre))
    for p in changed:
        assert any(f"batch_id={b}" in p or "_stream" in p
                   for b in touched), p
    untouched_dirs = [p for p in pre
                      if not any(f"batch_id={b}" in p for b in touched)]
    for p in untouched_dirs:
        assert pre[p] == post[p], p

    # the forgotten id is gone from the index side of every probe
    after_pairs = {
        (r.id1, r.id2) for r in incremental_near_dup_pairs(
            spark, probe_docs.filter(f"doc_id != {victim}"), path,
            threshold=0.1).collect()}
    assert all(victim not in p for p in after_pairs)
    # and from the stored tables themselves
    sigs = spark.read.parquet(f"{path}/sigs")
    bands = spark.read.parquet(f"{path}/bands")
    assert sigs.filter(f"doc_id = {victim}").count() == 0
    assert bands.filter(f"doc_id = {victim}").count() == 0


def test_ann_index_forget(spark, tmp_path):
    import pandas as pd

    from sunat_rree_demo_spark.operators.ann_index import (
        absorb_ivf_batch,
        forget_vectors,
        ivf_index_search,
        write_ivf_index,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb.filter("vec_id % 4 != 3"), path, k=4, iters=1)
    absorb_ivf_batch(spark, emb.filter("vec_id % 4 = 3"), path, 0)

    qpd = (emb.filter("vec_id < 4")
           .selectExpr("vec_id as q_id", "embedding")
           .orderBy("q_id").toPandas())
    before = ivf_index_search(spark, path, qpd, topk=5, nprobe=2).collect()
    victims = sorted({r.n_id for r in before})[:2]

    pre = _tree_state(path)
    touched = forget_vectors(spark, path, victims)
    post = _tree_state(path)
    assert touched
    changed = {p for p in pre
               if pre.get(p) != post.get(p)} | (set(post) - set(pre))
    for p in changed:
        # touched cells rewrite; touched BATCHES' commit markers are
        # cleared+restored around the rewrite (torn-read protocol)
        assert any(f"batch_id={b}/cluster={c}" in p
                   for b, c in touched) \
            or (p.endswith("_SUCCESS")
                and any(f"batch_id={b}/" in p for b, _ in touched)), p

    after = ivf_index_search(spark, path, qpd, topk=5, nprobe=2).collect()
    assert all(r.n_id not in victims for r in after)
    vecs = spark.read.parquet(f"{path}/vectors")
    assert vecs.filter(vecs.vec_id.isin(victims)).count() == 0


def test_forget_edge_cases(spark, tmp_path):
    """Empty stores and never-present ids: no touched partitions, no
    errors, byte-identical trees."""
    from sunat_rree_demo_spark.operators.ann_index import (
        forget_vectors,
        write_ivf_index,
    )
    from sunat_rree_demo_spark.operators.dedup_index import (
        forget_ids,
        write_minhash_index,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    # vector index without any committed dirs
    assert forget_vectors(spark, str(tmp_path / "nothing"), [1, 2]) == []

    d = load_table(spark, SF_SMOKE, "documents").limit(30)
    dpath = str(tmp_path / "didx")
    write_minhash_index(d, dpath)
    pre = _tree_state(dpath)
    assert forget_ids(spark, dpath, [99_999_999]) == []
    assert _tree_state(dpath) == pre      # absent id: nothing rewritten

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(40)
    vpath = str(tmp_path / "vidx")
    write_ivf_index(emb, vpath, k=2, iters=1)
    pre = _tree_state(vpath)
    assert forget_vectors(spark, vpath, [99_999_999]) == []
    assert _tree_state(vpath) == pre
