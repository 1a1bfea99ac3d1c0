"""Persisted IVF index: index-served search equals the session-fit
q172 path row-for-row (same deterministic fit), and the probe scan
prunes non-probed cell directories at the file level."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ivf_path(spark, tmp_path_factory):
    from sunat_rree_demo_spark.operators.ann_index import write_ivf_index
    from sunat_rree_demo_spark.queries.clustering import _ITERS, _K
    from sunat_rree_demo_spark.sources.catalog import load_table

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    write_ivf_index(load_table(spark, SF_SMOKE, "embeddings"), path,
                    k=_K, iters=_ITERS)
    return path


def test_index_search_equals_session_fit_query(spark, ivf_path):
    from sunat_rree_demo_spark.operators.ann_index import ivf_index_search
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.queries.clustering import (
        _NEIGHBORS,
        _NPROBE,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qpd = (emb.filter("vec_id < 8")
           .selectExpr("vec_id as q_id", "embedding")
           .orderBy("q_id").toPandas())
    got = [tuple(r) for r in
           ivf_index_search(spark, ivf_path, qpd, topk=_NEIGHBORS,
                            nprobe=_NPROBE).collect()]
    want = [tuple(r) for r in
            REGISTRY["q172_ivf_kmeans_topk"].fn(spark, SF_SMOKE).collect()]
    assert got == want and got


def test_probe_scan_prunes_cell_directories(spark, ivf_path):
    """The filtered vectors scan must carry PartitionFilters on the
    cell column and list only the probed directories."""
    from pyspark.sql import functions as F

    from tests.test_plan_contracts import plan_of

    vecs = (spark.read.parquet(f"{ivf_path}/vectors")
            .filter(F.col("cluster").isin([0, 3])))
    plan = plan_of(vecs)
    assert "PartitionFilters" in plan and "cluster" in plan
    # pruning is real at EXECUTION: every file actually read lies in a
    # probed cell directory (input_file_name reflects the pruned scan;
    # DataFrame.inputFiles() is not filter-aware and would list all)
    read = {r[0] for r in
            vecs.select(F.input_file_name()).distinct().collect()}
    assert read
    assert all("cluster=0" in f or "cluster=3" in f for f in read)
    full = {r[0] for r in
            spark.read.parquet(f"{ivf_path}/vectors")
            .select(F.input_file_name()).distinct().collect()}
    assert len(read) < len(full)


def test_index_build_is_reproducible(spark, ivf_path, tmp_path):
    """Same corpus, same parameters -> byte-identical centroids and
    identical cell membership (the int64 Lloyd guarantee on disk)."""
    from sunat_rree_demo_spark.operators.ann_index import (
        load_centroids,
        write_ivf_index,
    )
    from sunat_rree_demo_spark.queries.clustering import _ITERS, _K
    from sunat_rree_demo_spark.sources.catalog import load_table

    again = str(tmp_path / "index2")
    write_ivf_index(load_table(spark, SF_SMOKE, "embeddings"), again,
                    k=_K, iters=_ITERS)
    import numpy as np

    assert np.array_equal(load_centroids(spark, ivf_path),
                          load_centroids(spark, again))
    a = {(r.vec_id, r.cluster) for r in
         spark.read.parquet(f"{ivf_path}/vectors")
         .select("vec_id", "cluster").collect()}
    b = {(r.vec_id, r.cluster) for r in
         spark.read.parquet(f"{again}/vectors")
         .select("vec_id", "cluster").collect()}
    assert a == b
