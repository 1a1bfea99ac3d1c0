"""Incremental MinHash index: the batch-incremental result must equal
the batch-global pipeline restricted to pairs touching the new batch —
same signatures, same estimates, bit for bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_docs(spark):
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    return (d.filter(F.col("doc_id") % 5 != 0),   # corpus (indexed)
            d.filter(F.col("doc_id") % 5 == 0),   # new ingest batch
            d)


def test_incremental_matches_global_restricted(spark, tmp_path, split_docs):
    from sunat_rree_demo_spark.operators.dedup import minhash_lsh_pairs
    from sunat_rree_demo_spark.operators.dedup_index import (
        incremental_near_dup_pairs,
        write_minhash_index,
    )

    corpus, batch, full = split_docs
    idx = str(tmp_path / "idx")
    write_minhash_index(corpus, idx)

    got = {(r.id1, r.id2): r.jaccard_est
           for r in incremental_near_dup_pairs(spark, batch, idx).collect()}

    new_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = {(r.id1, r.id2): r.jaccard_est
            for r in minhash_lsh_pairs(full, "doc_id", "text").collect()
            if r.id1 in new_ids or r.id2 in new_ids}
    assert got == want and want, "expected non-empty overlap at sf0.001"


def test_append_extends_index(spark, tmp_path, split_docs):
    from sunat_rree_demo_spark.operators.dedup_index import (
        append_minhash_index,
        incremental_near_dup_pairs,
        write_minhash_index,
    )

    corpus, batch, full = split_docs
    idx = str(tmp_path / "idx2")
    write_minhash_index(corpus, idx)
    append_minhash_index(batch, idx)

    # after absorbing the batch, re-probing the same batch must surface
    # the same cross pairs (now via the index side) — append worked
    n_sigs = spark.read.parquet(f"{idx}/sigs").count()
    assert n_sigs == full.count() - _short_doc_count(spark, full)
    again = incremental_near_dup_pairs(spark, batch, idx)
    assert again.filter("id1 = id2").count() == 0


def _short_doc_count(spark, docs, n=5):
    """Docs shorter than n tokens have no signature (operator contract)."""
    return docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) < n).count()
