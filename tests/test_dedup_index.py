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


def test_compaction_keeps_latest_and_preserves_probes(spark, tmp_path,
                                                      split_docs):
    """Re-ingesting edited docs grows the index by one row per
    re-ingest; compaction must collapse to one latest-signature row per
    id, regenerate consistent band rows, and leave probe results
    unchanged."""
    from sunat_rree_demo_spark.operators.dedup import minhash_signatures
    from sunat_rree_demo_spark.operators.dedup_index import (
        absorb_batch,
        compact_minhash_index,
        incremental_near_dup_pairs,
        write_minhash_index,
    )

    corpus, batch, full = split_docs
    idx = str(tmp_path / "idx3")
    write_minhash_index(corpus, idx)

    # re-ingest a slice of the corpus with EDITED text in a later batch
    edited = (corpus.filter(F.col("doc_id") % 10 == 1)
              .withColumn("text", F.concat(F.col("text"),
                                           F.lit(" edited edited edited"))))
    absorb_batch(edited, idx, batch_id=7)

    n_edited = edited.count()
    sigs = spark.read.parquet(f"{idx}/sigs")
    assert sigs.count() == sigs.select("doc_id").distinct().count() + n_edited

    probe_before = {(r.id1, r.id2): r.jaccard_est
                    for r in incremental_near_dup_pairs(spark, batch,
                                                        idx).collect()}
    compact_minhash_index(spark, idx)

    sigs2 = spark.read.parquet(f"{idx}/sigs")
    assert sigs2.count() == sigs2.select("doc_id").distinct().count()
    # surviving signatures for the edited ids are the EDITED ones
    want = {r.doc_id: list(r.sig) for r in
            minhash_signatures(edited, "doc_id", "text").collect()}
    got = {r.doc_id: list(r.sig) for r in
           sigs2.join(edited.select("doc_id"), "doc_id", "left_semi")
           .collect()}
    assert got == want and want
    # bands regenerated consistently: probe results identical
    probe_after = {(r.id1, r.id2): r.jaccard_est
                   for r in incremental_near_dup_pairs(spark, batch,
                                                       idx).collect()}
    assert probe_after == probe_before and probe_before
