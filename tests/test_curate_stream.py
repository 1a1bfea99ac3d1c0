"""Streaming curation ≡ batch curation: drain the documents corpus
through the foreachBatch gate+index pipeline in two files, finalize,
and compare row-for-row against ``plans.curate.curate`` on the full
corpus with the same parameters. Also pins the committed-batch no-op
(idempotent replay) at the curation-store level."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_two_files(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("docs_curate_stream")
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "part1.parquet")
    pq.write_table(tbl.slice(half), d / "part2.parquet")
    return str(d)


def _probe(spark):
    """A tiny benchmark-suite stand-in built from real corpus text so
    the decontamination gate actually fires."""
    from sunat_rree_demo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    return docs.orderBy("doc_id").limit(2).select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_stream_curated_equals_batch_curated(spark, tmp_path,
                                             docs_two_files):
    from sunat_rree_demo_spark.plans.curate import curate
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.curate_stream import (
        finalize_curated,
        run_curate_stream,
    )
    from sunat_rree_demo_spark.streaming.dedup_stream import docs_file_stream

    probe = _probe(spark).localCheckpoint()
    store = str(tmp_path / "curate_store")
    run_curate_stream(spark, docs_file_stream(spark, docs_two_files),
                      store, probe=probe, min_quality=0.25,
                      near_dup_threshold=0.3)
    streamed = finalize_curated(spark, store)

    full = load_table(spark, SF_SMOKE, "documents")
    batch = curate(full, probe=probe, min_quality=0.25,
                   near_dup_threshold=0.3)

    got, want = _rows(streamed), _rows(batch)
    assert got == want and want
    # the probe gate really dropped its two source docs
    kept_ids = {r[0] for r in got}
    for pr in probe.collect():
        assert pr.doc_id not in kept_ids


def test_committed_batch_replay_is_noop(spark, tmp_path, docs_two_files):
    """Replaying an already-committed micro-batch (same content, same
    id — foreachBatch's crash-recovery contract) leaves every store
    table byte-identical."""
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.curate_stream import (
        process_curate_batch,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    store = str(tmp_path / "replay_store")
    process_curate_batch(spark, docs, 0, store)

    def snap():
        out = {}
        for sub in ("docs", "pairs", "index/sigs", "index/bands"):
            df = spark.read.parquet(f"{store}/{sub}")
            out[sub] = sorted(map(tuple, df.select(*sorted(df.columns))
                                  .collect()))
        return out

    before = snap()
    process_curate_batch(spark, docs, 0, store)  # replay
    assert snap() == before
    assert before["docs"] and before["index/bands"]


def test_finalize_ignores_torn_batches(spark, tmp_path):
    """A batch whose docs landed but whose pairs/index commit did not
    (crash mid-sequence) must be INVISIBLE to finalize_curated — its
    zero-edge docs would otherwise survive election as false uniques.
    The batch becomes visible once a replay completes it."""
    import pytest

    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.curate_stream import (
        finalize_curated,
        gate_docs,
        process_curate_batch,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    store = str(tmp_path / "torn_store")
    process_curate_batch(spark, docs.limit(30), 0, store)
    base = {r.doc_id for r in finalize_curated(spark, store).collect()}
    assert base

    # torn batch 1: docs written, pairs/index missing
    extra = docs.filter("doc_id >= 30").limit(10)
    (gate_docs(extra).write.mode("overwrite")
     .parquet(f"{store}/docs/batch_id=1"))
    after_torn = {r.doc_id
                  for r in finalize_curated(spark, store).collect()}
    assert after_torn == base, "torn batch leaked into the election"

    # replay completes batch 1 → its docs join the curated output
    process_curate_batch(spark, extra, 1, store)
    completed = {r.doc_id for r in finalize_curated(spark, store).collect()}
    assert completed > base

    # a store with zero committed batches fails loudly
    with pytest.raises(FileNotFoundError):
        finalize_curated(spark, str(tmp_path / "empty_store"))
