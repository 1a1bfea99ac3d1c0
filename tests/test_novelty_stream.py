"""Streaming novelty = batch novelty when files arrive in id order:
drain the documents corpus through the micro-batch scorer in two
id-ordered files and compare the union of per-doc stats against the
batch ``rolling_novelty`` (q150's operator) on the full corpus.
Replays must not change any committed partition."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_two_files(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("docs_novelty_stream")
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "part1.parquet")
    pq.write_table(tbl.slice(half), d / "part2.parquet")
    return str(d)


def test_streamed_novelty_equals_batch_in_id_order(spark, tmp_path,
                                                   docs_two_files):
    from sunat_rree_demo_spark.operators.dedup import rolling_novelty
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.dedup_stream import docs_file_stream
    from sunat_rree_demo_spark.streaming.novelty_stream import (
        load_novelty_stats,
        run_novelty_stream,
    )

    store = str(tmp_path / "novelty_store")
    run_novelty_stream(spark, docs_file_stream(spark, docs_two_files),
                       store)
    got = {r.doc_id: (r.n_windows, r.n_novel, r.novelty_frac)
           for r in load_novelty_stats(spark, store).collect()}

    full = load_table(spark, SF_SMOKE, "documents")
    want = {r.doc_id: (r.n_windows, r.n_novel, r.novelty_frac)
            for r in rolling_novelty(full, "doc_id", "text", 8).collect()}
    assert got == want and want
    # both batches contributed and at least one later doc lost novelty
    # to an earlier one (the corpus has near-dups)
    assert any(v[1] < v[0] for v in got.values())


def test_novelty_replay_and_torn_batch(spark, tmp_path):
    """Committed-batch replay is a no-op; a torn batch (keys marker
    missing) is invisible to probes and heals on replay."""
    import os

    from sunat_rree_demo_spark.streaming.novelty_stream import (
        load_novelty_stats,
        process_novelty_batch,
        seen_keys,
    )

    store = str(tmp_path / "nv_store")
    d0 = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(16)))],
        "doc_id long, text string")
    process_novelty_batch(spark, d0, 0, store)
    k0 = seen_keys(spark, store).count()
    assert k0 == 9  # 16 tokens -> 9 distinct windows

    process_novelty_batch(spark, d0, 0, store)  # replay: no-op
    assert seen_keys(spark, store).count() == k0

    # batch 1: a verbatim copy -> zero novelty
    d1 = d0.withColumn("doc_id", d0.doc_id + 1)
    process_novelty_batch(spark, d1, 1, store)
    stats = {r.doc_id: r.n_novel
             for r in load_novelty_stats(spark, store).collect()}
    assert stats == {1: 9, 2: 0}

    # tear batch 1's marker: its keys and stats vanish from reads
    os.remove(f"{store}/keys/batch_id=1/_SUCCESS")
    assert seen_keys(spark, store).count() == k0
    assert {r.doc_id for r in load_novelty_stats(spark, store).collect()} \
        == {1}
    # replay heals it (recomputed against the same committed state)
    process_novelty_batch(spark, d1, 1, store)
    stats2 = {r.doc_id: r.n_novel
              for r in load_novelty_stats(spark, store).collect()}
    assert stats2 == {1: 9, 2: 0}
