"""Streaming dedup = batch-global dedup: drain the documents corpus
through the micro-batch index pipeline in two files and compare the
union of emitted pairs against ``minhash_lsh_pairs`` on the full
corpus — same pairs, same estimates, each emitted exactly once."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_two_files(spark, tmp_path_factory):
    """The documents table split across two parquet files (two
    micro-batches under maxFilesPerTrigger=1)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("docs_stream")
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "part1.parquet")
    pq.write_table(tbl.slice(half), d / "part2.parquet")
    return str(d)


def test_stream_emits_batch_global_pairs_exactly_once(
        spark, tmp_path, docs_two_files):
    from sunat_rree_demo_spark.operators.dedup import minhash_lsh_pairs
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.dedup_stream import (
        docs_file_stream,
        run_dedup_stream,
    )

    idx = str(tmp_path / "idx")
    pairs_out = str(tmp_path / "pairs")
    run_dedup_stream(spark, docs_file_stream(spark, docs_two_files),
                     idx, pairs_out)

    emitted = spark.read.parquet(pairs_out).collect()
    got = {(r.id1, r.id2): r.jaccard_est for r in emitted}
    assert len(emitted) == len(got), "a pair was emitted twice"

    full = load_table(spark, SF_SMOKE, "documents")
    want = {(r.id1, r.id2): r.jaccard_est
            for r in minhash_lsh_pairs(full, "doc_id", "text").collect()}
    assert got == want and want

    # both batches ran through foreachBatch (ids 0 and 1)
    batch_ids = {r._batch_id for r in emitted}
    assert batch_ids <= {0, 1} and len(batch_ids) >= 1
