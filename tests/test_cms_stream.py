"""Streaming CMS = batch CMS: drain the documents corpus through the
micro-batch sketch ingest in two files and compare the merged counters
(and probe estimates) against the one-shot batch sketch — counter
addition makes the split invisible. Replays must not double-count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_two_files(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("docs_cms_stream")
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "part1.parquet")
    pq.write_table(tbl.slice(half), d / "part2.parquet")
    return str(d)


def _drain(spark, src_dir: str, cms_path: str) -> None:
    from sunat_rree_demo_spark.streaming.cms_stream import cms_ingest_handler
    from sunat_rree_demo_spark.streaming.dedup_stream import docs_file_stream

    q = (docs_file_stream(spark, src_dir)
         .writeStream.foreachBatch(cms_ingest_handler(spark, cms_path))
         .option("checkpointLocation", f"{cms_path}/_stream_checkpoint")
         .trigger(availableNow=True)
         .start())
    assert q.awaitTermination(300)


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path,
                                             docs_two_files):
    from sunat_rree_demo_spark.operators.sketches import cms_partial_counts
    from sunat_rree_demo_spark.operators.text import tokens
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.cms_stream import (
        load_cms,
        probe_cms,
    )

    cms_path = str(tmp_path / "cms")
    _drain(spark, docs_two_files, cms_path)

    got = {(r.j, r.bucket): r.c for r in
           load_cms(spark, cms_path).collect()}
    full = load_table(spark, SF_SMOKE, "documents")
    tk = full.select(F.explode(tokens(F.col("text"))).alias("term"))
    want = {(r.j, r.bucket): r.c for r in
            cms_partial_counts(tk).collect()}
    assert got == want

    # probe estimates obey the sketch guarantee against exact counts
    exact = {r.term: r.n
             for r in tk.groupBy("term")
             .agg(F.count("*").alias("n")).collect()}
    some_terms = tuple(sorted(exact)[:5])
    for r in probe_cms(spark, cms_path, some_terms).collect():
        assert r.cms_est >= exact[r.term]


def test_batch_replay_does_not_double_count(spark, tmp_path,
                                            docs_two_files):
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.cms_stream import (
        absorb_tokens_batch,
        load_cms,
    )

    cms_path = str(tmp_path / "cms")
    batch = load_table(spark, SF_SMOKE, "documents").limit(20)
    absorb_tokens_batch(spark, batch, 0, cms_path)
    before = {(r.j, r.bucket): r.c for r in
              load_cms(spark, cms_path).collect()}
    # crash-replay of the SAME batch id — even with different content,
    # the committed marker wins and nothing changes
    absorb_tokens_batch(spark, batch, 0, cms_path)
    absorb_tokens_batch(spark, batch.limit(3), 0, cms_path)
    after = {(r.j, r.bucket): r.c for r in
             load_cms(spark, cms_path).collect()}
    assert before == after


def test_probe_unseen_term_estimates_zero(spark, tmp_path):
    """A term whose buckets were never hit estimates 0 (the left-join
    + coalesce path), and probing before ANY batch commits returns 0
    for everything instead of crashing."""
    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.cms_stream import (
        absorb_tokens_batch,
        probe_cms,
    )

    cms_path = str(tmp_path / "cms")
    # pre-ingest: path does not exist yet
    pre = {r.term: r.cms_est
           for r in probe_cms(spark, cms_path, ("anything",)).collect()}
    assert pre == {"anything": 0}

    batch = load_table(spark, SF_SMOKE, "documents").limit(5)
    absorb_tokens_batch(spark, batch, 0, cms_path)
    got = {r.term: r.cms_est for r in
           probe_cms(spark, cms_path,
                     ("zq-never-seen-term-!!", "table")).collect()}
    assert set(got) == {"zq-never-seen-term-!!", "table"}
    # with only 5 docs the sketch is sparse: an absent term's buckets
    # may be empty -> estimate must come back (possibly 0), never drop
    assert got["zq-never-seen-term-!!"] >= 0


def test_torn_partial_batch_is_invisible_to_probes(spark, tmp_path):
    """A batch directory WITHOUT its _SUCCESS marker (crashed
    mid-write, or mid-delete during a replay's overwrite) must not be
    summed into the live sketch: probing mid-crash sees exactly the
    committed batches, preserving the one-sided est ≥ exact guarantee.
    Once the replay completes the batch, its counts appear."""
    from sunat_rree_demo_spark.streaming.cms_stream import (
        absorb_tokens_batch,
        load_cms,
        probe_cms,
    )

    cms = str(tmp_path / "cms")
    docs0 = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id long, text string")
    absorb_tokens_batch(spark, docs0, 0, cms)
    before = {r.term: r.cms_est
              for r in probe_cms(spark, cms, ("alpha", "beta")).collect()}
    assert before == {"alpha": 2, "beta": 1}

    # simulate a torn batch 1: counter files present, no _SUCCESS
    docs1 = spark.createDataFrame(
        [(2, "alpha gamma")], "doc_id long, text string")
    absorb_tokens_batch(spark, docs1, 1, cms)
    import os
    os.remove(f"{cms}/batch_id=1/_SUCCESS")

    mid = {r.term: r.cms_est
           for r in probe_cms(spark, cms, ("alpha", "gamma")).collect()}
    assert mid == {"alpha": 2, "gamma": 0}, "torn partial leaked into probe"
    # the merged frame equals the committed batch's partials alone
    committed_only = spark.read.parquet(f"{cms}/batch_id=0")
    assert (load_cms(spark, cms).exceptAll(
        committed_only.select("j", "bucket", "c")).count() == 0)

    # replay completes batch 1 (idempotent overwrite) → now visible
    absorb_tokens_batch(spark, docs1, 1, cms)
    after = {r.term: r.cms_est
             for r in probe_cms(spark, cms, ("alpha", "gamma")).collect()}
    assert after == {"alpha": 3, "gamma": 1}
