"""Index-backed BM25 search must equal the direct corpus scan (q98)
score-for-score, and the index layout must prune at the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_index_search_equals_direct_bm25(spark, tmp_path):
    from sunat_rree_demo_spark.plans.retrieval import (
        bm25_search, build_search_index)
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.queries.corpus import BM25_TERMS
    from sunat_rree_demo_spark.sources.catalog import load_table

    idx = str(tmp_path / "idx")
    build_search_index(load_table(spark, SF_SMOKE, "documents"), idx)

    got = [tuple(r) for r in
           bm25_search(spark, idx, BM25_TERMS, k=15).collect()]
    want = [tuple(r) for r in
            REGISTRY["q98_bm25_topk"].fn(spark, SF_SMOKE).collect()]
    assert got == want
    assert got  # non-vacuous: the probe terms exist in the corpus


def test_index_term_filter_reaches_scan(spark, tmp_path):
    """The query-term filter must be pushed into the postings parquet
    scan (file pruning via the range-partitioned term layout depends
    on it)."""
    from sunat_rree_demo_spark.plans.retrieval import build_search_index
    from sunat_rree_demo_spark.sources.catalog import load_table

    idx = str(tmp_path / "idx")
    build_search_index(load_table(spark, SF_SMOKE, "documents"), idx)
    df = (spark.read.parquet(f"{idx}/postings")
          .filter(F.col("term").isin("spark", "dup")))
    mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "PushedFilters" in plan and "In(term" in plan


def test_index_search_unknown_terms_empty(spark, tmp_path):
    from sunat_rree_demo_spark.plans.retrieval import (
        bm25_search, build_search_index)
    from sunat_rree_demo_spark.sources.catalog import load_table

    idx = str(tmp_path / "idx")
    build_search_index(load_table(spark, SF_SMOKE, "documents"), idx)
    assert bm25_search(spark, idx, ("zzz-not-a-term",), k=5).count() == 0
