"""Plan + equivalence contracts for the round-6 additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.test_plan_contracts import plan_of


def test_q185_bucketed_index_join_no_exchange(spark, tmp_path):
    """cross_index_candidates (the q185 engine path): both band tables
    arrive through the bucketed sink, so the candidate join plans with
    no Exchange even when neither side may broadcast; the pairs equal
    the plain-parquet join of the same indexes."""
    import shutil

    from sunat_rree_demo_spark.operators.dedup_index import (
        cross_index_candidates,
        write_minhash_index,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    write_minhash_index(d.filter("doc_id % 2 = 0"), ia)
    write_minhash_index(d.filter("doc_id % 2 = 1"), ib)

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tname in ("xc_even", "xc_odd"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        shutil.rmtree(f"{warehouse}/{tname}", ignore_errors=True)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cand = cross_index_candidates(spark, ia, ib, "xc_even", "xc_odd")
        plan = plan_of(cand)
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan
        got = {(r.id1, r.id2) for r in cand.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    pa = spark.read.parquet(f"{ia}/bands").select(
        "band", "bucket", F.col("doc_id").alias("id1"))
    pb = spark.read.parquet(f"{ib}/bands").select(
        "band", "bucket", F.col("doc_id").alias("id2"))
    expected = {(r.id1, r.id2) for r in
                pa.join(pb, ["band", "bucket"])
                .select("id1", "id2").distinct().collect()}
    assert got == expected and expected


def test_q186_stats_survive_arbitrary_partitioning(spark):
    """q186's encode→decode pipeline is partitioning-invariant: the
    same doc yields the same stats whether its batch holds 1 row or
    the whole frame (mapInPandas batch shape must not leak into
    results)."""
    from sunat_rree_demo_spark.queries import REGISTRY

    base = REGISTRY["q186_png_pixel_stats"].fn(spark, SF_SMOKE)
    rows = {r.doc_id: tuple(r) for r in base.collect()}
    # rerun the un-memoized builder over a deliberately fragmented
    # input (tiny batches force many mapInPandas chunks)
    from sunat_rree_demo_spark.queries.media import q186_png_pixel_stats

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        frag = {r.doc_id: tuple(r)
                for r in q186_png_pixel_stats(spark, SF_SMOKE).collect()}
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert rows == frag and rows
