"""Compaction: oversplit partitions shrink to their byte-derived file
target with content bit-identical; compact partitions are untouched;
re-running is a no-op."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _files(path: str) -> list[str]:
    return [f for f in glob.glob(f"{path}/*.parquet")]


def test_compact_merges_small_files_preserving_rows(spark, tmp_path):
    from sunat_rree_demo_spark.plans.compact import (
        compact_parquet,
        compaction_census,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 2).alias("p"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    # 20 files per partition directory
    df.repartition(20).write.partitionBy("p").parquet(root)
    assert len(_files(f"{root}/p=0")) == 20

    before = sorted(tuple(r) for r in
                    spark.read.parquet(root).collect())
    acted = compact_parquet(spark, root, target_bytes=1 << 30)
    assert {c.path.split("/")[-1] for c in acted} == {"p=0", "p=1"}
    # tiny total bytes -> single target file per partition
    assert len(_files(f"{root}/p=0")) == 1
    assert len(_files(f"{root}/p=1")) == 1
    after = sorted(tuple(r) for r in
                   spark.read.parquet(root).collect())
    assert after == before

    # second run: census sees compact partitions, acts on nothing
    assert compact_parquet(spark, root, target_bytes=1 << 30) == []


def test_min_files_threshold_protects_small_partitions(spark, tmp_path):
    """A partition with exactly min_files_to_compact files is left
    alone — action requires EXCEEDING the floor."""
    from sunat_rree_demo_spark.plans.compact import compact_parquet

    root = str(tmp_path / "v")
    spark.range(100).repartition(2).write.parquet(root)
    assert compact_parquet(spark, root, target_bytes=1 << 30,
                           min_files_to_compact=2) == []
    assert len(_files(root)) == 2


def test_interrupted_swap_recovers_from_committed_temp(spark, tmp_path):
    """Crash between delete and rename: the committed temp holds the
    only copy; the next run finishes the swap and loses nothing."""
    from sunat_rree_demo_spark.plans.compact import compact_parquet

    root = str(tmp_path / "w")
    df = spark.range(0, 500).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("x"))
    df.repartition(10).write.parquet(root)
    before = sorted(tuple(r) for r in spark.read.parquet(root).collect())

    # simulate the crash point: temp fully committed, original deleted
    import glob
    import os
    import shutil
    parent = os.path.dirname(root)
    tmp = os.path.join(parent, f"_compact_tmp_{os.path.basename(root)}")
    spark.read.parquet(root).repartition(1).write.parquet(tmp)
    for f in glob.glob(f"{root}/*"):
        os.remove(f) if os.path.isfile(f) else shutil.rmtree(f)

    acted = compact_parquet(spark, root, target_bytes=1 << 30)
    after = sorted(tuple(r) for r in spark.read.parquet(root).collect())
    assert after == before
    assert acted == []  # recovery happened in the census pre-pass
    assert not os.path.exists(tmp)


def test_census_is_metadata_only_and_sized(spark, tmp_path):
    from sunat_rree_demo_spark.plans.compact import compaction_census

    root = str(tmp_path / "u")
    spark.range(100).repartition(4).write.parquet(root)
    census = compaction_census(spark, root, target_bytes=1)
    assert len(census) == 1
    c = census[0]
    assert c.n_files == 4 and c.total_bytes > 0
    # target_bytes=1 -> one target file per byte: target == total bytes
    assert c.target_files == c.total_bytes
