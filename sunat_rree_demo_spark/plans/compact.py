"""Small-file compaction for parquet layouts: measure each partition
directory's file census, then rewrite only the OVERSPLIT partitions
into ceil(bytes/target) files — the routine maintenance job every
large parquet lake runs (streaming sinks and fine-grained upserts both
leave small files; q-series reads then pay per-file open cost and the
driver pays per-file planning cost).

Scale design: the census is driver-side Hadoop FileSystem metadata
(listStatus — no data read); each oversplit partition is rewritten
INDEPENDENTLY with a round-robin repartition to its own target count,
so a 100 TB lake compacts partition-by-partition with bounded memory
and an interrupted run leaves untouched partitions valid. The rewrite
is the standard overwrite-directory swap: read fully materializes
before the overwrite commits (Spark stages to _temporary and renames),
and re-running is idempotent — an already-compact partition is skipped
by the census filter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

from sunat_rree_demo_spark.operators.dedup_index import _hadoop_fs


@dataclass(frozen=True)
class PartitionCensus:
    path: str           # partition directory (or the root, unpartitioned)
    n_files: int
    total_bytes: int
    target_files: int   # ceil(total_bytes / target_bytes), >= 1


def _data_files(fs, jpath):
    return [st for st in fs.listStatus(jpath)
            if st.isFile() and not st.getPath().getName().startswith(("_", "."))]


def compaction_census(spark: SparkSession, root: str,
                      target_bytes: int = 128 * 1024 * 1024
                      ) -> list[PartitionCensus]:
    """One census row per leaf data directory under ``root`` (the root
    itself when unpartitioned). Pure metadata — no data is read."""
    fs, jroot = _hadoop_fs(spark, root)
    out: list[PartitionCensus] = []

    def visit(jdir):
        files = _data_files(fs, jdir)
        subdirs = [st.getPath() for st in fs.listStatus(jdir)
                   if st.isDirectory()
                   and not st.getPath().getName().startswith(("_", "."))]
        if files:
            total = sum(st.getLen() for st in files)
            out.append(PartitionCensus(
                path=jdir.toString(),
                n_files=len(files),
                total_bytes=total,
                target_files=max(1, math.ceil(total / target_bytes))))
        for sub in subdirs:
            visit(sub)

    visit(jroot)
    return out


def compact_parquet(spark: SparkSession, root: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    min_files_to_compact: int = 2) -> list[PartitionCensus]:
    """Rewrite every leaf directory whose file count exceeds both its
    byte-derived target and ``min_files_to_compact``. Returns the
    census rows that were acted on (empty = nothing to do)."""
    acted = []
    for c in compaction_census(spark, root, target_bytes):
        if c.n_files <= max(c.target_files, min_files_to_compact - 1):
            continue
        df = spark.read.parquet(c.path)
        # fully materialize before the overwrite replaces the input
        # files; localCheckpoint(eager) pins the rows executor-side
        pinned = df.repartition(c.target_files).localCheckpoint(eager=True)
        pinned.write.mode("overwrite").parquet(c.path)
        acted.append(c)
    return acted
