"""Streaming cluster assignment: score each micro-batch of embeddings
against a FIXED k-means fit — the train-offline/serve-online half of
the clustering pipeline (operators/clustering.py trains; this serves).
New corpus deliveries get their semantic cell the moment they land,
without refitting or re-scanning history.

Assignment under fixed centroids is stateless and, because every
distance is exact int64 micro-unit arithmetic, DETERMINISTIC — so the
exactly-once story is the simplest of the streaming modules: each
batch writes ``assign/batch_id=N`` in one parquet overwrite, whose own
``_SUCCESS`` is the commit marker. A committed replay short-circuits;
a crash replay overwrites byte-identically; readers
(``load_assignments``) see committed partitions only, so torn batches
are invisible (same reader gate as streaming.novelty_stream).

Scale: per batch one narrow mapInPandas pass, the (k × d) centroid
matrix in the task closure — no shuffle, no state store, no history
scan. Batch/stream equivalence (union of streamed assignments ==
``kmeans_fit``'s one-shot assignment under the same centroids) is
pinned by tests/test_cluster_stream.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sunat_rree_demo_spark.localrel import local_df

from sunat_rree_demo_spark.operators.clustering import assign_under
from sunat_rree_demo_spark.operators.dedup_index import _hadoop_fs

BATCH_COL = "batch_id"

EMB_FILE_SCHEMA = "vec_id long, embedding array<float>, label int"


def embeddings_file_stream(spark: SparkSession, directory: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """Replayable file-source stream over embedding parquet files."""
    return (
        spark.readStream.schema(EMB_FILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def assign_batch_committed(spark: SparkSession, store_path: str,
                           batch_id: int) -> bool:
    fs, marker = _hadoop_fs(
        spark, f"{store_path}/assign/{BATCH_COL}={batch_id}/_SUCCESS")
    return fs.exists(marker)


def process_assign_batch(spark: SparkSession, batch_df: DataFrame,
                         batch_id: int, store_path: str,
                         centroids: np.ndarray, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> None:
    """One idempotent micro-batch: nearest-centroid assignment, one
    overwrite, the parquet ``_SUCCESS`` as the commit marker."""
    if assign_batch_committed(spark, store_path, batch_id):
        return
    out = assign_under(batch_df, centroids, id_col=id_col, vec_col=vec_col)
    (out.write.mode("overwrite")
     .parquet(f"{store_path}/assign/{BATCH_COL}={batch_id}"))


def run_cluster_stream(spark: SparkSession, emb_stream: DataFrame,
                       store_path: str, centroids: np.ndarray,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       timeout: int = 300) -> None:
    """Drain the stream through ``process_assign_batch`` (availableNow,
    resumable from the checkpoint under the store)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_assign_batch(spark, batch_df, batch_id, store_path,
                             centroids, id_col=id_col, vec_col=vec_col)

    q = (
        emb_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{store_path}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    done = q.awaitTermination(timeout)
    if not done:
        q.stop()
        raise TimeoutError(
            f"cluster stream did not drain within {timeout}s — the store "
            f"holds only completed micro-batches (restart resumes from "
            f"the stream checkpoint)")


def load_assignments(spark: SparkSession, store_path: str,
                     id_col: str = "vec_id") -> DataFrame:
    """All COMMITTED batches' assignments (torn partials invisible).
    ``id_col`` names the empty-store schema's id column."""
    fs, jroot = _hadoop_fs(spark, f"{store_path}/assign")
    dirs = []
    if fs.exists(jroot):
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(f"{BATCH_COL}=")):
                continue
            if assign_batch_committed(
                    spark, store_path, int(name.split("=", 1)[1])):
                dirs.append(f"{store_path}/assign/{name}")
    if not dirs:
        return local_df(spark, 
            [], f"{id_col} long, cluster int, d2 bigint")
    return spark.read.parquet(*dirs)
