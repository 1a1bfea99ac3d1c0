"""Streaming range-join enrichment: probe each micro-batch of points
against a committed INTERVAL dimension store using the same bucketed
point-in-interval join as the batch operator — the stream-side of the
"enrich events against a range table" pattern (IP→geo ranges, rate
tables, validity windows, activity intervals).

The interval store is a slowly-changing dimension: written (or
refreshed) out-of-band, read per batch. Enrichment under a FIXED
store is stateless and deterministic, so the exactly-once protocol
matches streaming.cluster_stream: each batch writes
``out/batch_id=N`` in one parquet overwrite whose own ``_SUCCESS`` is
the commit marker; committed replays short-circuit, crash replays
overwrite byte-identically, and readers see committed partitions only.

Batch/stream equivalence (union of streamed enrichments == the batch
``point_in_interval_join`` over the full point set, when the store is
fixed across the drain) is pinned by tests/test_enrich_stream.py.

Scale: per batch one hash equi-join on the bucket id against the
interval store — the store scans once per batch (bucket it by the
join column, or persist it, when it outgrows a plain read; the
dedup-index bucketed-band layout is the documented upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sunat_rree_demo_spark.operators.dedup_index import _hadoop_fs
from sunat_rree_demo_spark.operators.range_join import point_in_interval_join

BATCH_COL = "batch_id"


def write_interval_store(intervals: DataFrame, store_path: str) -> None:
    """Materialize (refresh) the interval dimension the stream probes."""
    intervals.write.mode("overwrite").parquet(f"{store_path}/intervals")


def enrich_batch_committed(spark: SparkSession, store_path: str,
                           batch_id: int) -> bool:
    fs, marker = _hadoop_fs(
        spark, f"{store_path}/out/{BATCH_COL}={batch_id}/_SUCCESS")
    return fs.exists(marker)


def process_enrich_batch(spark: SparkSession, batch_df: DataFrame,
                         batch_id: int, store_path: str,
                         point_col: str, lo_col: str, hi_col: str,
                         bucket_width: int) -> None:
    """One idempotent micro-batch: bucketed range join against the
    current interval store, one overwrite, parquet ``_SUCCESS`` as the
    commit marker."""
    if enrich_batch_committed(spark, store_path, batch_id):
        return
    intervals = spark.read.parquet(f"{store_path}/intervals")
    out = point_in_interval_join(batch_df, intervals, point_col,
                                 lo_col, hi_col, bucket_width)
    (out.write.mode("overwrite")
     .parquet(f"{store_path}/out/{BATCH_COL}={batch_id}"))


def run_enrich_stream(spark: SparkSession, points_stream: DataFrame,
                      store_path: str, point_col: str, lo_col: str,
                      hi_col: str, bucket_width: int,
                      timeout: int = 300) -> None:
    """Drain the stream through ``process_enrich_batch`` (availableNow,
    resumable from the checkpoint under the store)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_enrich_batch(spark, batch_df, batch_id, store_path,
                             point_col, lo_col, hi_col, bucket_width)

    q = (
        points_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{store_path}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    done = q.awaitTermination(timeout)
    if not done:
        q.stop()
        raise TimeoutError(
            f"enrich stream did not drain within {timeout}s — the store "
            f"holds only completed micro-batches (restart resumes from "
            f"the stream checkpoint)")


def load_enriched(spark: SparkSession, store_path: str) -> DataFrame:
    """All COMMITTED batches' enriched rows (torn partials invisible).
    Raises if no batch has committed yet (the output schema is
    join-derived, so there is no meaningful empty-store schema)."""
    fs, jroot = _hadoop_fs(spark, f"{store_path}/out")
    dirs = []
    if fs.exists(jroot):
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(f"{BATCH_COL}=")):
                continue
            if enrich_batch_committed(
                    spark, store_path, int(name.split("=", 1)[1])):
                dirs.append(f"{store_path}/out/{name}")
    if not dirs:
        raise FileNotFoundError(
            f"no committed enrichment batches under {store_path}/out")
    return spark.read.parquet(*dirs)
