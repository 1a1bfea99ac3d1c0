"""Streaming mergeable quantile sketch: each micro-batch contributes an
equi-width (bin, count) partial histogram; the serving side merges
committed partials by bin-wise addition and extracts quantiles with the
exact-integer device — the cross-batch proof of the property q189
demonstrates within one query (per-flag partials → 'ALL' merge).

Because the merge is plain addition, the drained sketch is IDENTICAL to
the batch histogram over the union of the data, for any batch split —
no decay, no centroid drift, no merge-order sensitivity (contrast
t-digest/GK sketches, whose merges are approximate and order-
dependent). Pinned three ways by tests/test_sketch_stream.py: streamed
≡ batch operator ≡ q189's 'ALL' rows.

State layout: ``hist/batch_id=N`` partitions, each batch's own
overwrite with parquet's ``_SUCCESS`` as the commit marker — the same
exactly-once protocol as the cms/novelty/bloom streams (replay
rewrites byte-identically, torn batches invisible to readers).

Scale: a partial is at most |bin domain| rows per batch regardless of
batch size (map-side combine); the store grows by bins-per-batch, and
a periodic compaction (merge committed partials into one negative-id
batch) keeps reads O(domain), the dedup_index compaction analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sunat_rree_demo_spark.operators.dedup_index import (
    _hadoop_fs,
    clear_commit_marker,
)
from sunat_rree_demo_spark.operators.sketches import (
    HIST_BIN_CENTS,
    QUANTILE_PROBES,
    equi_width_histogram,
    histogram_quantiles,
    merge_histograms,
)

BATCH_COL = "batch_id"


def sketch_batch_committed(spark: SparkSession, store_path: str,
                           batch_id: int) -> bool:
    fs, marker = _hadoop_fs(
        spark, f"{store_path}/hist/{BATCH_COL}={batch_id}/_SUCCESS")
    return fs.exists(marker)


def _committed_hist_dirs(spark: SparkSession, store_path: str) -> list[str]:
    fs, jroot = _hadoop_fs(spark, f"{store_path}/hist")
    out = []
    if fs.exists(jroot):
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(f"{BATCH_COL}=")):
                continue
            if sketch_batch_committed(spark, store_path,
                                      int(name.split("=", 1)[1])):
                out.append(f"{store_path}/hist/{name}")
    return out


def process_sketch_batch(spark: SparkSession, batch_df: DataFrame,
                         batch_id: int, store_path: str,
                         cents_col: str = "price_cents",
                         width: int = HIST_BIN_CENTS) -> None:
    """One idempotent micro-batch: write the batch's partial histogram
    into its own partition (the write's ``_SUCCESS`` is the marker)."""
    if sketch_batch_committed(spark, store_path, batch_id):
        return
    part = equi_width_histogram(batch_df, F.col(cents_col), width)
    clear_commit_marker(spark, f"{store_path}/hist/{BATCH_COL}={batch_id}")
    (part.write.mode("overwrite")
     .parquet(f"{store_path}/hist/{BATCH_COL}={batch_id}"))


def merged_sketch(spark: SparkSession, store_path: str) -> DataFrame:
    """The accumulated (bin, c) histogram over committed batches."""
    dirs = _committed_hist_dirs(spark, store_path)
    if not dirs:
        return spark.createDataFrame([], "bin bigint, c bigint")
    return merge_histograms(spark.read.parquet(*dirs))


def load_sketch_quantiles(spark: SparkSession, store_path: str,
                          probes=QUANTILE_PROBES,
                          width: int = HIST_BIN_CENTS) -> DataFrame:
    return histogram_quantiles(merged_sketch(spark, store_path),
                               probes, width)


def compact_sketch(spark: SparkSession, store_path: str) -> None:
    """Collapse committed partials into one negative-id batch (the
    dedup_index compaction rule: negative ids never collide with
    stream epochs; OFFLINE maintenance — not transactional against a
    concurrent absorb)."""
    fs, jroot = _hadoop_fs(spark, f"{store_path}/hist")
    dirs = _committed_hist_dirs(spark, store_path)
    if not dirs:
        return
    bids = [int(d.rsplit("=", 1)[1]) for d in dirs]
    target = min(min(bids), 0) - 1
    merged = merged_sketch(spark, store_path).localCheckpoint()
    for d in dirs:
        fs.delete(_hadoop_fs(spark, d)[1], True)
    (merged.write.mode("overwrite")
     .parquet(f"{store_path}/hist/{BATCH_COL}={target}"))


def run_sketch_stream(spark: SparkSession, stream: DataFrame,
                      store_path: str, cents_col: str = "price_cents",
                      width: int = HIST_BIN_CENTS,
                      timeout: int = 300) -> None:
    """Drain the stream through ``process_sketch_batch`` (availableNow,
    resumable from the checkpoint under the store)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_sketch_batch(spark, batch_df, batch_id, store_path,
                             cents_col=cents_col, width=width)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{store_path}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    done = q.awaitTermination(timeout)
    if not done:
        q.stop()
        raise TimeoutError(
            f"sketch stream did not drain within {timeout}s — the store "
            f"holds only completed micro-batches (restart resumes from "
            f"the stream checkpoint)")
