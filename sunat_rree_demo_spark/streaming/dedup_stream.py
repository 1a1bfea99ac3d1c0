"""Streaming near-dup detection over a document ingest stream: each
micro-batch probes the persisted MinHash index for near-dups (against
everything ingested before it AND within itself), emits the pairs, then
absorbs the batch into the index — the streaming twin of the
batch-global q41 pipeline, built on operators.dedup_index.

Invariant (pinned by tests/test_dedup_stream.py): a pair is emitted in
exactly the micro-batch where its LATER document arrives, so draining a
corpus through the stream in any file split yields exactly the
batch-global ``minhash_lsh_pairs`` result.

Scale design: per batch, the corpus-side cost is one broadcast-probe
join against the stored band rows (no corpus shuffle — see
dedup_index); state lives in the index parquet, not the state store,
so it survives restarts and is queryable mid-stream. Exactly-once:
foreachBatch can replay a batch after a crash between the pairs write
and the index append — idempotent re-runs would come from writing both
under one batch-id-keyed commit (e.g. Delta txn or a _batch_id column
+ dedup on read), noted here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from sunat_rree_demo_spark.operators.dedup_index import (
    append_minhash_index,
    incremental_near_dup_pairs,
)

#: documents.parquet logical schema (file-source streams need one).
DOCS_FILE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def docs_file_stream(spark: SparkSession, directory: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """Replayable file-source stream over document parquet files."""
    return (
        spark.readStream.schema(DOCS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def run_dedup_stream(spark: SparkSession, docs_stream: DataFrame,
                     index_path: str, pairs_path: str,
                     threshold: float = 0.3, timeout: int = 300) -> None:
    """Drain the stream: per micro-batch, emit near-dup pairs to
    ``pairs_path`` (parquet, append) and absorb the batch into the
    index at ``index_path``."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()  # one pass over the source
        (incremental_near_dup_pairs(spark, batch, index_path,
                                    threshold=threshold)
         .withColumn("_batch_id", F.lit(batch_id))
         .write.mode("append").parquet(pairs_path))
        append_minhash_index(batch, index_path)

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{index_path}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    done = q.awaitTermination(timeout)
    if not done:
        q.stop()
        raise TimeoutError(
            f"dedup stream did not drain within {timeout}s — pairs/index "
            f"hold only the completed micro-batches (restart resumes from "
            f"the stream checkpoint)")
