"""Multimodal column handling (driver mandate, SURVEY.md §7.4): media as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the real Spark plumbing (schemas, partitioning, batch
shape) with the codec itself STUBBED (no image/audio libraries in this
environment).

Scale notes: binary payloads ride Parquet binary columns; per-file row
groups keep them streamable; ``mapInPandas`` processes Arrow batches so
a decode UDF amortizes Python crossing per-batch, not per-row. Partition
by a content-size bucket (or storage shard) so decode tasks are
even-sized regardless of media size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: The canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def docs_as_media(docs: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    testdata has no real media; the engine-side plumbing is identical)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.create_map(F.lit("source"), F.col("source"),
                     F.lit("lang"), F.col("lang")).alias("meta"),
    )


def _decode_dims_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: a real implementation would parse the codec header
    (PNG IHDR / JPEG SOF / WAV fmt). Deterministic fake derived from the
    first payload bytes so tests have stable expectations."""
    if not payload:
        return (0, 0)
    return (int(payload[0]) + 1, int(payload[-1]) + 1)


def decode_media(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Feature extraction over media batches via mapInPandas.

    ``real_codec=True`` is the integration point for an actual decoder
    (PIL/ffmpeg) — unavailable here, so it raises; the deterministic
    stub keeps the distributed plumbing (schema, Arrow batching,
    partition mapping) real and tested."""
    if real_codec:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "plug PIL/ffmpeg here — the mapInPandas plumbing is ready")

    import hashlib

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["content"].map(
                lambda b: _decode_dims_stub(bytes(b) if b is not None else b""))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "digest": pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    if b is not None else None),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per sampled
    offset (for video this is the keyframe extraction shape — explode on
    the Spark side, decode per frame in the UDF). Pure-expression
    implementation: offsets via sequence+explode, sample byte via
    substring on binary."""
    n_frames = F.greatest(
        F.floor(F.length("content") / every_n_bytes).cast("int"), F.lit(1))
    return (
        media.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
            F.length("content").alias("byte_len"),
        )
        .withColumn("offset", F.col("frame_no") * every_n_bytes)
    )
