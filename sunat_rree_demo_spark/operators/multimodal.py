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
    """Fallback for unrecognized codecs: deterministic fake derived from
    the first/last payload bytes so tests have stable expectations."""
    if not payload:
        return (0, 0)
    return (int(payload[0]) + 1, int(payload[-1]) + 1)


#: JPEG frame-header (SOFn) markers carrying dimensions — every 0xC0-0xCF
#: marker except DHT (C4), JPG (C8) and DAC (CC), per ITU-T T.81 §B.2.2.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_dims(payload: bytes) -> tuple[int, int] | None:
    """REAL header parse for the common raster codecs, stdlib-only:

    - PNG: 8-byte signature, then the IHDR chunk — width/height are the
      two big-endian u32 at bytes 16..24 (RFC 2083 §3.1).
    - JPEG: walk the marker segments from SOI (FFD8) to the first SOFn
      frame header; dims are u16 height then width at offsets 3/5 of the
      segment body (ITU-T T.81 §B.2.2).
    - GIF: 'GIF87a'/'GIF89a' signature, then little-endian u16
      width/height in the logical screen descriptor.

    Returns None when no codec matches — callers fall back to the
    deterministic stub (the honest path for media this environment has
    no decoder for, e.g. video keyframes)."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return (w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:  # desynced / corrupt stream
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
            if marker in _JPEG_SOF and i + 9 <= len(payload):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return (w, h)
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h)
    return None


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("bits_per_sample", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def decode_audio_meta(payload: bytes) \
        -> tuple[int, int, int, int] | None:
    """REAL stdlib header parse for RIFF/WAVE audio: walk the chunk list
    for ``fmt `` (channels u16, sample rate u32, block align u16, bits
    u16 — all little-endian) and ``data`` (payload byte length), per the
    WAVE spec (RIFF registration, multimedia programming interface §4).
    Returns (sample_rate, n_channels, bits_per_sample, duration_ms), or
    None for non-WAV payloads — callers treat those as opaque."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    rate = channels = bits = block_align = None
    data_len = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        if cid == b"fmt " and clen >= 16 and i + 24 <= len(payload):
            channels, rate = struct.unpack("<HI", payload[i + 10:i + 16])
            block_align, bits = struct.unpack("<HH", payload[i + 20:i + 24])
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not rate or not channels or data_len is None or not block_align:
        return None
    n_frames = data_len // block_align
    return (rate, channels, bits or 0, n_frames * 1000 // rate)


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """Audio metadata extraction via the same Arrow-batched mapInPandas
    shape as ``decode_media``: WAV headers parse for real (stdlib);
    other codecs (mp3/flac — no libraries here) yield NULL metadata
    rather than fakes."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["content"].map(
                lambda b: decode_audio_meta(bytes(b)) if b is not None
                else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "sample_rate": meta.map(lambda m: m[0] if m else None),
                "n_channels": meta.map(lambda m: m[1] if m else None),
                "bits_per_sample": meta.map(lambda m: m[2] if m else None),
                "duration_ms": meta.map(lambda m: m[3] if m else None),
            })

    return media.mapInPandas(batches, schema=AUDIO_META_SCHEMA)


def decode_media(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Feature extraction over media batches via mapInPandas.

    Width/height come from a REAL stdlib header parse (PNG IHDR / JPEG
    SOFn / GIF LSD — ``decode_dims``) whenever the payload matches a
    known codec; unrecognized payloads fall back to the deterministic
    stub so the plumbing stays testable on synthetic media.
    ``real_codec=True`` is the integration point for full pixel decode
    (PIL/ffmpeg) — unavailable in this environment, so it raises."""
    if real_codec:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "plug PIL/ffmpeg here — the mapInPandas plumbing is ready")

    import hashlib

    import pandas as pd

    def _dims(payload: bytes) -> tuple[int, int]:
        return decode_dims(payload) or _decode_dims_stub(payload)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["content"].map(
                lambda b: _dims(bytes(b) if b is not None else b""))
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
