"""Mixed-modality corpus curation (r9) — the composed end-to-end job
a multimodal training-data pipeline runs over a crawl's media columns,
wired from the engine's own operators (no reference counterpart; the
orchestration analog of run_pipeline.py:64 for the media extension
surface):

    1. modality routing    (sniff_media_type magic bytes + the
                            animated-GIF probe — a GIF with ≥2 image
                            blocks is footage, not a picture)
    2. per-modality dedup keys
         image  → perceptual dHash        (multimodal.image_dhash)
         audio  → frame-energy delta fp   (q223's device over
                                           multimodal.pcm_frame_energy)
         video  → frame-brightness fp     (multimodal.video_fingerprint
                                           over video_frame_stats —
                                           MJPEG-AVI and animated GIF)
         text/other → exact content hash  (sha-256)
    3. unified survivor election: min-id per key, across formats —
       the same fold q230/q231/q235/q238 verify per modality
    4. per-modality census summary

Un-keyable items (gated codecs → null dHash, sub-8×9 images,
single-frame footage, audio shorter than two frames) are NOT dropped:
they take a per-item unique key and survive individually, counted in
the summary's ``n_unkeyed`` — a dedup pass must never delete what it
could not fingerprint.

Scale: routing and every keyer are Arrow-batched mapInPandas passes
at media grain — payloads never shuffle; the election shuffles only
(id, modality, short key) rows, and the summary is a 4-group rollup.
The per-modality keyers each scan only their routed slice (the
filters all prune from ONE routing pass's output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from sunat_rree_demo_spark.operators.multimodal import (
    delta_sign_fingerprint,
    gif_frame_count,
    image_dhash,
    pcm_frame_energy,
    sniff_media_type,
    video_fingerprint,
    video_frame_stats,
)

#: routing classes, in census order
MODALITIES = ("audio", "image", "text", "video")


def route_media(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Adds a ``modality`` column from the payload's magic bytes —
    the front-door routing decision of the curation job. GIFs are the
    one container that needs more than magic bytes: an animated GIF
    (≥2 image blocks, counted by the cheap no-LZW block walk
    ``gif_frame_count``) routes as video, a single-frame GIF as
    image. Anything without a known signature — including null
    payloads — routes as text (the exact-hash modality): a crawl's
    unknown bytes get exact dedup, never a decoder."""
    import pandas as pd

    def one(b) -> str:
        if b is None:
            return "text"
        raw = bytes(b)
        mt = sniff_media_type(raw)
        if mt == "image/gif":
            n = gif_frame_count(raw)
            return "video" if n is not None and n >= 2 else "image"
        if mt == "video/mp4":
            # ISO-BMFF magic can't tell audio-only containers apart
            # (unbranded M4A); the cheap no-sample-decode trak walk
            # can (r10) — an audio-only MP4 must reach the audio
            # keyer, not yield no video rows and survive unkeyed
            from sunat_rree_demo_spark.operators.multimodal import (
                _mp4_tracks,
            )

            kinds = {h for h, _ts, _tb in _mp4_tracks(raw)}
            if b"vide" not in kinds and b"soun" in kinds:
                return "audio"
            return "video"
        fam = mt.split("/")[0]
        return fam if fam in ("image", "audio", "video") else "text"

    out_schema = T.StructType(
        list(media.schema.fields)
        + [T.StructField("modality", T.StringType(), False)])

    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["modality"] = [one(b) for b in pdf["content"]]
            yield pdf

    return media.mapInPandas(batches, schema=out_schema)


def media_dedup_keys(routed: DataFrame,
                     id_col: str = "media_id",
                     frame_ms: int = 20) -> DataFrame:
    """(id, modality, dkey) for every routed media row. Keys are
    prefixed per modality (``img:`` / ``aud:`` / ``vid:`` / ``txt:``)
    so a routing slip can never fold across modalities; un-keyable
    rows carry a NULL dkey (callers decide — ``curate_media`` gives
    them per-item unique keys)."""
    img = (
        image_dhash(routed.filter(F.col("modality") == "image")
                    .select(id_col, "content"))
        .select(id_col,
                F.concat(F.lit("img:"), "dhash").alias("dkey"))
    )
    aud = delta_sign_fingerprint(
        pcm_frame_energy(routed.filter(F.col("modality") == "audio")
                         .select(id_col, "content"),
                         frame_ms=frame_ms),
        id_col, "frame_no", "rms",
    ).select(id_col, F.concat(F.lit("aud:"), "fp").alias("dkey"))
    vid = (
        video_fingerprint(
            video_frame_stats(
                routed.filter(F.col("modality") == "video")
                .select(id_col, "content"), every_n=1),
            id_col=id_col)
        .select(id_col, F.concat(F.lit("vid:"), "fp").alias("dkey"))
    )
    txt = (
        routed.filter(F.col("modality") == "text")
        .select(id_col,
                F.when(F.col("content").isNotNull(),
                       F.concat(F.lit("txt:"), F.sha2("content", 256)))
                .alias("dkey"))
    )
    keys = img.unionByName(aud).unionByName(vid).unionByName(txt)
    return (
        routed.select(id_col, "modality")
        .join(keys, id_col, "left")
    )


def curate_media(media: DataFrame,
                 id_col: str = "media_id",
                 frame_ms: int = 20,
                 materialize_routed: bool = False) -> DataFrame:
    """One row per media item: (id, modality, dkey, keep_id,
    is_survivor). The election is min-id per dedup key; items whose
    modality keyer could not fingerprint them (NULL dkey) survive
    individually under a per-item key.

    ``materialize_routed`` — the 100 TB knob: the four keyers each
    prune the ONE routing pass's output to their own modality, so
    lazily every branch re-scans the source payload column (four
    column-pruned reads of the media bytes; each payload still
    DECODES exactly once, in its own modality's branch). Passing True
    localCheckpoints the routed frame so the source is read once —
    the right call when the payload column is remote/expensive to
    re-scan, at the cost of materializing one copy of the batch's
    payloads (executor-local). Default False preserves the
    no-second-copy shape for cheap columnar sources."""
    routed = route_media(media, id_col)
    if materialize_routed:
        routed = routed.localCheckpoint()
    keyed = media_dedup_keys(routed, id_col, frame_ms=frame_ms)
    keyed = keyed.withColumn(
        "_k", F.coalesce("dkey", F.concat(F.lit("uniq:"),
                                          F.col(id_col))))
    byk = Window.partitionBy("_k")
    return (
        keyed.withColumn("keep_id", F.min(id_col).over(byk))
        .withColumn("is_survivor", F.col(id_col) == F.col("keep_id"))
        .select(id_col, "modality", "dkey", "keep_id", "is_survivor")
    )


def curate_media_summary(curated: DataFrame,
                         id_col: str = "media_id") -> DataFrame:
    """Per-modality census of the curated corpus: items seen,
    survivors kept, and how many were un-keyable (survived without a
    fingerprint — the quarantine-shaped number to watch in a crawl)."""
    return (
        curated.groupBy("modality")
        .agg(F.count("*").cast("bigint").alias("n_items"),
             F.sum(F.col("is_survivor").cast("int")).cast("bigint")
             .alias("n_survivors"),
             F.sum(F.col("dkey").isNull().cast("int")).cast("bigint")
             .alias("n_unkeyed"))
        .orderBy("modality")
    )
