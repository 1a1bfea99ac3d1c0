"""Composed mixed-modality curation funnel at 10x (r9) — q237's whole
pipeline (encode two copies per doc -> magic-byte routing -> four
perceptual/exact keyers over seven real codecs -> unified election ->
census) timed at sf0.01 and sf0.1. The funnel is Arrow-batched at
media grain with no payload shuffle, so wall should scale ~linearly
with the corpus (the encode+decode passes dominate); the election
shuffles only (id, short-key) rows.

Usage: python scripts/scale_probe_media_curate.py
Prints one markdown row per scale for SCALE.md.
"""

import sys
import time

sys.path.insert(0, ".")


def _five_container_media(spark, sf_dir: str):
    """r11 cohort (verdict r10 task #3): the r10 containers join the
    probe — every even doc ships the SAME footage as MJPEG-AVI,
    animated GIF and MJPEG-MP4 (q243's device), every odd doc the
    SAME recording as PCM WAV and PCM-M4A (q246's device) — so the
    funnel pays the ISO-BMFF routing/demux paths added in r10 and
    the cross-container folds do real election work."""
    import pandas as pd

    from pyspark.sql import functions as F, types as T
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_gif_animation,
        encode_jpeg_gray_blocks,
        encode_mp4_mjpeg,
        encode_mp4_pcm16,
        encode_wav_pcm16,
    )
    from sunat_rree_demo_spark.operators.skew import fan_out

    import numpy as np

    bpr, nf = 12, 6
    docs = fan_out(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id",
                F.regexp_replace("text", "[^ -~]", "").alias("s"))
        .withColumn("s", F.expr(
            f"substring(s, 1, least(length(s) div {bpr}, {nf}) * {bpr})"))
        .filter(F.length("s") >= 2 * bpr))

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])

    def enc(it):
        for pdf in it:
            ids, payloads = [], []
            for did, s in zip(pdf["doc_id"], pdf["s"]):
                did, b = int(did), s.encode("ascii")
                if did % 2 == 0:
                    chunks = [b[k:k + bpr] for k in range(0, len(b), bpr)]
                    jpegs = [encode_jpeg_gray_blocks(c, bpr)
                             for c in chunks]
                    ids += [did * 3, did * 3 + 1, did * 3 + 2]
                    payloads += [
                        encode_avi_mjpeg(jpegs, bpr * 8, 8, fps=5),
                        encode_gif_animation(chunks, bpr, delay_cs=7),
                        encode_mp4_mjpeg(jpegs, bpr * 8, 8, fps=9)]
                else:
                    smp = (np.frombuffer(b, np.uint8)
                           .astype(np.int64) - 79) * 256
                    ids += [did * 3, did * 3 + 1]
                    payloads += [encode_wav_pcm16(smp, rate=250),
                                 encode_mp4_pcm16(smp, rate=250)]
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    return docs.mapInPandas(enc, schema=schema)


def main():
    from sunat_rree_demo_spark.queries.base import REGISTRY
    import sunat_rree_demo_spark.queries  # noqa: F401
    from sunat_rree_demo_spark.session import get_spark, tune

    spark = tune(get_spark())
    # __wrapped__ bypasses the plan memo: a memoized DataFrame's
    # re-collect reuses the session's shuffle files and skips the
    # encode/decode stages entirely — the probe must pay the real
    # funnel every run
    fn = REGISTRY["q237_media_curation_summary"].fn.__wrapped__
    fn(spark, "/root/testdata/sf0.01").collect()  # session warmup
    print("| scale | run | wall | rows |", flush=True)
    print("|---|---|---|---|", flush=True)
    walls = {}
    for scale, sf in (("1x", "/root/testdata/sf0.01"),
                      ("10x", "/root/testdata/sf0.1")):
        for run in ("fresh1", "fresh2"):
            t0 = time.time()
            out = fn(spark, sf).collect()
            dt = time.time() - t0
            walls[(scale, run)] = dt
            n = sum(r["n_items"] for r in out)
            print(f"| {scale} | {run} | {dt:.2f} s | {n} media |",
                  flush=True)
    print(f"\nfresh-plan ratio (10x / 1x, second runs): "
          f"{walls[('10x', 'fresh2')] / walls[('1x', 'fresh2')]:.2f}x",
          flush=True)

    # r11: the five-container cohort (AVI+GIF+MP4 video, WAV+M4A
    # audio) through the SAME funnel — the r10 containers were added
    # after the r9 probe ran
    from sunat_rree_demo_spark.plans.curate_media import (
        curate_media,
        curate_media_summary,
    )

    print("\n| scale (5-container) | run | wall | rows |", flush=True)
    print("|---|---|---|---|", flush=True)
    w5 = {}
    for scale, sf in (("1x", "/root/testdata/sf0.01"),
                      ("10x", "/root/testdata/sf0.1")):
        for run in ("fresh1", "fresh2"):
            t0 = time.time()
            out = curate_media_summary(curate_media(
                _five_container_media(spark, sf))).collect()
            dt = time.time() - t0
            w5[(scale, run)] = dt
            n = sum(r["n_items"] for r in out)
            print(f"| {scale} | {run} | {dt:.2f} s | {n} media |",
                  flush=True)
    print(f"\n5-container fresh-plan ratio (10x / 1x, second runs): "
          f"{w5[('10x', 'fresh2')] / w5[('1x', 'fresh2')]:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
