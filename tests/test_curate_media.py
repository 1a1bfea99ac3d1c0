"""plans/curate_media.py — the composed mixed-modality curation job
(r9): magic-byte routing (incl. the animated-GIF-is-video probe),
per-modality dedup keys, the unified min-id election, and the
un-keyable-item survival guarantee the q237 oracle cannot exercise."""

import numpy as np
import pytest

from sunat_rree_demo_spark.operators.multimodal import (
    encode_avi_mjpeg,
    encode_bmp_gray,
    encode_flac_pcm16,
    encode_gif_animation,
    encode_gif_gray,
    encode_jpeg_gray_blocks,
    encode_png_gray,
    encode_wav_pcm16,
    gif_frame_count,
)
from sunat_rree_demo_spark.plans.curate_media import (
    curate_media,
    curate_media_summary,
    route_media,
)


def test_gif_frame_count_probe():
    assert gif_frame_count(b"junk") is None
    assert gif_frame_count(b"") is None
    assert gif_frame_count(encode_gif_gray(b"abcdabcd", 4)) == 1
    anim = encode_gif_animation([b"abcd", b"efgh", b"ijkl"], 4)
    assert gif_frame_count(anim) == 3
    # the probe never inflates pixels: a payload the decoder would
    # reject (torn LZW data) still counts descriptors
    assert gif_frame_count(anim[:40] + b"\x3b") in (0, 1)


def _chars(n, seed):
    rng = np.random.RandomState(seed)
    return bytes(rng.randint(32, 127, n).astype(np.uint8))


def test_route_media_by_magic_and_animation(spark):
    png = encode_png_gray(_chars(72, 1), 9)
    wav = encode_wav_pcm16(np.arange(40, dtype=np.int16), rate=250)
    avi = encode_avi_mjpeg(
        [encode_jpeg_gray_blocks(b"x" * 12, 12)] * 2, 96, 8, fps=5)
    poster = encode_gif_gray(b"abcdabcd", 4)
    anim = encode_gif_animation([b"abcd", b"efgh"], 4)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(avi)),
         (4, bytearray(poster)), (5, bytearray(anim)),
         (6, b"just some text"), (7, None)],
        "media_id long, content binary")
    got = {r["media_id"]: r["modality"]
           for r in route_media(df).collect()}
    assert got == {1: "image", 2: "audio", 3: "video",
                   4: "image", 5: "video", 6: "text", 7: "text"}


def test_curate_media_folds_within_and_across_formats(spark):
    s = _chars(72, 2)
    smp = (np.frombuffer(s, np.uint8).astype(np.int64) - 83) * 256
    chunks = [s[k:k + 12] for k in range(0, 72, 12)]
    rows = [
        # image: PNG and BMP of the same grid fold to one dHash
        (10, bytearray(encode_png_gray(s, 9))),
        (11, bytearray(encode_bmp_gray(s, 9))),
        # audio: WAV and FLAC of the same signal fold
        (20, bytearray(encode_wav_pcm16(smp, rate=250))),
        (21, bytearray(encode_flac_pcm16(smp, rate=250))),
        # video: AVI and animated GIF of the same frames fold
        (30, bytearray(encode_avi_mjpeg(
            [encode_jpeg_gray_blocks(c, 12) for c in chunks],
            96, 8, fps=5))),
        (31, bytearray(encode_gif_animation(chunks, 12, delay_cs=7))),
        # text: identical bytes fold, different bytes don't
        (40, b"identical payload"),
        (41, b"identical payload"),
        (42, b"a different payload"),
    ]
    cur = {r["media_id"]: r for r in curate_media(
        spark.createDataFrame(rows, "media_id long, content binary")
    ).collect()}
    for a, b in ((10, 11), (20, 21), (30, 31), (40, 41)):
        assert cur[a]["dkey"] == cur[b]["dkey"]
        assert cur[a]["is_survivor"] and not cur[b]["is_survivor"]
        assert cur[b]["keep_id"] == a
    assert cur[42]["is_survivor"]
    assert cur[42]["dkey"] != cur[40]["dkey"]
    # prefixes keep modalities from ever folding together
    assert {cur[i]["dkey"][:4] for i in (10, 20, 30, 40)} == \
        {"img:", "aud:", "vid:", "txt:"}


def test_unkeyable_items_survive_individually(spark):
    # sub-8x9 image -> null dHash; single-frame GIF routes as image
    # and hashes fine; audio with < 2 frames -> no fingerprint rows;
    # null payload -> text with null sha. All must SURVIVE and be
    # counted as unkeyed (never deleted by a dedup pass that could
    # not fingerprint them).
    tiny = encode_png_gray(b"abcdabcd", 4)  # 4x2 < 8x9 grid
    short = encode_wav_pcm16(np.arange(4, dtype=np.int16), rate=250)
    rows = [(1, bytearray(tiny)), (2, bytearray(short)), (3, None),
            (4, bytearray(tiny))]
    cur = curate_media(spark.createDataFrame(
        rows, "media_id long, content binary"))
    got = {r["media_id"]: r for r in cur.collect()}
    assert all(got[i]["is_survivor"] for i in (1, 2, 3, 4))
    assert all(got[i]["dkey"] is None for i in (1, 2, 3, 4))
    summ = {r["modality"]: r for r in
            curate_media_summary(cur).collect()}
    assert summ["image"]["n_unkeyed"] == 2
    assert summ["image"]["n_survivors"] == 2  # both tiny images kept
    assert summ["audio"]["n_unkeyed"] == 1
    assert summ["text"]["n_unkeyed"] == 1


def test_summary_census(spark):
    s1, s2 = _chars(72, 3), _chars(72, 4)
    rows = [
        (1, bytearray(encode_png_gray(s1, 9))),
        (2, bytearray(encode_bmp_gray(s1, 9))),
        (3, bytearray(encode_png_gray(s2, 9))),
        (4, b"t1"), (5, b"t1"), (6, b"t2"),
    ]
    summ = {r["modality"]: r for r in curate_media_summary(
        curate_media(spark.createDataFrame(
            rows, "media_id long, content binary"))).collect()}
    assert (summ["image"]["n_items"], summ["image"]["n_survivors"],
            summ["image"]["n_unkeyed"]) == (3, 2, 0)
    assert (summ["text"]["n_items"], summ["text"]["n_survivors"],
            summ["text"]["n_unkeyed"]) == (3, 2, 0)


def test_materialize_routed_is_result_identical(spark):
    """The 100 TB knob changes WHERE the routed frame lives (one
    source read + executor-local copy vs per-keyer column-pruned
    re-scans), never the result."""
    s = _chars(72, 5)
    rows = [
        (1, bytearray(encode_png_gray(s, 9))),
        (2, bytearray(encode_bmp_gray(s, 9))),
        (3, b"same text"), (4, b"same text"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    lazy = sorted(map(tuple, curate_media(df).collect()))
    eager = sorted(map(tuple, curate_media(
        df, materialize_routed=True).collect()))
    assert lazy == eager


def test_adpcm_wav_folds_with_pcm_wav_in_curation(spark):
    """r11: an IMA-ADPCM WAV routes through the same audio keyer as
    linear PCM — both containers of the SAME signal (state-machine-
    generated, so the lossy codec represents it exactly) fold to one
    aud: key and the min-id election keeps one copy. This pins the
    full integration chain: route_media's RIFF sniff → pcm_frame_energy
    → _wav_pcm16_data's tag-0x11 branch → delta-sign fingerprint."""
    import numpy as np
    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.multimodal import (
        _ima_adpcm_step,
        encode_wav_ima_adpcm,
        encode_wav_pcm16,
    )
    from sunat_rree_demo_spark.plans.curate_media import curate_media

    rng = np.random.RandomState(7)
    codes = rng.randint(0, 16, 120).astype(np.int64)
    pred, idx, samples = 0, 0, [0]
    for c in codes:
        pred, idx = _ima_adpcm_step(pred, idx, int(c))
        samples.append(pred)
    smp = np.asarray(samples, np.int64)

    media = spark.createDataFrame([
        Row(media_id=1, content=bytearray(encode_wav_pcm16(smp,
                                                           rate=1000))),
        Row(media_id=2, content=bytearray(encode_wav_ima_adpcm(
            codes, rate=1000))),
    ], "media_id long, content binary")
    rows = {r.media_id: r for r in curate_media(media).collect()}
    assert rows[1].modality == rows[2].modality == "audio"
    assert rows[1].dkey == rows[2].dkey          # ONE aud: key
    assert rows[1].is_survivor and not rows[2].is_survivor
