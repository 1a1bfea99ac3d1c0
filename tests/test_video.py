"""AVI/MJPEG video path: mux/demux round trip, error taxonomy, the
frame-stats operator and shot-boundary detection (r8 — closes the
"video is metadata-only" gap; frames decode through the real JPEG
pipeline)."""

import struct

import numpy as np
import pytest

from sunat_rree_demo_spark.operators.multimodal import (
    decode_avi_mjpeg,
    decode_jpeg_pixels,
    encode_avi_mjpeg,
    encode_jpeg_gray_blocks,
    encode_png_gray,
    encode_wav_pcm16,
    shot_boundaries,
    sniff_media_type,
    video_frame_stats,
)


def _avi(texts, fps=12, bpr=12):
    frames = [encode_jpeg_gray_blocks(t, bpr) for t in texts]
    return encode_avi_mjpeg(frames, bpr * 8, 8, fps=fps), frames


def test_avi_round_trip_recovers_exact_frames_and_pixels():
    texts = [b"hello, world", b"HELLO, WORLD", b"0123456789ab"]
    avi, frames = _avi(texts)
    assert sniff_media_type(avi) == "video/avi"
    w, h, fps, out = decode_avi_mjpeg(avi)
    assert (w, h, fps) == (96, 8, 12)
    assert out == frames  # container is byte-transparent
    for t, f in zip(texts, out):
        fw, fh, ch, px = decode_jpeg_pixels(f)
        assert (fw, fh, ch) == (96, 8, 1)
        # uniform-block device: each char -> 64 identical pixels
        assert all(px[r * 96 + c] == t[c // 8]
                   for r in range(8) for c in range(96))


def test_avi_odd_frame_length_is_padded_and_recovered():
    # JPEG frames can be odd-length; RIFF pads chunks to even. The
    # demux layer is codec-agnostic, so odd raw payloads pin the pad
    # handling deterministically.
    frames = [b"\xff\xd8odd", b"\xff\xd8even!", b"x"]
    avi = encode_avi_mjpeg(frames, 96, 8, fps=3)
    assert decode_avi_mjpeg(avi)[3] == frames


def test_avi_non_video_payloads_return_none():
    assert decode_avi_mjpeg(b"") is None
    assert decode_avi_mjpeg(b"junk data") is None
    wav = encode_wav_pcm16(np.arange(8, dtype=np.int16))
    assert decode_avi_mjpeg(wav) is None  # RIFF but WAVE
    png = encode_png_gray(b"abcdabcd", 4)
    assert decode_avi_mjpeg(png) is None


def test_avi_corruption_taxonomy():
    avi, _ = _avi([b"hello, world"] * 3)
    # truncated form
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(avi[:-9])
    # avih/strh frame-count mismatch
    pos = avi.find(b"avih") + 8 + 16
    bad = avi[:pos] + struct.pack("<I", 99) + avi[pos + 4:]
    with pytest.raises(ValueError, match="frame counts differ"):
        decode_avi_mjpeg(bad)
    # idx1 length mismatch
    pos = avi.find(b"idx1") + 8 + 12
    bad = avi[:pos] + struct.pack("<I", 1) + avi[pos + 4:]
    with pytest.raises(ValueError, match="idx1 entry"):
        decode_avi_mjpeg(bad)
    # strf/avih dimension mismatch
    pos = avi.find(b"strf") + 8 + 4
    bad = avi[:pos] + struct.pack("<i", 640) + avi[pos + 4:]
    with pytest.raises(ValueError, match="dimensions differ"):
        decode_avi_mjpeg(bad)


def test_avi_gated_codecs_raise_notimplemented():
    avi, _ = _avi([b"hello, world"])
    pos = avi.find(b"strh") + 8 + 4
    for fourcc in (b"cvid", b"dvsd", b"DIB "):
        bad = avi[:pos] + fourcc + avi[pos + 4:]
        with pytest.raises(NotImplementedError, match="codec"):
            decode_avi_mjpeg(bad)


def test_avi_accepts_absolute_idx1_offsets():
    # players accept both movi-relative and absolute idx1 offsets;
    # rewrite ours (relative) to absolute and demux again
    avi, frames = _avi([b"a" * 12, b"b" * 12])
    movi_start = avi.find(b"movi")
    i0 = avi.find(b"idx1") + 8
    out = bytearray(avi)
    for k in (0, 1):
        (off,) = struct.unpack("<I", avi[i0 + 16 * k + 8:i0 + 16 * k + 12])
        out[i0 + 16 * k + 8:i0 + 16 * k + 12] = struct.pack(
            "<I", off + movi_start)
    assert decode_avi_mjpeg(bytes(out))[3] == frames


def test_video_frame_stats_samples_and_degrades(spark):
    texts = [b"hello, world", b"HELLO, WORLD", b"0123456789ab",
             b"zzzzzzzzzzzz"]
    avi, _ = _avi(texts, fps=7)
    wav = encode_wav_pcm16(np.arange(8, dtype=np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(wav)), (3, None)],
        "media_id long, content binary")
    rows = {r["frame_no"]: r for r in
            video_frame_stats(df, every_n=2).collect()}
    assert set(rows) == {0, 2}  # sampled frames only; wav/null degrade
    for fno, txt in ((0, texts[0]), (2, texts[2])):
        r = rows[fno]
        assert (r["media_id"], r["fps"], r["width"], r["height"]) == \
            (1, 7, 96, 8)
        assert r["n_samples"] == 64 * 12
        assert r["sum_val"] == 64 * sum(txt)
        assert r["min_val"] == min(txt) and r["max_val"] == max(txt)


def test_shot_boundaries_thresholds_exact_integer_means(spark):
    # frame means (milli): a=97000, z=122000, A=65000 -> deltas
    # 25000 then 57000; threshold between them keeps only the second
    avi, _ = _avi([b"a" * 12, b"z" * 12, b"A" * 12])
    df = spark.createDataFrame([(9, bytearray(avi))],
                               "media_id long, content binary")
    fs = video_frame_stats(df, every_n=1)
    cuts = shot_boundaries(fs, threshold_milli=30000).collect()
    assert [(c["frame_no"], c["prev_frame_no"], c["delta_milli"])
            for c in cuts] == [(2, 1, 57000)]
    # lower threshold admits both jumps
    assert {c["frame_no"] for c in
            shot_boundaries(fs, threshold_milli=1000).collect()} \
        == {1, 2}


def test_decode_media_real_codec_routes_avi(spark):
    from sunat_rree_demo_spark.operators.multimodal import decode_media

    avi, _ = _avi([b"hello, world"] * 2, fps=4)
    df = spark.createDataFrame(
        [(1, "video/avi", bytearray(avi))],
        "media_id long, media_type string, content binary")
    (row,) = decode_media(df, real_codec=True).collect()
    assert (row["width"], row["height"]) == (96, 8)

    # container lying about its dimensions is corrupt, not gated:
    # rewrite BOTH avih and strf dims so the cross-check passes but
    # the first frame's decoded size disagrees
    import struct

    from pyspark.sql.utils import PythonException

    out = bytearray(avi)
    p = avi.find(b"avih") + 8 + 32
    out[p:p + 4] = struct.pack("<I", 640)
    p = avi.find(b"strf") + 8 + 4
    out[p:p + 4] = struct.pack("<i", 640)
    p = avi.find(b"strh") + 8 + 48
    out[p:p + 2] = struct.pack("<H", 640)  # rcFrame right edge
    bad = spark.createDataFrame(
        [(1, "video/avi", bytes(out))],
        "media_id long, media_type string, content binary")
    with pytest.raises(PythonException, match="container dimensions"):
        decode_media(bad, real_codec=True).collect()


def test_extract_video_meta_covers_avi(spark):
    from sunat_rree_demo_spark.operators.multimodal import (
        extract_video_meta,
    )

    avi, _ = _avi([b"x" * 12] * 6, fps=4)  # 6 frames @ 4fps = 1500 ms
    # a gated-codec AVI must yield null meta, not abort the batch
    pos = avi.find(b"strh") + 8 + 4
    gated = avi[:pos] + b"cvid" + avi[pos + 4:]
    df = spark.createDataFrame(
        [(1, "video/avi", bytearray(avi)),
         (2, "application/octet-stream", b"junk"),
         (3, "video/avi", bytearray(gated))],
        "media_id long, media_type string, content binary")
    rows = {r.media_id: r for r in extract_video_meta(df).collect()}
    assert (rows[1].duration_ms, rows[1].timescale,
            rows[1].width, rows[1].height) == (1500, 4, 96, 8)
    assert rows[2].duration_ms is None
    assert rows[3].duration_ms is None


def test_avi_zero_rate_and_short_strf_are_corrupt():
    """Review findings r8: dwRate=0 must be ValueError (fps=0 would
    poison duration math downstream), and a torn sub-40-byte video
    strf must raise rather than silently skip the codec/dimension
    cross-checks."""
    avi, _ = _avi([b"hello, world"])
    pos = avi.find(b"strh") + 8 + 24  # dwRate field
    bad = avi[:pos] + struct.pack("<I", 0) + avi[pos + 4:]
    with pytest.raises(ValueError, match="frame rate"):
        decode_avi_mjpeg(bad)
    # shrink the strf chunk's declared length below 40
    pos = avi.find(b"strf") + 4
    bad = avi[:pos] + struct.pack("<I", 16) + avi[pos + 4:]
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bad)


def test_avi_ntsc_rational_rate_rounds_half_up():
    """Review finding r9: NTSC-rate AVIs (dwRate/dwScale =
    30000/1001, ~29.97 fps) are well-formed, not corrupt — fps is
    the half-up-rounded rational; only non-positive rate/scale stays
    ValueError."""
    avi, frames = _avi([b"hello, world"] * 2)
    pos = avi.find(b"strh") + 8 + 20  # dwScale, then dwRate
    ntsc = avi[:pos] + struct.pack("<II", 1001, 30000) + avi[pos + 8:]
    w, h, fps, got = decode_avi_mjpeg(ntsc)
    assert (w, h, fps) == (96, 8, 30)
    assert got == frames
    # half-up at the boundary: 1/2 fps rounds to 1, 2/5 to 0... no —
    # 2/5=0.4 rounds to 0, which would poison downstream; assert the
    # decoder keeps it positive via the half-up rule on 1/2
    half = avi[:pos] + struct.pack("<II", 2, 1) + avi[pos + 8:]
    assert decode_avi_mjpeg(half)[2] == 1
    # film rate 24000/1001 (~23.976) rounds to 24
    film = avi[:pos] + struct.pack("<II", 1001, 24000) + avi[pos + 8:]
    assert decode_avi_mjpeg(film)[2] == 24
    # scale=0 is still corrupt
    zero = avi[:pos] + struct.pack("<II", 0, 30000) + avi[pos + 8:]
    import pytest as _pt
    with _pt.raises(ValueError, match="frame rate"):
        decode_avi_mjpeg(zero)


def test_avi_missing_strf_is_corrupt():
    """Review finding r9: a video strl that carries strh but NO strf
    at all used to pass the codec gate (compression=None was
    whitelisted) and skip the dimension cross-check; the mandatory
    stream-format chunk missing is now as loud as a torn one."""
    avi, _ = _avi([b"x" * 12])
    p = avi.find(b"strf")
    (slen,) = struct.unpack("<I", avi[p + 4:p + 8])
    cut = 8 + slen + (slen & 1)
    out = bytearray(avi[:p] + avi[p + cut:])
    # fix every enclosing size: RIFF form, LIST hdrl, LIST strl
    for anchor in (4, avi.find(b"hdrl") - 4, avi.find(b"strl") - 4):
        (sz,) = struct.unpack("<I", bytes(out[anchor:anchor + 4]))
        struct.pack_into("<I", out, anchor, sz - cut)
    with pytest.raises(ValueError, match="without strf"):
        decode_avi_mjpeg(bytes(out))


def test_avi_sub_half_fps_clamps_to_one():
    """Review finding r9 (second pass): a well-formed sub-0.5 fps
    timelapse (dwRate/dwScale = 1/3) must not round to fps=0 — that
    would re-poison every downstream duration division the r8 guard
    exists to prevent."""
    avi, frames = _avi([b"hello, world"] * 2)
    pos = avi.find(b"strh") + 8 + 20
    slow = avi[:pos] + struct.pack("<II", 3, 1) + avi[pos + 8:]
    w, h, fps, got = decode_avi_mjpeg(slow)
    assert fps == 1 and got == frames
