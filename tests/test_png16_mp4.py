"""r10 codec surface: 16-bit PNG native-grain decode and the
Motion-JPEG ISO-BMFF (MP4) demuxer.

Exactness contracts under test (media playbook):
- 16-bit samples are big-endian pairs; the row filters' 'left' offset
  is 2 bytes; Adam7 passes reset per sub-image — a slip in any of the
  three shifts every decoded level.
- decode_png_pixels (the byte-grain API dHash and the funnels read)
  stays GATED on 16-bit: byte-truncating 65535-level samples would
  silently change its consumers' meaning.
- MP4 samples come back verbatim through stsc/stsz/stco; non-jpeg
  sample entries are honest gates (NotImplementedError), torn sample
  tables are corruption (ValueError), audio-only containers are None.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sunat_rree_demo_spark.operators.multimodal import (
    decode_mp4_mjpeg,
    decode_png_pixels,
    decode_png_samples,
    encode_jpeg_gray_blocks,
    encode_mp4_mjpeg,
    encode_png_gray,
)


# ------------------------------------------------------------- 16-bit PNG
def test_png16_round_trip_all_filters_and_interlace():
    rng = np.random.RandomState(11)
    for w, h in ((1, 1), (5, 4), (15, 9), (21, 17)):
        vals = rng.randint(0, 65536, size=w * h).tolist()
        for fc in ("none", "cycle"):
            for il in (False, True):
                png = encode_png_gray(vals, w, fc, interlace=il,
                                      depth=16)
                gw, gh, ch, depth, s = decode_png_samples(png)
                assert (gw, gh, ch, depth) == (w, h, 1, 16)
                assert s.dtype == np.uint16
                assert s.tolist() == vals, (w, h, fc, il)


def test_png16_gated_at_byte_grain_api():
    png = encode_png_gray([0, 65535, 257, 4096], 2, depth=16)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png_pixels(png)


def test_png16_encoder_range_check():
    with pytest.raises(ValueError, match="16-bit"):
        encode_png_gray([0, 65536], 2, depth=16)


def test_png8_byte_api_unchanged_and_reports_depth():
    px = bytes(range(24))
    png = encode_png_gray(px, 6, "cycle")
    assert decode_png_pixels(png) == (6, 4, 1, px)
    assert decode_png_samples(png)[3] == 8


def test_png16_corrupt_length_raises():
    png = encode_png_gray([1, 2, 3, 4], 2, depth=16)
    # truncate one byte inside IDAT: unfilter must see the mismatch
    import zlib

    sig, pos, parts = png[:8], 8, []
    while pos + 8 <= len(png):
        (clen,) = struct.unpack(">I", png[pos:pos + 4])
        typ = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + clen]
        if typ == b"IDAT":
            raw = zlib.decompress(body)
            body = zlib.compress(raw[:-1])
        parts.append((typ, body))
        pos += 12 + clen
    out = sig
    for typ, body in parts:
        out += (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))
    with pytest.raises(ValueError):
        decode_png_samples(out)


# ------------------------------------------------------------ MP4 / MJPEG
def _frames(n=4, bpr=10):
    return [encode_jpeg_gray_blocks(bytes(32 + (i + j) % 90
                                          for j in range(bpr)), bpr)
            for i in range(n)]


def test_mp4_round_trip_verbatim_frames():
    frames = _frames(6)
    mp4 = encode_mp4_mjpeg(frames, 80, 8, fps=4)
    w, h, fps, got = decode_mp4_mjpeg(mp4)
    assert (w, h, fps) == (80, 8, 4)
    assert got == frames


def test_mp4_non_bmff_is_none():
    assert decode_mp4_mjpeg(b"RIFF\x00\x00\x00\x00AVI LIST") is None
    assert decode_mp4_mjpeg(b"\x89PNG\r\n\x1a\n" + bytes(16)) is None


def test_mp4_foreign_codec_is_gated():
    mp4 = bytearray(encode_mp4_mjpeg(_frames(2), 80, 8))
    i = mp4.find(b"jpeg", mp4.find(b"stsd"))
    mp4[i:i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_audio_only_is_none():
    mp4 = bytearray(encode_mp4_mjpeg(_frames(2), 80, 8))
    i = mp4.find(b"vide", mp4.find(b"hdlr"))
    mp4[i:i + 4] = b"soun"
    assert decode_mp4_mjpeg(bytes(mp4)) is None


def test_mp4_sample_out_of_range_raises():
    frames = _frames(2)
    mp4 = bytearray(encode_mp4_mjpeg(frames, 80, 8))
    # point the last stco offset past EOF
    i = mp4.find(b"stco")
    (cnt,) = struct.unpack(">I", mp4[i + 8:i + 12])
    last = i + 12 + 4 * (cnt - 1)
    mp4[last:last + 4] = struct.pack(">I", len(mp4) + 1)
    with pytest.raises(ValueError, match="out of range"):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_torn_stsz_raises():
    mp4 = bytearray(encode_mp4_mjpeg(_frames(3), 80, 8))
    # claim more samples than the table carries
    i = mp4.find(b"stsz")
    mp4[i + 12:i + 16] = struct.pack(">I", 99)
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_unsorted_stsc_raises():
    """stsc runs must start at chunk 1 and increase strictly — the
    per-chunk expansion assumes it, so a shuffled table is corruption
    (ValueError up front), not a silent count misassignment."""
    mp4 = bytearray(encode_mp4_mjpeg(_frames(3), 80, 8))
    i = mp4.find(b"stsc")
    # first run's first_chunk lives right after box hdr+ver/flags+count
    mp4[i + 12:i + 16] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="stsc"):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_zero_width_sample_entry_raises():
    """A declared 0×h (or w×0) jpeg sample entry is torn metadata —
    both axes must be loud, not just height."""
    mp4 = bytearray(encode_mp4_mjpeg(_frames(2), 80, 8))
    i = mp4.find(b"stsd")
    # sample-entry width u16 at stsd body offset 36 (body = i+8)
    assert struct.unpack(">H", mp4[i + 44:i + 46])[0] == 80
    mp4[i + 44:i + 46] = struct.pack(">H", 0)
    with pytest.raises(ValueError, match="dims"):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_fps_half_up_from_stts():
    # timescale 30000, delta 1001 -> 29.97 -> rounds half-up to 30
    frames = _frames(2)
    mp4 = bytearray(encode_mp4_mjpeg(frames, 80, 8, fps=30000))
    i = mp4.find(b"stts")
    mp4[i + 16:i + 20] = struct.pack(">I", 1001)  # per-sample delta
    w, h, fps, got = decode_mp4_mjpeg(bytes(mp4))
    assert fps == 30
    assert got == frames


# ------------------------------------------------ Spark-side integration
def test_video_frame_stats_mp4_and_avi_agree(spark):
    """The same JPEG frames muxed as AVI and as MP4 must yield
    identical per-frame stats rows (modulo media_id/fps) — the
    cross-container invariant q243 folds on."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_avi_mjpeg,
        video_frame_stats,
    )

    frames = _frames(5, 12)
    avi = encode_avi_mjpeg(frames, 96, 8, fps=5)
    mp4 = encode_mp4_mjpeg(frames, 96, 8, fps=9)
    media = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(mp4))],
        "media_id long, content binary")
    rows = video_frame_stats(media, every_n=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(
            (r.frame_no, r.width, r.height, r.n_samples, r.sum_val,
             r.min_val, r.max_val))
    assert sorted(by_media) == [0, 1]
    assert sorted(by_media[0]) == sorted(by_media[1])
    fps = {r.media_id: r.fps for r in rows}
    assert fps == {0: 5, 1: 9}


def test_image_pixel_stats_bit_depth_column(spark):
    """8-bit rows keep their previous values and gain bit_depth=8;
    16-bit PNGs report native-grain stats with bit_depth=16; non-image
    payloads stay all-null including bit_depth."""
    from sunat_rree_demo_spark.operators.multimodal import (
        image_pixel_stats,
    )

    png8 = encode_png_gray(bytes([10, 20, 30, 40, 50, 60]), 3)
    png16 = encode_png_gray([10 * 257, 20 * 257, 30 * 257,
                             40 * 257, 50 * 257, 60 * 257], 3,
                            depth=16)
    media = spark.createDataFrame(
        [(0, bytearray(png8)), (1, bytearray(png16)), (2, b"junk")],
        "media_id long, content binary")
    got = {r.media_id: r for r in image_pixel_stats(media).collect()}
    r8, r16, rj = got[0], got[1], got[2]
    assert (r8.width, r8.height, r8.bit_depth) == (3, 2, 8)
    assert (r8.sum_val, r8.min_val, r8.max_val) == (210, 10, 60)
    assert (r16.width, r16.height, r16.bit_depth) == (3, 2, 16)
    assert r16.sum_val == 210 * 257
    assert (r16.min_val, r16.max_val) == (10 * 257, 60 * 257)
    assert rj.bit_depth is None and rj.sum_val is None


def test_mp4_routes_as_video_and_folds_with_avi(spark):
    """The curation front door and the streaming perceptual keyer both
    get MP4 for free: route_media classifies ISO-BMFF as video, and
    the same footage muxed as AVI and MP4 folds to ONE fingerprint key
    in media_dedup_keys and perceptual_keys alike."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_avi_mjpeg,
    )
    from sunat_rree_demo_spark.plans.curate_media import (
        media_dedup_keys,
        route_media,
    )
    from sunat_rree_demo_spark.streaming.media_stream import (
        perceptual_keys,
    )

    frames = _frames(4, 12)
    avi = encode_avi_mjpeg(frames, 96, 8, fps=5)
    mp4 = encode_mp4_mjpeg(frames, 96, 8, fps=9)
    media = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(mp4))],
        "media_id long, content binary")

    routed = route_media(media)
    assert {r.media_id: r.modality for r in routed.collect()} \
        == {0: "video", 1: "video"}

    dkeys = {r.media_id: r.dkey
             for r in media_dedup_keys(routed).collect()}
    assert dkeys[0] is not None and dkeys[0].startswith("vid:")
    assert dkeys[0] == dkeys[1]

    skeys = {r.media_id: r.dhash
             for r in perceptual_keys(media).collect()}
    assert skeys[0] is not None and skeys[0].startswith("v:")
    assert skeys[0] == skeys[1]


def test_png16_rgb_decode_hand_built():
    """The decoder's 16-bit path is channel-generic (bpp = 2·ch): a
    hand-built 16-bit RGB PNG (filter-0 rows, big-endian pairs) must
    come back sample-exact. The module's encoder is grayscale-only, so
    this pins the color branch independently."""
    import zlib

    w, h = 3, 2
    vals = list(range(0, w * h * 3 * 1000, 1000))  # 18 samples < 65536
    raw = bytearray()
    k = 0
    for _row in range(h):
        raw.append(0)  # filter 0
        for _s in range(w * 3):
            raw += vals[k].to_bytes(2, "big")
            k += 1

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)  # color type 2
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    gw, gh, ch, depth, s = decode_png_samples(png)
    assert (gw, gh, ch, depth) == (w, h, 3, 16)
    assert s.tolist() == vals


def test_mp4_torn_tiny_table_box_is_valueerror():
    """A sample-table box shorter than its first u32 must raise
    ValueError (the quarantine contract), never struct.error — a
    poisoned payload escaping as a non-ValueError would wedge the
    streaming gate's corrupt='null' replay (review finding r10)."""
    mp4 = bytearray(encode_mp4_mjpeg(_frames(2), 80, 8))
    i = mp4.find(b"stts") - 4
    # shrink the stts box to 10 bytes (header + 2 junk bytes): the
    # following bytes become garbage boxes inside stbl
    mp4[i:i + 4] = struct.pack(">I", 10)
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_huge_uniform_stsz_bounded_before_allocation():
    """stsz uniform_size path must bounds-check cnt against the
    container BEFORE materializing the size list (a corrupt
    cnt=0xFFFFFFFF would otherwise allocate tens of GB)."""
    mp4 = bytearray(encode_mp4_mjpeg(_frames(2), 80, 8))
    i = mp4.find(b"stsz")
    mp4[i + 8:i + 12] = struct.pack(">I", 100)       # uniform size
    mp4[i + 12:i + 16] = struct.pack(">I", 0xFFFFFFFF)  # sample count
    with pytest.raises(ValueError, match="exceeds container"):
        decode_mp4_mjpeg(bytes(mp4))


def test_mp4_mdhd_version1_timescale_offset():
    """A version-1 mdhd (64-bit times) carries its timescale at body
    offset 20; reading the v0 offset there would take half a
    modification timestamp as the timescale and emit a silently wrong
    fps (review finding r10)."""
    frames = _frames(2)
    mp4 = bytearray(encode_mp4_mjpeg(frames, 80, 8, fps=6))
    i = mp4.find(b"mdhd")
    body = i + 4  # version byte
    # rebuild the mdhd body as v1: version=1, creation/modification
    # u64 (zeros), timescale u32, duration u64 — the box our encoder
    # writes is v0 with 20 body bytes + language/pre_defined; widen it
    import struct as _s

    old_len_off = i - 4
    (old_len,) = _s.unpack(">I", mp4[old_len_off:old_len_off + 4])
    v1_body = (bytes([1]) + b"\x00\x00\x00" + bytes(16)
               + _s.pack(">I", 6) + _s.pack(">Q", 2)
               + _s.pack(">HH", 0x55C4, 0))
    new_box = _s.pack(">I", 8 + len(v1_body)) + b"mdhd" + v1_body
    # splice: grow every enclosing box size by the delta
    delta = len(new_box) - old_len
    out = bytearray(mp4[:old_len_off]) + new_box \
        + mp4[old_len_off + old_len:]
    for fourcc in (b"moov", b"trak", b"mdia"):
        j = out.find(fourcc)
        (sz,) = _s.unpack(">I", out[j - 4:j])
        out[j - 4:j] = _s.pack(">I", sz + delta)
    w, h, fps, got = decode_mp4_mjpeg(bytes(out))
    assert fps == 6
    assert got == frames
    assert body  # silence the unused-variable lint


def test_png16_byte_api_gates_before_decoding():
    """The byte-grain gate must fire off the IHDR depth byte, before
    inflate/unfilter: a 16-bit PNG with a CORRUPT pixel stream still
    raises NotImplementedError (not ValueError) here — proof the gate
    precedes the decode work it exists to skip."""
    png = bytearray(encode_png_gray([1, 2, 3, 4], 2, depth=16))
    png[-20] ^= 0xFF  # corrupt inside IDAT/IEND tail
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png_pixels(bytes(png))


# ------------------------------------------------------------- M4A / PCM
def test_m4a_round_trip_both_endiannesses():
    from sunat_rree_demo_spark.operators.multimodal import (
        decode_mp4_pcm16,
        encode_mp4_pcm16,
    )

    rng = np.random.RandomState(5)
    for n, ch, be in ((7, 1, False), (1603, 1, True), (802, 2, False)):
        smp = rng.randint(-32768, 32768, size=n * ch)
        m4a = encode_mp4_pcm16(smp, rate=8000, channels=ch,
                               big_endian=be)
        rate, c, data = decode_mp4_pcm16(m4a)
        assert (rate, c) == (8000, ch)
        assert np.array_equal(np.frombuffer(data, "<i2"),
                              smp.astype(np.int16))


def test_m4a_codec_and_depth_gates():
    from sunat_rree_demo_spark.operators.multimodal import (
        decode_mp4_pcm16,
        encode_mp4_pcm16,
    )

    m4a = bytearray(encode_mp4_pcm16(np.arange(10), rate=8000))
    i = m4a.find(b"sowt", m4a.find(b"stsd"))
    comp = bytearray(m4a)
    comp[i:i + 4] = b"mp4a"
    with pytest.raises(NotImplementedError, match="mp4a"):
        decode_mp4_pcm16(bytes(comp))
    deep = bytearray(m4a)
    # samplesize u16 relative to the "stsd" fourcc position j: +4
    # fourcc itself, +4 version/flags, +4 entry count, +4 entry size,
    # +4 entry fourcc, +6 reserved, +2 dref, +8 ver/rev/vendor,
    # +2 channels = j+38
    j = m4a.find(b"stsd")
    assert bytes(m4a[j + 38:j + 40]) == struct.pack(">H", 16)
    deep[j + 38:j + 40] = struct.pack(">H", 8)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_mp4_pcm16(bytes(deep))


def test_m4a_video_only_container_is_none():
    from sunat_rree_demo_spark.operators.multimodal import (
        decode_mp4_pcm16,
    )

    mp4 = encode_mp4_mjpeg(_frames(2), 80, 8)
    assert decode_mp4_pcm16(mp4) is None


def test_m4a_routes_audio_and_folds_with_wav(spark):
    """An audio-only ISO-BMFF container must reach the AUDIO keyer
    (trak-walk routing, r10) and fold with the WAV mux of the same
    signal in both the curation keyer and the streaming keyer."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_mp4_pcm16,
        encode_wav_pcm16,
    )
    from sunat_rree_demo_spark.plans.curate_media import (
        media_dedup_keys,
        route_media,
    )
    from sunat_rree_demo_spark.streaming.media_stream import (
        perceptual_keys,
    )

    rng = np.random.RandomState(9)
    smp = rng.randint(-20000, 20000, size=800)
    wav = encode_wav_pcm16(smp, rate=8000)
    m4a = encode_mp4_pcm16(smp, rate=8000, big_endian=True)
    media = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(m4a))],
        "media_id long, content binary")

    routed = route_media(media)
    assert {r.media_id: r.modality for r in routed.collect()} \
        == {0: "audio", 1: "audio"}

    dkeys = {r.media_id: r.dkey
             for r in media_dedup_keys(routed).collect()}
    assert dkeys[0] is not None and dkeys[0].startswith("aud:")
    assert dkeys[0] == dkeys[1]

    skeys = {r.media_id: r.dhash
             for r in perceptual_keys(media).collect()}
    assert skeys[0] is not None and skeys[0].startswith("a:")
    assert skeys[0] == skeys[1]
