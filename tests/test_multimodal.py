"""Multimodal plumbing tests: binary media columns, Arrow-batched decode
stub, frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from sunat_rree_demo_spark.operators.multimodal import docs_as_media
    from sunat_rree_demo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    return docs_as_media(docs).cache()


def test_media_schema_and_metadata(media):
    assert dict(media.dtypes)["content"] == "binary"
    row = media.first()
    assert set(row.meta) == {"source", "lang"}


def test_decode_media_stub_features(spark, media):
    from sunat_rree_demo_spark.operators.multimodal import decode_media

    feats = decode_media(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    originals = {r.media_id: bytes(r.content) for r in media.collect()}
    for r in rows[:10]:
        payload = originals[r.media_id]
        assert r.byte_len == len(payload)
        assert r.digest == hashlib.sha256(payload).hexdigest()
        assert r.width == payload[0] + 1 and r.height == payload[-1] + 1


def test_decode_media_real_codec_gated_to_png(spark, media):
    """real_codec=True fully decodes PNG payloads (r6) and raises
    inside the task for formats that genuinely need a codec library —
    the gate narrowed from the r5 blanket raise."""
    from pyspark.sql.utils import PythonException

    from sunat_rree_demo_spark.operators.multimodal import decode_media

    # fake media (text payloads) are not PNGs -> task-side raise
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(media, real_codec=True).collect()


def test_frame_sample_offsets(media):
    from sunat_rree_demo_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, every_n_bytes=64)
    one = frames.filter(F.col("media_id") == media.first().media_id).collect()
    assert [r.frame_no for r in sorted(one, key=lambda r: r.frame_no)] == \
        list(range(len(one)))
    assert all(r.offset == r.frame_no * 64 for r in one)
    assert all(r.offset < r.byte_len for r in one)


# ---------------------------------------------------------------- real codecs
def _tiny_png(w: int, h: int) -> bytes:
    """Fully valid 8-bit grayscale PNG built with stdlib only."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _tiny_jpeg(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 header walk target (valid marker stream;
    no entropy-coded data — decode_dims only reads frame headers)."""
    import struct

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _tiny_gif(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _tiny_bmp(w: int, h: int, top_down: bool = False,
              core: bool = False) -> bytes:
    """Valid BMP file header + DIB header (no pixel data needed)."""
    import struct

    if core:
        dib = struct.pack("<IHHHH", 12, w, h, 1, 24)
    else:
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                          1, 24, 0, 0, 2835, 2835, 0, 0)
    off = 14 + len(dib)
    return (b"BM" + struct.pack("<IHHI", off, 0, 0, off)) + dib


def _tiny_tiff(w: int, h: int, big_endian: bool = False) -> bytes:
    """Minimal valid TIFF: header + one IFD with SHORT width, LONG
    height (mixed types exercise both inline-value paths) plus a
    distractor tag."""
    import struct

    bo = ">" if big_endian else "<"
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") \
        + struct.pack(bo + "I", 8)
    entries = [
        struct.pack(bo + "HHIHH", 254, 4, 1, 0, 0),      # NewSubfileType
        struct.pack(bo + "HHIH", 256, 3, 1, w) + b"\x00\x00",  # SHORT w
        struct.pack(bo + "HHII", 257, 4, 1, h),           # LONG h
    ]
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    return hdr + ifd


def test_decode_dims_real_headers():
    from sunat_rree_demo_spark.operators.multimodal import decode_dims

    assert decode_dims(_tiny_png(640, 480)) == (640, 480)
    assert decode_dims(_tiny_jpeg(1920, 1080)) == (1920, 1080)
    assert decode_dims(_tiny_gif(31, 17)) == (31, 17)
    assert decode_dims(_tiny_bmp(800, 600)) == (800, 600)
    assert decode_dims(_tiny_bmp(800, 600, top_down=True)) == (800, 600)
    assert decode_dims(_tiny_bmp(12, 34, core=True)) == (12, 34)
    assert decode_dims(_tiny_tiff(320, 240)) == (320, 240)
    assert decode_dims(_tiny_tiff(320, 240, big_endian=True)) == (320, 240)
    # truncated TIFF IFD must not crash
    assert decode_dims(b"II*\x00" + b"\x08\x00\x00\x00") is None
    # unknown codec -> None (callers fall back to the stub)
    assert decode_dims(b"plain text payload") is None
    assert decode_dims(b"") is None
    # truncated PNG signature must not crash
    assert decode_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_decode_media_uses_real_dims_for_known_codecs(spark):
    from pyspark.sql import types as T

    from sunat_rree_demo_spark.operators.multimodal import decode_media

    rows = [
        (1, bytearray(_tiny_png(12, 34)), "image/png", None),
        (2, bytearray(_tiny_jpeg(56, 78)), "image/jpeg", None),
        (3, bytearray(_tiny_gif(9, 4)), "image/gif", None),
        (4, bytearray(b"opaque blob"), "application/octet-stream", None),
    ]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ])
    media = spark.createDataFrame(rows, schema)
    got = {r.media_id: (r.width, r.height) for r in decode_media(media).collect()}
    assert got[1] == (12, 34)
    assert got[2] == (56, 78)
    assert got[3] == (9, 4)
    blob = b"opaque blob"
    assert got[4] == (blob[0] + 1, blob[-1] + 1)  # stub fallback


def _tiny_wav(rate=16000, channels=1, bits=16, n_frames=16000) -> bytes:
    """Minimal valid RIFF/WAVE: fmt + data chunks, silent payload."""
    import struct

    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_audio_meta_real_wav_header():
    from sunat_rree_demo_spark.operators.multimodal import decode_audio_meta

    assert decode_audio_meta(_tiny_wav(16000, 1, 16, 16000)) \
        == (16000, 1, 16, 1000)
    assert decode_audio_meta(_tiny_wav(44100, 2, 16, 22050)) \
        == (44100, 2, 16, 500)
    assert decode_audio_meta(b"not audio at all") is None
    assert decode_audio_meta(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt


def test_extract_audio_meta_mapinpandas(spark):
    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_meta,
    )

    df = spark.createDataFrame([
        Row(media_id=1, content=bytearray(_tiny_wav(8000, 1, 8, 4000)),
            media_type="audio/wav", meta={}),
        Row(media_id=2, content=bytearray(b"opaque mp3-ish bytes"),
            media_type="audio/mp3", meta={}),
    ], schema=MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_audio_meta(df).collect()}
    assert got[1].sample_rate == 8000 and got[1].duration_ms == 500
    assert got[2].sample_rate is None and got[2].byte_len == 20


def test_decode_audio_meta_isobmff_moov_walk():
    """r11: M4A metadata answers from the moov walk alone — rate/
    channels/bits/duration match the mux parameters for the full
    SoundDescription grid, a video-only MP4 yields None (no audio
    trak is not corrupt), junk yields None."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_audio_meta,
        encode_jpeg_gray_blocks,
        encode_mp4_mjpeg,
        encode_mp4_pcm16,
    )

    smp = (np.arange(300) % 100 - 50) * 100
    for rate in (8000, 16000):
        for ch in (1, 2):
            got = decode_audio_meta(
                encode_mp4_pcm16(smp, rate=rate, channels=ch))
            assert got == (rate, ch, 16, (300 // ch) * 1000 // rate)
    video_only = encode_mp4_mjpeg(
        [encode_jpeg_gray_blocks(b"hello world!", 12)], 96, 8, fps=5)
    assert decode_audio_meta(video_only) is None
    assert decode_audio_meta(b"\x00\x00\x00\x08ftypjunkpayload!") is None


def _flac_payload(rate=44100, channels=2, bits=16, total_samples=441000):
    """Minimal FLAC: magic + one STREAMINFO metadata block (34 bytes)."""
    packed = ((rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36)
              | total_samples)
    body = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _mp4_payload(timescale=1000, duration=12_500, width=640, height=360):
    """Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0))."""
    def box(btype, body):
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isom")
    mvhd = box(b"mvhd", bytes(4)                 # version+flags
               + bytes(8)                        # creation+modification
               + timescale.to_bytes(4, "big")
               + duration.to_bytes(4, "big")
               + bytes(80))                      # rate..next_track_id
    # v0 fixed part is 76 bytes: version+flags(4), times+ids(20),
    # reserved(8), layer/group/volume/reserved(8), matrix(36)
    tkhd = box(b"tkhd", bytes(76)
               + (width << 16).to_bytes(4, "big")
               + (height << 16).to_bytes(4, "big"))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def test_decode_audio_meta_flac_streaminfo():
    from sunat_rree_demo_spark.operators.multimodal import decode_audio_meta

    meta = decode_audio_meta(_flac_payload())
    assert meta == (44100, 2, 16, 441000 * 1000 // 44100)
    assert decode_audio_meta(b"fLaC garbage") is None


def test_decode_video_meta_isobmff():
    from sunat_rree_demo_spark.operators.multimodal import decode_video_meta

    meta = decode_video_meta(_mp4_payload())
    assert meta == (12_500, 1000, 640, 360)
    assert decode_video_meta(b"not a video at all") is None


def test_extract_video_meta_mapinpandas(spark):
    from sunat_rree_demo_spark.operators.multimodal import extract_video_meta

    rows = [(1, _mp4_payload(), "video/mp4"),
            (2, b"opaque blob", "video/unknown"),
            (3, _mp4_payload(timescale=600, duration=600 * 7,
                             width=1920, height=1080), "video/mp4")]
    media = spark.createDataFrame(rows, "media_id long, content binary, "
                                        "media_type string")
    got = {r.media_id: r for r in extract_video_meta(media).collect()}
    assert (got[1].duration_ms, got[1].width, got[1].height) == (12500, 640, 360)
    assert got[2].duration_ms is None and got[2].width is None
    assert (got[3].duration_ms, got[3].timescale,
            got[3].width, got[3].height) == (7000, 600, 1920, 1080)


def _make_wav(rate, channels, samples):
    """Minimal PCM16 WAV: RIFF + fmt + data chunks."""
    import struct

    pcm = b"".join(struct.pack("<h", s) for frame in samples
                   for s in (frame if isinstance(frame, (list, tuple))
                             else [frame] * channels))
    block_align = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_pcm_frame_energy_golden(spark):
    """RMS frames must match a pure-Python reference on a synthetic
    stereo WAV, and non-WAV payloads must yield no rows."""
    import math

    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.multimodal import pcm_frame_energy

    rate, frame_ms = 1000, 20  # 20 samples per frame
    # stereo: L ramps 0..99, R constant 100 -> mono = (L+R)//2
    samples = [(i, 100) for i in range(100)]
    wav = _make_wav(rate, 2, samples)
    media = spark.createDataFrame([
        Row(media_id=1, content=bytearray(wav)),
        Row(media_id=2, content=bytearray(b"not audio at all")),
    ])
    got = {(r["frame_no"]): (r["n_samples"], r["rms"])
           for r in pcm_frame_energy(media, frame_ms).collect()}
    mono = [(i + 100) // 2 for i in range(100)]
    want = {}
    for fi in range(5):
        w = mono[fi * 20:(fi + 1) * 20]
        want[fi] = (20, math.sqrt(sum(x * x for x in w) / len(w)))
    assert set(got) == set(want)
    for fi in want:
        assert got[fi][0] == want[fi][0]
        assert abs(got[fi][1] - want[fi][1]) < 1e-12


# ------------------------------------------------------- real PNG pixels (r6)
def _png_color(w: int, h: int, color_type: int, samples: bytes,
               plte: bytes = b"", filters=None) -> bytes:
    """Hand-assembled PNG of any color type with chosen row filters —
    built chunk-by-chunk in the TEST so the decoder under test is not
    validating its own encoder."""
    import struct
    import zlib

    from sunat_rree_demo_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _paeth,
    )

    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    assert len(samples) == h * stride
    raw = bytearray()
    prior = bytes(stride)
    for j in range(h):
        row = samples[j * stride:(j + 1) * stride]
        f = filters[j] if filters else 0
        raw.append(f)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            ul = prior[i - ch] if i >= ch else 0
            pred = {0: 0, 1: left, 2: prior[i],
                    3: (left + prior[i]) >> 1,
                    4: _paeth(left, prior[i], ul)}[f]
            raw.append((row[i] - pred) & 0xFF)
        prior = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if plte:
        body += chunk(b"PLTE", plte)
    return (b"\x89PNG\r\n\x1a\n" + body
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_every_filter():
    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_gray,
    )

    for w, h in ((1, 1), (7, 6), (16, 16), (3, 11)):
        px = bytes((i * 37 + (i * i) % 251) % 256 for i in range(w * h))
        for choice in ("cycle", "none"):
            got = decode_png_pixels(encode_png_gray(px, w, choice))
            assert got == (w, h, 1, px), (w, h, choice)


def test_png_decode_all_color_types_and_filters():
    from sunat_rree_demo_spark.operators.multimodal import decode_png_pixels

    w, h = 5, 5
    filters = [0, 1, 2, 3, 4]
    # RGB (2), gray+alpha (4), RGBA (6): decoded samples == source
    for ct in (2, 4, 6):
        ch = {2: 3, 4: 2, 6: 4}[ct]
        samples = bytes((i * 29 + ct) % 256 for i in range(w * h * ch))
        assert decode_png_pixels(_png_color(w, h, ct, samples,
                                            filters=filters)) \
            == (w, h, ch, samples)
    # palette (3): indices expand through PLTE to RGB
    plte = bytes(range(12))  # 4 palette entries
    idx = bytes((i % 4) for i in range(w * h))
    expected = b"".join(plte[i * 3:i * 3 + 3] for i in idx)
    assert decode_png_pixels(_png_color(w, h, 3, idx, plte=plte,
                                        filters=filters)) \
        == (w, h, 3, expected)


def test_png_decode_external_golden():
    """A PNG authored OUTSIDE this repo (the ubiquitous 1x1 RGBA pixel,
    pngcrush-era) — guards against a decoder that only understands its
    own encoder's output."""
    import base64

    from sunat_rree_demo_spark.operators.multimodal import decode_png_pixels

    golden = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    w, h, ch, px = decode_png_pixels(golden)
    assert (w, h, ch) == (1, 1, 4)
    assert len(px) == 4


def test_png_decode_rejects_and_gates():
    import struct
    import zlib

    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import decode_png_pixels

    # non-PNG -> None (caller falls back to metadata-only)
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(b"") is None

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    # Adam7 decodes for real since r8: a 1x1 interlaced image is one
    # pass-1 scanline (filter 0 + pixel), passes 2-7 empty
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    assert decode_png_pixels(
        sig + chunk(b"IHDR", ihdr_i)
        + chunk(b"IDAT", zlib.compress(b"\x00\x2a"))
        + chunk(b"IEND", b"")) == (1, 1, 1, b"\x2a")
    # 16-bit: honestly gated, not silently wrong (COVERAGE.md decision)
    ihdr_16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    with _pytest.raises(NotImplementedError, match="16-bit"):
        decode_png_pixels(sig + chunk(b"IHDR", ihdr_16)
                          + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                          + chunk(b"IEND", b""))
    # corrupt: wrong pixel-buffer length must raise, never mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    with _pytest.raises(ValueError):
        decode_png_pixels(sig + chunk(b"IHDR", ihdr)
                          + chunk(b"IDAT", zlib.compress(b"\x00\x01"))
                          + chunk(b"IEND", b""))


def test_image_pixel_stats_and_real_codec_dims(spark):
    from pyspark.sql import types as T

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_media,
        encode_png_gray,
        image_pixel_stats,
    )

    px1 = bytes(range(48))            # 8x6 gradient
    px2 = bytes([200] * 9)            # 3x3 flat
    rows = [
        (1, bytearray(encode_png_gray(px1, 8)), "image/png", None),
        (2, bytearray(encode_png_gray(px2, 3)), "image/png", None),
        (3, bytearray(b"opaque"), "application/octet-stream", None),
    ]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ])
    media = spark.createDataFrame(rows, schema)
    stats = {r.media_id: r for r in image_pixel_stats(media).collect()}
    assert (stats[1].width, stats[1].height, stats[1].channels) == (8, 6, 1)
    assert stats[1].sum_val == sum(px1)
    assert (stats[1].min_val, stats[1].max_val) == (0, 47)
    assert stats[2].sum_val == 1800 and stats[2].n_samples == 9
    assert stats[3].width is None and stats[3].sum_val is None
    # real_codec=True decodes PNG dims from the pixel buffer
    feats = {r.media_id: r
             for r in decode_media(media.filter("media_id < 3"),
                                   real_codec=True).collect()}
    assert (feats[1].width, feats[1].height) == (8, 6)
    assert (feats[2].width, feats[2].height) == (3, 3)


def test_wav_encoder_round_trips_and_meta_parses():
    """encode_wav_pcm16 produces a genuine RIFF/WAVE container: the
    module's own chunk-walkers recover the samples bit-exactly
    (PCM is lossless — the q207 device) and the header meta parses.
    (16-bit samples make the data chunk always even, so RIFF's
    odd-chunk pad byte is structurally out of scope here.)"""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        _wav_pcm16_data,
        decode_audio_meta,
        encode_wav_pcm16,
        sniff_media_type,
    )

    smp = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    wav = encode_wav_pcm16(smp, rate=8000)
    assert sniff_media_type(wav) == "audio/wav"
    rate, ch, data = _wav_pcm16_data(wav)
    assert (rate, ch) == (8000, 1)
    assert (np.frombuffer(data, "<i2") == smp).all()
    meta = decode_audio_meta(wav)
    assert meta is not None

    # single-sample container: smallest valid stream stays byte-exact
    wav2 = encode_wav_pcm16(np.array([7], dtype=np.int16))
    _, _, d2 = _wav_pcm16_data(wav2)
    assert np.frombuffer(d2, "<i2").tolist() == [7]


def test_tiff_round_trips_and_gates():
    """Baseline TIFF pixel decode (r8): gray round trips across
    PackBits/uncompressed × little/big endian × both photometric
    polarities with real multi-strip geometry; a hand-built chunky
    RGB single-strip decodes; gates (JPEG-in-TIFF, tiles, planar,
    non-8-bit — LZW and Deflate decode for real since r8) are
    NotImplementedError; strip/PackBits violations are loud."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_gray,
    )

    rng = np.random.RandomState(4)
    for w, h in [(1, 1), (19, 7), (40, 13)]:
        px = rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
        for pb in (False, True):
            for be in (False, True):
                for wz in (False, True):
                    t = encode_tiff_gray(px, w, packbits=pb,
                                         big_endian=be,
                                         white_is_zero=wz)
                    assert decode_tiff_pixels(t) == (w, h, 1, px)
    # PackBits actually compresses a runny image
    runny = (b"\x07" * 300 + b"\x09" * 300)
    assert len(encode_tiff_gray(runny, 30, packbits=True)) \
        < len(encode_tiff_gray(runny, 30)) - 400

    # hand-built chunky RGB, one strip, little-endian
    pix = bytes([10, 20, 30, 200, 150, 100])  # 2x1 RGB
    ifd_off = 8 + len(pix)
    tagv = [(256, 4, 1, 2), (257, 4, 1, 1), (259, 3, 1, 1),
            (262, 3, 1, 2), (273, 4, 1, 8), (277, 3, 1, 3),
            (278, 4, 1, 1), (279, 4, 1, len(pix))]
    ifd = struct.pack("<H", len(tagv) + 1)
    # BitsPerSample count 3 needs an external array
    ext_off = ifd_off + 2 + 12 * (len(tagv) + 1) + 4
    for tag, typ, cnt, val in tagv[:2]:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<HHII", 258, 3, 3, ext_off)
    for tag, typ, cnt, val in tagv[2:]:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    rgb = (b"II*\x00" + struct.pack("<I", ifd_off) + pix + ifd
           + struct.pack("<I", 0) + struct.pack("<HHH", 8, 8, 8))
    assert decode_tiff_pixels(rgb) == (2, 1, 3, pix)

    base = encode_tiff_gray(bytes(range(60)), 12)
    assert decode_tiff_pixels(b"not tiff") is None
    jpg = bytearray(base)
    # compression tag 259 value: find its entry and set 7
    # (JPEG-in-TIFF — still gated; LZW (5) and Deflate (8/32946)
    # decode for real since r8)
    i = jpg.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", jpg, i + 8, 7)
    with _pytest.raises(NotImplementedError, match="compression"):
        decode_tiff_pixels(bytes(jpg))
    deep = bytearray(base)
    i = deep.index(struct.pack("<HH", 258, 3))
    struct.pack_into("<H", deep, i + 8, 16)
    with _pytest.raises(NotImplementedError, match="non-8-bit"):
        decode_tiff_pixels(bytes(deep))
    short = bytearray(base)
    # with 2 strips the 279 slot holds the ARRAY OFFSET — pointing it
    # outside the payload must be loud
    i = short.index(struct.pack("<HH", 279, 4))
    struct.pack_into("<I", short, i + 8, 9999)
    with _pytest.raises(ValueError, match="outside payload"):
        decode_tiff_pixels(bytes(short))
    # single-strip variant: an oversized inline byte count reads past
    # the payload end
    one = bytearray(encode_tiff_gray(bytes(range(48)), 12,
                                     rows_per_strip=99))
    i = one.index(struct.pack("<HH", 279, 4))
    struct.pack_into("<I", one, i + 8, 9999)
    with _pytest.raises(ValueError, match="strip outside"):
        decode_tiff_pixels(bytes(one))
    # PackBits control byte demanding more literals than the strip
    # holds: under-run is corruption, never short pixels
    pb = bytearray(encode_tiff_gray(bytes(range(48)), 12,
                                    packbits=True, rows_per_strip=99))
    pb[8] = 127  # literal run of 128 in a ~50-byte strip
    with _pytest.raises(ValueError, match="PackBits"):
        decode_tiff_pixels(bytes(pb))


def test_image_pixel_stats_routes_tiff(spark):
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_tiff_gray,
        image_pixel_stats,
    )

    t = encode_tiff_gray(bytes([9, 250, 30, 70]), 2, packbits=True)
    media = spark.createDataFrame([(1, bytearray(t))],
                                  "media_id long, content binary")
    row = image_pixel_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (2, 2, 1)
    assert row.n_samples == 4 and row.sum_val == 359
    assert row.min_val == 9 and row.max_val == 250


def test_image_dhash_properties(spark):
    """dHash (q220 operator): a flat image hashes to all-zero bits
    (strict darker-than comparisons), a strict left-to-right gradient
    to all-one bits; pixel-replication upscaling preserves the hash
    (the near-duplicate property the key exists for); sub-grid images
    degrade to a null hash."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_png_gray,
        image_dhash,
    )

    flat = np.full((8, 9), 55, np.uint8)
    grad = np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))
    rng = np.random.RandomState(12)
    rand = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    rand2 = np.repeat(np.repeat(rand, 2, axis=0), 2, axis=1)  # 2x box
    rows = [(1, flat), (2, grad), (3, rand), (4, rand2),
            (5, rand[:4, :])]  # too short for the 8-row grid
    media = spark.createDataFrame(
        [(i, bytearray(encode_png_gray(a.tobytes(), a.shape[1])))
         for i, a in rows], "media_id long, content binary")
    got = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert got[1] == "00" * 8
    assert got[2] == "ff" * 8
    assert got[3] == got[4] and got[3] is not None  # scale-invariant
    assert got[5] is None


def test_exif_orientation_round_trip():
    """EXIF orientation (q224 operators): splice → decode recovers
    all 8 values; pixel decode skips the APP1 segment bit-exactly;
    EXIF-less JPEGs and non-JPEGs yield None; a malformed embedded
    TIFF is loud; out-of-range orientations are corruption."""
    import struct

    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_exif_orientation,
        decode_jpeg_pixels,
        encode_jpeg_gray_blocks,
        insert_exif_orientation,
    )

    j = encode_jpeg_gray_blocks(bytes([10, 200]), 2)
    base = decode_jpeg_pixels(j)
    for o in range(1, 9):
        tagged = insert_exif_orientation(j, o)
        assert decode_exif_orientation(tagged) == o
        assert decode_jpeg_pixels(tagged) == base
    assert decode_exif_orientation(j) is None
    assert decode_exif_orientation(b"PNG not jpeg") is None
    bad = bytearray(insert_exif_orientation(j, 3))
    bad[2 + 4 + 6] = ord("X")  # break the embedded TIFF magic
    with _pytest.raises(ValueError, match="TIFF header"):
        decode_exif_orientation(bytes(bad))
    rng = bytearray(insert_exif_orientation(j, 3))
    # orientation value lives in the IFD entry's value slot
    i = rng.index(struct.pack("<HH", 274, 3))
    struct.pack_into("<H", rng, i + 8, 99)
    with _pytest.raises(ValueError, match="range"):
        decode_exif_orientation(bytes(rng))


def test_dhash_hamming_pairs_banded(spark):
    """Banded Hamming join (q221 operator): an image and its
    top-row-perturbed copy land within distance 10 and share the
    untouched lower bands, so the pair surfaces from the (band,
    value) equi-join; a structurally different image pairs with
    neither; identical images pair at distance 0."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        dhash_hamming_pairs,
        encode_png_gray,
        image_dhash,
    )

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    near = base.copy()
    near[0, :] = 255  # localized top-row change: only row-0 bits move
    far = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    media = spark.createDataFrame(
        [(i, bytearray(encode_png_gray(a.tobytes(), 18)))
         for i, a in [(1, base), (2, near), (3, far), (4, base)]],
        "media_id long, content binary")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dhash_hamming_pairs(
                 image_dhash(media), max_hamming=10).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8
    assert pairs[(1, 4)] == 0 and pairs[(2, 4)] == pairs[(1, 2)]
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_vad_segments_islands(spark):
    """VAD segments (q219 operator): loud/quiet alternation in one
    WAV yields exactly the planted segments with correct starts,
    lengths and peaks."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_wav_pcm16,
        vad_segments,
    )

    spf = 160  # 20 ms at 8 kHz
    quiet = np.full(spf, 10, np.int16)
    loud = np.full(spf, 9000, np.int16)
    smp = np.concatenate([loud, loud, quiet, quiet, loud, quiet])
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(smp, rate=8000)))],
        "media_id long, content binary")
    segs = sorted((r.seg_start, r.n_frames, r.peak_rms)
                  for r in vad_segments(media, 20, 5000.0).collect())
    assert segs == [(0, 2, 9000.0), (4, 1, 9000.0)]


def test_flac_round_trips_decode_for_real():
    """FLAC frame-layer decode (r8): lossless round trips across
    subframe types (CONSTANT for flat blocks, FIXED order 1, LPC with
    coef [1] ≡ fixed — pins the LPC arithmetic), Rice partition
    orders 0/2/4 with best-k params and the raw escape, multi-frame
    streams with ragged last blocks; compression is real; CRC-8/16
    and truncation are loud; gated variants degrade per taxonomy."""
    import numpy as np
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_flac_pcm16,
        encode_flac_pcm16,
    )

    rng = np.random.RandomState(5)
    cases = [
        np.array([-3], np.int16),                       # single sample
        np.full(513, 42, np.int16),                     # constant, ragged
        rng.randint(-300, 300, 900).astype(np.int16),   # small residuals
        rng.randint(-32768, 32768, 2000).astype(np.int16),  # raw escape
    ]
    for smp in cases:
        for lpc in (False, True):
            for po in (0, 2, 4):
                flac = encode_flac_pcm16(smp, rate=16000,
                                         blocksize=256, lpc=lpc,
                                         p_order=po)
                rate, ch, data = decode_flac_pcm16(flac)
                assert (rate, ch) == (16000, 1)
                assert np.frombuffer(data, "<i2").tolist() \
                    == smp.tolist()
    # compression is real, not a verbatim wrap
    flat = encode_flac_pcm16(np.zeros(4096, np.int16))
    assert len(flat) < 4096 * 2 // 10

    good = encode_flac_pcm16(cases[2], blocksize=256)
    # flip one byte inside the last frame: CRC-16 (or a structure
    # check downstream of it) must abort, never silent wrong samples
    bad = bytearray(good)
    bad[-5] ^= 0x40
    with _pytest.raises(ValueError):
        decode_flac_pcm16(bytes(bad))
    with _pytest.raises(ValueError, match="truncated|sync|metadata"):
        decode_flac_pcm16(good[:-7])
    # non-FLAC payloads are opaque, not corrupt
    assert decode_flac_pcm16(b"not a flac stream at all") is None
    # gated depth: patch STREAMINFO bits-1 from 15 to 7 (8-bit) —
    # the packed rate|ch|bits|samples field lives at bytes 18..26
    eight = bytearray(good)
    packed = int.from_bytes(eight[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | (7 << 36)
    eight[18:26] = packed.to_bytes(8, "big")
    with _pytest.raises(NotImplementedError, match="8-bit"):
        decode_flac_pcm16(bytes(eight))


def test_pcm_frame_energy_routes_flac(spark):
    """The frame-energy operator yields IDENTICAL rows for the same
    samples shipped as PCM WAV and as FLAC — the lossless-decode
    contract — and a gated FLAC variant degrades to zero rows
    without aborting the batch."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_flac_pcm16,
        encode_wav_pcm16,
        pcm_frame_energy,
    )

    rng = np.random.RandomState(11)
    smp = rng.randint(-5000, 5000, 700).astype(np.int16)
    wav = encode_wav_pcm16(smp, rate=8000)
    flac = encode_flac_pcm16(smp, rate=8000, blocksize=160)
    # an 8-bit-gated FLAC rides along in the same batch
    gated = bytearray(encode_flac_pcm16(smp[:50], rate=8000))
    packed = int.from_bytes(gated[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | (7 << 36)
    gated[18:26] = packed.to_bytes(8, "big")
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(flac)), (3, gated)],
        "media_id long, content binary")
    rows = pcm_frame_energy(media, frame_ms=20).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(
            (r.frame_no, r.n_samples, r.rms))
    assert sorted(by_id) == [1, 2]
    assert sorted(by_id[1]) == sorted(by_id[2])
    assert len(by_id[1]) == (700 + 159) // 160


def test_pcm_frame_energy_decimate(spark):
    """decimate=2 collapses sample pairs to their floor mean, drops
    the odd tail sample, and halves the frame geometry — pinned
    against a hand computation."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_wav_pcm16,
        pcm_frame_energy,
    )

    smp = np.array([100, 200, -300, -500, 7], np.int16)  # odd tail
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(smp, rate=8000)))],
        "media_id long, content binary")
    rows = pcm_frame_energy(media, frame_ms=20, decimate=2).collect()
    # decimated stream: [150, -400]; one 80-sample frame window
    assert len(rows) == 1
    r = rows[0]
    assert r.n_samples == 2
    assert r.rms == float(np.sqrt((150 * 150 + 400 * 400) / 2))


def test_g711_tables_and_wav_expansion():
    """G.711 μ-law/A-law expansion (r8): the published ITU anchor
    values pin the tables independently of the generating formula
    (μ-law: 0x00→−32124, 0x80→+32124, 0xFF and 0x7F→0; A-law:
    0x55→−8, 0xD5→+8, 0x2A→−32256, 0xAA→+32256), segment boundaries
    are symmetric, and an 8-bit G.711 WAV (odd data length → RIFF pad
    byte reachable) expands to exactly the table values through the
    shared chunk walker — so pcm_frame_energy works unchanged on
    telephony audio."""
    import struct

    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        _g711_alaw_table,
        _g711_ulaw_table,
        _wav_pcm16_data,
        decode_audio_meta,
        encode_wav_g711,
    )

    u, a = _g711_ulaw_table(), _g711_alaw_table()
    assert u[0x00] == -32124 and u[0x80] == 32124
    assert u[0xFF] == 0 and u[0x7F] == 0
    assert a[0x55] == -8 and a[0xD5] == 8
    assert a[0x2A] == -32256 and a[0xAA] == 32256
    # sign symmetry: code and code^0x80 expand to negations (μ-law's
    # two zeros are the one collision)
    codes = np.arange(128)
    assert (u[codes] == -u[codes + 128].astype(np.int64)).all()
    assert (a[codes ^ 0x55 ^ 0x55] == -a[(codes ^ 0x80)]).all()
    # monotone within the positive half: larger linear for smaller
    # μ-law code index (μ-law codes descend), 255 distinct values + 0
    assert len(set(u.tolist())) == 255
    assert len(set(a.tolist())) == 256

    for law, tab in (("ulaw", u), ("alaw", a)):
        codes = bytes([0, 1, 0x55, 0x80, 0xD5, 0xFF, 7])  # odd length
        wav = encode_wav_g711(codes, law=law, rate=8000)
        rate, ch, data = _wav_pcm16_data(wav)
        assert (rate, ch) == (8000, 1)
        got = np.frombuffer(data, "<i2")
        assert got.tolist() == tab[list(codes)].tolist()
        meta = decode_audio_meta(wav)
        assert meta is not None and meta[2] == 8  # bits preserved
        # declared data length excludes the pad byte; the walker must
        # still terminate cleanly on the padded container
        (dlen,) = struct.unpack("<I", wav[wav.index(b"data") + 4:]
                                [:4])
        assert dlen == len(codes)

    # 24-bit PCM and unknown tags stay opaque (degrade, not wrong)
    bad = bytearray(encode_wav_g711(b"\x01\x02", law="ulaw"))
    struct.pack_into("<H", bad, bad.index(b"fmt ") + 8, 2)  # ADPCM
    assert _wav_pcm16_data(bytes(bad)) is None


def test_adam7_round_trip_all_filters_and_ragged_edges():
    """Adam7 decode (r8): encode→decode must reproduce the source
    bytes for shapes that hit every geometry corner — widths/heights
    not multiples of 8 (ragged pass edges), dimensions small enough
    that some passes are EMPTY (a 1x1 image has only pass 1; empty
    passes carry no scanlines at all), and the filter cycle running
    independently inside each pass."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_gray,
    )

    rng = np.random.RandomState(8)
    for w, h in [(1, 1), (2, 2), (3, 9), (7, 5), (8, 8), (21, 6),
                 (16, 17), (5, 1), (1, 12)]:
        px = rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
        img = encode_png_gray(px, w, interlace=True)
        assert img[28] == 1  # IHDR interlace flag really set
        got = decode_png_pixels(img)
        assert got == (w, h, 1, px), f"{w}x{h}"


def test_adam7_pass_geometry_is_spec_exact():
    """8x8 pass pixel counts are the spec's worked example:
    1,1,2,4,8,16,32 (RFC 2083 §2.6)."""
    from sunat_rree_demo_spark.operators.multimodal import _ADAM7

    counts = [((8 - x0 + dx - 1) // dx) * ((8 - y0 + dy - 1) // dy)
              for x0, y0, dx, dy in _ADAM7]
    assert counts == [1, 1, 2, 4, 8, 16, 32]


def test_adam7_trailing_garbage_raises():
    """Interlaced stream with extra bytes after the last pass must
    fail loud (torn/corrupt), mirroring the sequential length check."""
    import pytest as _pytest
    import struct
    import zlib

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_gray,
    )

    img = encode_png_gray(bytes(range(16)), 4, interlace=True)
    # rebuild with one garbage byte appended INSIDE the zlib stream
    sig_end = 8
    pos = sig_end
    parts = {}
    while pos + 8 <= len(img):
        (clen,) = struct.unpack(">I", img[pos:pos + 4])
        typ = img[pos + 4:pos + 8]
        parts[typ] = img[pos + 8:pos + 8 + clen]
        pos += 12 + clen
    raw = zlib.decompress(parts[b"IDAT"]) + b"\x00"

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    bad = (img[:sig_end] + chunk(b"IHDR", parts[b"IHDR"])
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_png_pixels(bad)


def test_sub_byte_png_round_trips():
    """1/2/4-bit grayscale PNGs decode for real (r8): packed MSB-first
    samples, byte-grain filters on the PACKED scanlines, ragged final
    bytes, both sequential and Adam7 — decode(encode(px)) == px with
    RAW stored levels (0..2^depth−1), one byte per sample."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_gray,
    )

    rng = np.random.RandomState(9)
    for depth in (1, 2, 4):
        for w, h in [(1, 1), (3, 5), (17, 4), (21, 6)]:
            px = rng.randint(0, 1 << depth, w * h).astype(
                np.uint8).tobytes()
            for inter in (False, True):
                img = encode_png_gray(px, w, interlace=inter,
                                      depth=depth)
                assert decode_png_pixels(img) == (w, h, 1, px), \
                    (depth, w, h, inter)
    # out-of-range sample values fail at encode time, loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="out of range"):
        encode_png_gray(bytes([4]), 1, depth=2)


def test_sub_byte_palette_png():
    """4-bit palette PNG: packed indices expand through PLTE to RGB
    triples — the common icon/logo encoding in a web crawl."""
    import struct
    import zlib

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
    )

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    rows = b"".join(b"\x00" + bytes([(r[0] << 4) | r[1], r[2] << 4])
                    for r in ([0, 1, 2], [2, 1, 0]))
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 4, 3, 0, 0, 0)
    img = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(rows))
           + chunk(b"IEND", b""))
    w, h, ch, px = decode_png_pixels(img)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes([10, 20, 30, 40, 50, 60, 70, 80, 90,
                        70, 80, 90, 40, 50, 60, 10, 20, 30])


def test_sub_byte_with_color_type_rejected():
    """Sub-byte depths are spec-legal only for grayscale/palette; an
    RGB IHDR claiming 4-bit is corrupt, not gated."""
    import struct
    import zlib

    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_png_pixels,
    )

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 4, 2, 0, 0, 0)  # RGB @ 4-bit
    img = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="color type"):
        decode_png_pixels(img)


def test_gif_round_trips_and_interlace():
    """Real GIF decode (r8): LZW decompression + palette expansion +
    4-pass interlace reorder. decode(encode(px)) returns each source
    byte as an identity-palette (v,v,v) RGB pixel."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    rng = np.random.RandomState(4)
    for w, h in [(1, 1), (13, 7), (254, 3), (5, 20)]:
        px = rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
        for inter in (False, True):
            img = encode_gif_gray(px, w, interlace=inter)
            gw, gh, ch, rgb = decode_gif_pixels(img)
            assert (gw, gh, ch) == (w, h, 3)
            a = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
            assert (a[:, 0] == a[:, 1]).all()
            assert a[:, 0].tobytes() == px


def test_gif_lzw_handcrafted_streams():
    """Dict growth, the size bump at table==2^size, phrase reuse and
    the KwKwK (code == next_code) corner — pinned by hand-packed
    bitstreams the uncompressed-trick encoder never produces."""
    from sunat_rree_demo_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    def pack(codes_sizes):
        acc = nb = 0
        out = bytearray()
        for c, s in codes_sizes:
            acc |= c << nb
            nb += s
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    # KwKwK: [clear, 0, 6, eoi] with min_code=2 -> "a" + "aa"
    assert _gif_lzw_decode(
        pack([(4, 3), (0, 3), (6, 3), (5, 3)]), 2) == b"\x00\x00\x00"
    # growth forcing the 3->4 bit bump before the last code
    assert _gif_lzw_decode(
        pack([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)]),
        2) == b"\x00\x01\x02\x03"
    # compressed phrase reuse: code 6 = "ab"
    assert _gif_lzw_decode(
        pack([(4, 3), (0, 3), (1, 3), (6, 3), (5, 3)]),
        2) == b"\x00\x01\x00\x01"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="EOI"):
        _gif_lzw_decode(pack([(4, 3), (0, 3)]), 2)
    with _pytest.raises(ValueError, match="bad LZW code"):
        _gif_lzw_decode(pack([(4, 3), (7, 3), (5, 3)]), 2)


def test_gif_corrupt_streams_fail_loud():
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    assert decode_gif_pixels(b"not a gif") is None
    img = encode_gif_gray(bytes(range(16)), 4)
    with _pytest.raises(ValueError):  # truncated mid-palette
        decode_gif_pixels(img[:20])
    with _pytest.raises(ValueError, match="image block"):
        decode_gif_pixels(img[:13 + 768] + b"\x3b")  # trailer, no image
    # extension blocks before the image are skipped
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE
    patched = img[:13 + 768] + ext + img[13 + 768:]
    assert decode_gif_pixels(patched)[3] == decode_gif_pixels(img)[3]


def test_image_pixel_stats_routes_gif(spark):
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_gif_gray,
        image_pixel_stats,
    )

    gif = encode_gif_gray(bytes([10, 250, 30, 40]), 2, interlace=True)
    media = spark.createDataFrame([(1, bytearray(gif))],
                                  "media_id long, content binary")
    row = image_pixel_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (2, 2, 3)
    assert row.n_samples == 12 and row.sum_val == 3 * (10 + 250 + 30 + 40)
    assert row.min_val == 10 and row.max_val == 250


def test_gif_truncations_stay_valueerror():
    """Every truncation point raises ValueError (the corrupt-stream
    taxonomy) — struct.error/IndexError leaked at the image-descriptor
    and min-code reads before r8's review pass."""
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    img = encode_gif_gray(bytes(range(16)), 4)
    desc = 13 + 768  # header + LSD + 256-entry GCT
    for cut in (desc + 1, desc + 5, desc + 10, desc + 11, len(img) - 3):
        with _pytest.raises(ValueError):
            decode_gif_pixels(img[:cut])
    with _pytest.raises(ValueError, match="16 bits"):
        encode_gif_gray(bytes(70000), 1)


def test_bmp_round_trips_and_layouts():
    """Uncompressed BMP decode (r8): 8-bit identity palette both row
    orders, hand-built 24-bit BGR with padded stride, 32-bit BGRA with
    alpha dropped; RLE gated, truncated pixel data loud, weak-magic
    short payloads -> None (not corrupt)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_gray,
    )

    rng = np.random.RandomState(6)
    for w, h in [(1, 1), (3, 2), (13, 5)]:
        px = rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
        for td in (False, True):
            gw, gh, ch, rgb = decode_bmp_pixels(
                encode_bmp_gray(px, w, top_down=td))
            a = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
            assert (gw, gh, ch) == (w, h, 3)
            assert a[:, 0].tobytes() == px and (a[:, 0] == a[:, 2]).all()

    pix = [(10, 20, 30), (40, 50, 60), (70, 80, 90),
           (1, 2, 3), (4, 5, 6), (7, 8, 9)]
    rows = []
    for r in (1, 0):  # bottom-up storage, stride 9 -> 12
        row = b"".join(bytes([b_, g, r_])
                       for r_, g, b_ in pix[r * 3:(r + 1) * 3])
        rows.append(row.ljust(12, b"\x00"))
    data = b"".join(rows)
    img = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                         len(data), 0, 0, 0, 0) + data)
    assert decode_bmp_pixels(img) == (
        3, 2, 3, bytes(v for p in pix for v in p))

    img32 = (b"BM" + struct.pack("<IHHI", 54 + 16, 0, 0, 54)
             + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, 16,
                           0, 0, 0, 0)
             + bytes([30, 20, 10, 255, 60, 50, 40, 0]))
    assert decode_bmp_pixels(img32) == (
        2, 1, 3, bytes([10, 20, 30, 40, 50, 60]))

    assert decode_bmp_pixels(b"BMW cars are heavy") is None
    # weak magic: LONG text starting 'BM' must also be not-a-BMP, not
    # corrupt — the structural prefix (header size + planes) gates the
    # commitment (review finding r8)
    assert decode_bmp_pixels(b"BM" + b"blah blah filler " * 8) is None
    rle = bytearray(img)
    struct.pack_into("<I", rle, 30, 1)  # RLE8 claims 8-bit by def.
    with _pytest.raises(ValueError, match="24-bit"):
        decode_bmp_pixels(bytes(rle))
    jpeg_in_bmp = bytearray(img)
    struct.pack_into("<I", jpeg_in_bmp, 30, 4)  # BI_JPEG: gated
    with _pytest.raises(NotImplementedError, match="compressed"):
        decode_bmp_pixels(bytes(jpeg_in_bmp))
    with _pytest.raises(ValueError, match="short"):
        decode_bmp_pixels(img[:-4])
    # BI_BITFIELDS decodes PER THE DECLARED masks since r8
    # (generalized bitfields) — swapped mask order follows the
    # declaration; non-contiguous masks stay gated, never silently
    # wrong
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_bmp_bitfields,
    )

    ch = np.array([[[30, 20, 10], [60, 50, 40]]])
    bf = encode_bmp_bitfields(
        ch, (0x000000FF, 0x0000FF00, 0x00FF0000), 32, True)
    assert decode_bmp_pixels(bf) == (
        2, 1, 3, bytes([30, 20, 10, 60, 50, 40]))
    bad = bytearray(bf)
    struct.pack_into("<I", bad, 54, 0x000000A5)
    with _pytest.raises(NotImplementedError, match="contiguous"):
        decode_bmp_pixels(bytes(bad))
    # pixel offset pointing inside the header: corrupt, loud
    off_bad = bytearray(img)
    struct.pack_into("<I", off_bad, 10, 2)
    with _pytest.raises(ValueError, match="offset"):
        decode_bmp_pixels(bytes(off_bad))
    # biClrUsed caps the palette: index 20 with a 16-color table is a
    # range error even when gap bytes could have masked it
    small = bytearray(encode_bmp_gray(bytes([20, 1, 2, 3]), 2))
    struct.pack_into("<I", small, 46, 16)  # claim 16 used colors
    with _pytest.raises(ValueError, match="range|truncated"):
        decode_bmp_pixels(bytes(small))


def _bmp_rle_container(stream: bytes, w: int, h: int,
                       bpp: int = 8, n_pal: int = 0) -> bytes:
    """Wrap a raw RLE byte stream in a BITMAPINFOHEADER container
    with an identity (gray-ramp) palette, for handcrafted-stream
    tests that pin escape codes the encoder never emits."""
    import struct

    n = n_pal or (1 << bpp)
    if bpp == 8:
        pal = bytes(v for i in range(n) for v in (i, i, i, 0))
    else:  # 4-bit ramp: index i -> 17*i so values span 0..255
        pal = bytes(v for i in range(n) for v in (17 * i,) * 3 + (0,))
    off = 14 + 40 + len(pal)
    return (b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp,
                          1 if bpp == 8 else 2, len(stream),
                          2835, 2835, n, 0) + pal + stream)


def test_bmp_rle_round_trips_and_escapes():
    """BI_RLE8/BI_RLE4 decode (r8 extension): encoder round trips
    cover runs + absolute packets + EOL/EOB; handcrafted streams pin
    delta skips (default index 0), early end-of-bitmap fill, RLE4
    nibble alternation and word padding; corruption is loud."""
    import numpy as np
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_rle8_gray,
    )

    rng = np.random.RandomState(8)
    # runs of random length mixed with literal stretches
    for w, h in [(1, 1), (7, 3), (64, 9)]:
        vals = []
        while len(vals) < w * h:
            if rng.rand() < 0.5:
                vals += [int(rng.randint(256))] * int(rng.randint(1, 9))
            else:
                vals += [int(v) for v in rng.randint(0, 256, 5)]
        px = bytes(vals[:w * h])
        gw, gh, ch, rgb = decode_bmp_pixels(
            encode_bmp_rle8_gray(px, w))
        a = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
        assert (gw, gh, ch) == (w, h, 3)
        assert a[:, 0].tobytes() == px and (a[:, 1] == a[:, 0]).all()

    # long constant row: run splitting at the 255 cap
    px = bytes([9]) * 600
    assert decode_bmp_pixels(encode_bmp_rle8_gray(px, 300))[3] \
        == bytes(v for b in px for v in (b, b, b))

    # handcrafted RLE8: row 0 (bottom) writes 2 px, delta skips 2
    # right and 1 up, writes 1 px, EOB — everything unwritten is
    # palette index 0
    stream = bytes((2, 7,        # run: 7 7
                    0, 2, 2, 1,  # delta: x+=2, y+=1
                    1, 5,        # run: 5
                    0, 1))       # end of bitmap
    w, h, ch, rgb = decode_bmp_pixels(_bmp_rle_container(stream, 5, 2))
    a = np.frombuffer(rgb, np.uint8).reshape(2, 5, 3)[:, :, 0]
    assert a[1].tolist() == [7, 7, 0, 0, 0]   # bottom row
    assert a[0].tolist() == [0, 0, 0, 0, 5]   # delta target row
    # absolute packet with odd length: pad byte consumed, not decoded
    stream = bytes((0, 3, 11, 12, 13, 0,  # absolute 3 + pad
                    2, 9,                 # run to fill the row
                    0, 0,                 # end of line
                    5, 1,                 # full top row
                    0, 1))
    w, h, ch, rgb = decode_bmp_pixels(_bmp_rle_container(stream, 5, 2))
    a = np.frombuffer(rgb, np.uint8).reshape(2, 5, 3)[:, :, 0]
    assert a[1].tolist() == [11, 12, 13, 9, 9]
    assert a[0].tolist() == [1] * 5

    # RLE4: runs alternate the two nibbles; absolute packs nibbles
    # MSB-first and pads to a word boundary
    stream = bytes((5, 0x2B,              # 2 11 2 11 2
                    0, 0,                 # EOL
                    0, 3, 0x4C, 0x50,     # absolute 4,12,5 (2 bytes
                    2, 0x66,              # hold 3 nibbles, word-even)
                    0, 1))
    w, h, ch, rgb = decode_bmp_pixels(
        _bmp_rle_container(stream, 5, 2, bpp=4))
    a = np.frombuffer(rgb, np.uint8).reshape(2, 5, 3)[:, :, 0]
    assert a[1].tolist() == [17 * v for v in (2, 11, 2, 11, 2)]
    assert a[0].tolist() == [17 * v for v in (4, 12, 5, 6, 6)]

    # corruption taxonomy: truncated stream, row overflow, bad delta,
    # top-down RLE, depth mismatch — all loud ValueErrors
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(_bmp_rle_container(bytes((2, 7)), 5, 2))
    with _pytest.raises(ValueError, match="overflows"):
        decode_bmp_pixels(_bmp_rle_container(
            bytes((200, 1, 0, 1)), 5, 2))
    with _pytest.raises(ValueError, match="delta"):
        decode_bmp_pixels(_bmp_rle_container(
            bytes((0, 2, 200, 200, 0, 1)), 5, 2))
    td = bytearray(_bmp_rle_container(bytes((5, 1, 0, 1)), 5, 1))
    import struct
    struct.pack_into("<i", td, 22, -1)  # negative height
    with _pytest.raises(ValueError, match="top-down"):
        decode_bmp_pixels(bytes(td))


def test_bmp_low_depth_uncompressed():
    """1-bit and 4-bit uncompressed BMP rows are bit-packed MSB-first
    and padded to 4-byte strides; palette indexing applies."""
    import struct

    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_bmp_pixels,
    )

    # 1-bit, 10 px wide, 2 rows, palette black/white
    pal = bytes((0, 0, 0, 0, 255, 255, 255, 0))
    off = 14 + 40 + len(pal)
    rows = [bytes((0b10110100, 0b01000000)).ljust(4, b"\x00"),
            bytes((0b11111111, 0b11000000)).ljust(4, b"\x00")]
    data = rows[1] + rows[0]  # bottom-up
    img = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, 10, 2, 1, 1, 0,
                         len(data), 0, 0, 2, 0) + pal + data)
    w, h, ch, rgb = decode_bmp_pixels(img)
    a = np.frombuffer(rgb, np.uint8).reshape(2, 10, 3)[:, :, 0] // 255
    assert a[0].tolist() == [1, 0, 1, 1, 0, 1, 0, 0, 0, 1]
    assert a[1].tolist() == [1] * 10

    # 4-bit, 3 px wide (stride pads 2 bytes -> 4), gray-ramp palette
    pal4 = bytes(v for i in range(16) for v in (17 * i,) * 3 + (0,))
    off = 14 + 40 + len(pal4)
    data = bytes((0xAB, 0xC0)).ljust(4, b"\x00")
    img4 = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 4, 0,
                          len(data), 0, 0, 16, 0) + pal4 + data)
    w, h, ch, rgb = decode_bmp_pixels(img4)
    a = np.frombuffer(rgb, np.uint8).reshape(1, 3, 3)[:, :, 0]
    assert a[0].tolist() == [17 * 10, 17 * 11, 17 * 12]


def test_image_pixel_stats_routes_bmp(spark):
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_bmp_gray,
        image_pixel_stats,
    )

    bmp = encode_bmp_gray(bytes([5, 200, 100, 50]), 2)
    media = spark.createDataFrame([(1, bytearray(bmp))],
                                  "media_id long, content binary")
    row = image_pixel_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (2, 2, 3)
    assert row.n_samples == 12 and row.sum_val == 3 * 355
    assert row.min_val == 5 and row.max_val == 200


def test_flac_stereo_decorrelation_round_trips():
    """Stereo FLAC decode (r8): all four channel assignments —
    independent, left/side, side/right, mid/side — round-trip
    losslessly, including inputs whose SIDE channel genuinely needs
    17 bits and mid/side pairs with odd channel sums (the (s & 1)
    low-bit reconstruction)."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_flac_pcm16,
        encode_flac_pcm16,
    )

    rng = np.random.RandomState(11)
    rand = rng.randint(-12000, 12000, size=(700, 2)).astype(np.int64)
    edges = np.array(
        [[32767, -32768], [-32768, 32767],   # side spans 17 bits
         [32767, 32766], [5, 4], [-7, 2]] * 60,  # odd sums
        dtype=np.int64)
    for st in (rand, edges):
        for mode in ("indep", "left_side", "right_side", "mid_side"):
            for lpc, po in ((False, 0), (True, 2)):
                flac = encode_flac_pcm16(st, rate=8000, blocksize=192,
                                         lpc=lpc, p_order=po,
                                         channel_mode=mode)
                rate, ch, pcm = decode_flac_pcm16(flac)
                assert (rate, ch) == (8000, 2)
                got = np.frombuffer(pcm, "<i2").reshape(-1, 2)
                assert (got.astype(np.int64) == st).all(), mode
    # reserved channel assignment (11) is corrupt, not gated: patch
    # the frame header's 4-bit ch_code field (bits 24..27 of the
    # frame) from mid_side (10) to 11 and re-CRC nothing — the
    # decoder must refuse before any CRC pass completes
    flac = bytearray(encode_flac_pcm16(edges, channel_mode="mid_side",
                                       blocksize=64))
    # frame starts right after the STREAMINFO block: 4 + 4 + 34
    fstart = 42
    assert flac[fstart] == 0xFF and flac[fstart + 1] & 0xFC == 0xF8
    flac[fstart + 3] = (flac[fstart + 3] & 0x0F) | (11 << 4)
    with pytest.raises(ValueError, match="reserved channel|CRC"):
        decode_flac_pcm16(bytes(flac))


def test_pcm_frame_energy_mixes_stereo_flac(spark):
    """The frame-energy pass mono-mixes decoded stereo FLAC with the
    exact integer channel mean — identical rows for the same logical
    signal shipped decorrelated and as plain mono."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_flac_pcm16,
        pcm_frame_energy,
    )

    rng = np.random.RandomState(13)
    left = rng.randint(-8000, 8000, 640).astype(np.int64)
    right = left + rng.randint(0, 500, 640)  # sums may be odd
    mono = (left + right) // 2
    stereo = encode_flac_pcm16(np.stack([left, right], axis=1),
                               rate=8000, channel_mode="mid_side")
    plain = encode_flac_pcm16(mono, rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(stereo)), (2, bytearray(plain))],
        "media_id long, content binary")
    rows = pcm_frame_energy(df, frame_ms=20).collect()
    a = sorted((r["frame_no"], r["n_samples"], r["rms"])
               for r in rows if r["media_id"] == 1)
    b = sorted((r["frame_no"], r["n_samples"], r["rms"])
               for r in rows if r["media_id"] == 2)
    assert a == b and len(a) == 4


def test_tiff_lzw_round_trips_and_taxonomy():
    """TIFF LZW (r8): MSB-first variable-width codes with the
    EarlyChange schedule on both sides, KwKwK, the 12-bit
    table-overflow Clear, Predictor 2 horizontal differencing — and
    loud failure for truncation, range violations and the gated float
    predictor."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff_pixels,
        encode_tiff_gray,
    )

    rng = np.random.RandomState(5)
    # width growth 9->10->11->12 and the overflow Clear need >3835
    # table entries; repetitive data crosses every boundary
    for n in (1, 17, 300, 20000):
        data = bytes(rng.randint(0, 40, n).astype(np.uint8))
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), n) == data
    # incompressible data exercises the raw 12/9 expansion path
    data = bytes(rng.randint(0, 256, 6000).astype(np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), 6000) == data
    # KwKwK: code == next_code
    data = b"ababababababababab"
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data

    # container: LZW x predictor x byte order x polarity
    for be in (False, True):
        for wiz in (False, True):
            for pred in (False, True):
                px = bytes(rng.randint(0, 256, 23 * 9).astype(np.uint8))
                t = encode_tiff_gray(px, 23, lzw=True, big_endian=be,
                                     white_is_zero=wiz, predictor=pred)
                assert decode_tiff_pixels(t) == (23, 9, 1, px)

    enc = _tiff_lzw_encode(b"some stream without its tail")
    with pytest.raises(ValueError, match="without EOI"):
        _tiff_lzw_decode(enc[:-2], 29)
    with pytest.raises(ValueError, match="exceeds strip size"):
        _tiff_lzw_decode(enc, 5)
    # gated: float predictor (3)
    t = bytearray(encode_tiff_gray(bytes(range(30)), 10,
                                   predictor=True))
    i = t.find((317).to_bytes(2, "little"))
    t[i + 8] = 3
    with pytest.raises(NotImplementedError, match="float"):
        decode_tiff_pixels(bytes(t))


def test_tiff_deflate_round_trips():
    """TIFF Deflate (Compression 8 — stdlib zlib; legacy 32946 reads
    the same streams): round trips with and without Predictor 2,
    both byte orders; corrupt zlib data and declared-length
    violations are loud."""
    import struct

    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_gray,
    )

    rng = np.random.RandomState(6)
    px = bytes(rng.randint(0, 256, 23 * 9).astype(np.uint8))
    for be in (False, True):
        for pred in (False, True):
            t = encode_tiff_gray(px, 23, deflate=True, big_endian=be,
                                 predictor=pred)
            assert decode_tiff_pixels(t) == (23, 9, 1, px)
    # legacy tag 32946 decodes identically: patch compression value
    t = bytearray(encode_tiff_gray(px, 23, deflate=True))
    i = t.index(struct.pack("<HH", 259, 3))
    # value slot is 2 bytes at i+8 but 32946 needs the full SHORT
    struct.pack_into("<H", t, i + 8, 32946)
    assert decode_tiff_pixels(bytes(t)) == (23, 9, 1, px)
    # corrupt zlib stream: flip a byte inside the first strip
    bad = bytearray(encode_tiff_gray(px, 23, deflate=True))
    bad[12] ^= 0xFF
    with pytest.raises(ValueError,
                       match="deflate strip corrupt|length mismatch"):
        decode_tiff_pixels(bytes(bad))
    # deflate of the WRONG length: valid zlib, wrong pixel count
    import zlib
    short = encode_tiff_gray(px[:23 * 4], 23, rows_per_strip=99)
    sb = bytearray(short)
    i = sb.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", sb, i + 8, 8)
    comp = zlib.compress(px[:23 * 3])  # 3 rows where 4 are declared
    # splice: rebuild is easier — encode 4 rows uncompressed, then
    # declare deflate and overwrite the strip with a 3-row stream;
    # byte counts shrink, so just assert the mismatch taxonomy fires
    if len(comp) <= 23 * 4:
        sb[8:8 + len(comp)] = comp
        i = sb.index(struct.pack("<HH", 279, 4))
        struct.pack_into("<I", sb, i + 8, len(comp))
        with pytest.raises(ValueError,
                           match="length mismatch|corrupt"):
            decode_tiff_pixels(bytes(sb))


def test_bmp_bitfields_round_trips_and_defaults():
    """16/32-bit bitfield BMPs (r8): 565/555/8888 and swapped-order
    masks round-trip RAW stored levels; the 16-bpp comp-0 default is
    555; channel-overflow and >8-bit channels are loud."""
    import numpy as np

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_bitfields,
    )

    rng = np.random.RandomState(8)
    h, w = 5, 9
    ch565 = np.stack([rng.randint(0, 32, (h, w)),
                      rng.randint(0, 64, (h, w)),
                      rng.randint(0, 32, (h, w))], axis=2)
    t = encode_bmp_bitfields(ch565, (0xF800, 0x07E0, 0x001F), 16)
    got = decode_bmp_pixels(t)
    assert got[:3] == (w, h, 3)
    assert (np.frombuffer(got[3], np.uint8)
            .reshape(h, w, 3) == ch565).all()
    # comp-0 16 bpp: implicit 555 masks, no mask table in the file
    ch555 = np.minimum(ch565, 31)
    t0 = encode_bmp_bitfields(ch555, (0x7C00, 0x03E0, 0x001F), 16,
                              explicit=False)
    assert len(t0) < len(t)  # 12 bytes shorter: no mask table
    got = decode_bmp_pixels(t0)
    assert (np.frombuffer(got[3], np.uint8)
            .reshape(h, w, 3) == ch555).all()
    # encoder refuses overflowing levels
    with pytest.raises(ValueError, match="exceeds"):
        encode_bmp_bitfields(ch565 + 32, (0xF800, 0x07E0, 0x001F), 16)


def test_tiff_deflate_trailing_garbage_is_loud():
    """Review finding r9: a strip whose zlib stream inflates to
    exactly the expected bytes but is followed by trailing garbage
    inside the declared StripByteCounts must raise, matching the loud
    length taxonomy of the other compressions (d.unused_data)."""
    import struct
    import zlib

    from sunat_rree_demo_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_gray,
    )

    px = (b"abcdabcdefef" * 20)[:23 * 9]
    sb = bytearray(encode_tiff_gray(px, 23, rows_per_strip=99))
    i = sb.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", sb, i + 8, 8)  # declare Deflate
    comp = zlib.compress(px) + b"!trailing-garbage"
    assert len(comp) <= 23 * 9  # fits inside the uncompressed slot
    sb[8:8 + len(comp)] = comp
    i = sb.index(struct.pack("<HH", 279, 4))
    struct.pack_into("<I", sb, i + 8, len(comp))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_tiff_pixels(bytes(sb))


def test_ima_adpcm_roundtrip_and_taxonomy():
    """r11: tag-0x11 mono IMA ADPCM decodes through the shared WAV
    sample map; the decode must equal the reference state-machine
    simulation exactly, stereo is gated, torn blocks and wild step
    indexes raise ValueError."""
    import struct

    import numpy as np
    import pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        _ima_adpcm_decode_block,
        _ima_adpcm_step,
        _wav_pcm16_data,
        encode_wav_ima_adpcm,
    )

    codes = np.array([3, 7, 12, 0, 15, 8, 1, 4, 9, 2, 14, 5],
                     dtype=np.int64)
    rate, ch, pcm = _wav_pcm16_data(encode_wav_ima_adpcm(codes, 8000))
    assert (rate, ch) == (8000, 1)
    pred, idx, ref = 0, 0, [0]
    for c in codes:
        pred, idx = _ima_adpcm_step(pred, idx, int(c))
        ref.append(pred)
    assert np.frombuffer(pcm, "<i2").tolist() == ref

    # multi-block decode: two hand-built blocks, the second's header
    # restarts the predictor — real IMA WAV semantics
    blk = struct.pack("<hBB", 100, 4, 0) + bytes([0x21])  # 2 codes
    b2 = struct.pack("<hBB", -7, 0, 0) + bytes([0x08])
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, len(blk), 4, 2, 3)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(blk) + len(b2)) + blk + b2)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _r, _c, pcm2 = _wav_pcm16_data(payload)
    got = np.frombuffer(pcm2, "<i2").tolist()
    assert got[0] == 100 and got[3] == -7 and len(got) == 6

    with pytest.raises(ValueError):
        _ima_adpcm_decode_block(b"\x00\x00", 2)          # torn header
    with pytest.raises(ValueError):
        _ima_adpcm_decode_block(
            struct.pack("<hBB", 0, 89, 0) + b"\x00", 2)  # step idx > 88
    with pytest.raises(ValueError):
        _ima_adpcm_decode_block(
            struct.pack("<hBB", 0, 0, 0), 2)             # nibbles exhausted
    stereo = bytearray(encode_wav_ima_adpcm(codes, 8000))
    i = stereo.index(b"fmt ") + 8
    stereo[i + 2:i + 4] = struct.pack("<H", 2)           # channels = 2
    with pytest.raises(NotImplementedError):
        _wav_pcm16_data(bytes(stereo))
