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


def test_decode_media_real_codec_is_stubbed(media):
    from sunat_rree_demo_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(media, real_codec=True)


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
