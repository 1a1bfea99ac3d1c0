"""Baseline-JPEG codec: DC-only exactness (the q201 oracle device),
general-coefficient entropy round trip vs an independent IDCT, restart
markers, odd-dimension crop, a hand-assembled color image pinning the
YCbCr path, and the honesty gates (progressive/subsampled/corrupt)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sunat_rree_demo_spark.operators.multimodal import (
    _idct_matrix,
    decode_jpeg_pixels,
    encode_jpeg_coeff_blocks,
    encode_jpeg_gray_blocks,
)


def _ref_pixels(blocks: np.ndarray, blocks_per_row: int) -> np.ndarray:
    """Independent dequant(1)+IDCT+level-shift reference. floor(x+0.5)
    is the decoder's DOCUMENTED rounding rule (r8 — chosen so the q209
    SQL oracle can reproduce it); the reference must pin the same rule
    or a decoder flip back to np.round would slip through whenever the
    test's IDCT outputs avoid exact .5."""
    a = _idct_matrix()
    px = np.einsum("ux,nuv,vy->nxy", a,
                   blocks.reshape(-1, 8, 8).astype(np.float64), a)
    px = np.clip(np.floor(px + 0.5) + 128, 0, 255).astype(np.uint8)
    by = len(blocks) // blocks_per_row
    return (px.reshape(by, blocks_per_row, 8, 8)
            .transpose(0, 2, 1, 3).reshape(by * 8, blocks_per_row * 8))


def test_dc_only_round_trip_is_exact():
    """Every printable byte value must come back as 64 identical
    pixels — the lossless corner of the lossy format q201 rides."""
    vals = bytes(range(32, 127)) + bytes([32])  # 96 = 6 rows of 16
    w, h, ch, px = decode_jpeg_pixels(encode_jpeg_gray_blocks(vals, 16))
    assert (w, h, ch) == (128, 48, 1)
    arr = np.frombuffer(px, np.uint8).reshape(h, w)
    blocks = (arr.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 64))
    assert (blocks == np.frombuffer(vals, np.uint8)[:, None]).all()


def test_general_coefficients_restarts_and_zrl():
    """Sparse random AC content (sign extension, zero runs, ZRL, EOB)
    through restart intervals decodes to exactly the reference IDCT —
    the entropy layer is lossless, so any pixel diff is a decode bug."""
    rng = np.random.RandomState(7)
    n = 24
    blocks = rng.randint(-80, 81, size=(n, 64)).astype(np.int64)
    blocks[rng.rand(n, 64) < 0.6] = 0
    blocks[:, 0] = rng.randint(-700, 701, n)
    blocks[3, 1:] = 0          # DC-only block mid-stream
    blocks[5, 1:63] = 0        # forces a long zero run + ZRL
    blocks[5, 63] = 9
    img = encode_jpeg_coeff_blocks(blocks, 8, restart_interval=5)
    assert b"\xff\xdd" in img and b"\xff\xd0" in img  # DRI + RST0 real
    w, h, ch, px = decode_jpeg_pixels(img)
    assert (w, h, ch) == (64, 24, 1)
    got = np.frombuffer(px, np.uint8).reshape(h, w)
    assert (got == _ref_pixels(blocks, 8)).all()


def test_odd_dimensions_crop():
    """Declared WxH smaller than the MCU grid: decoder must crop the
    padding rows/cols (the spec's right/bottom-edge rule)."""
    blocks = np.zeros((4, 64), np.int64)
    blocks[:, 0] = [8 * (v - 128) for v in (40, 90, 140, 190)]
    img = encode_jpeg_coeff_blocks(blocks, 2, width=12, height=13)
    w, h, ch, px = decode_jpeg_pixels(img)
    assert (w, h, ch) == (12, 13, 1)
    arr = np.frombuffer(px, np.uint8).reshape(h, w)
    assert (arr[:8, :8] == 40).all() and (arr[:8, 8:] == 90).all()
    assert (arr[8:, :8] == 140).all() and (arr[8:, 8:] == 190).all()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def test_color_ycbcr_conversion():
    """Hand-assembled 3-component 4:4:4 DC-only JPEG (one MCU,
    interleaved Y/Cb/Cr blocks, per-component DC predictors): the
    decoded RGB must equal the JFIF conversion of the stored planes."""
    y, cb, cr = 120, 60, 200

    # canonical 5-bit DC table over categories 0..11; 2-bit AC EOB
    dc_payload = bytes([0, 0, 0, 0, 12] + [0] * 11) + bytes(range(12))
    ac_payload = bytes([0, 1] + [0] * 14) + b"\x00"

    bits = []

    def put(v: int, ln: int) -> None:
        bits.extend(((v >> i) & 1) for i in range(ln - 1, -1, -1))

    for val in (y, cb, cr):  # interleaved MCU, each pred starts at 0
        diff = 8 * (val - 128)
        size = abs(diff).bit_length()
        put(size, 5)  # canonical code for category c is c itself here
        put(diff if diff > 0 else diff + (1 << size) - 1, size)
        put(0, 2)     # AC EOB
    while len(bits) % 8:
        bits.append(1)
    data = bytes(int("".join(map(str, bits[i:i + 8])), 2)
                 for i in range(0, len(bits), 8))
    assert 0xFF not in data  # no stuffing needed for this content

    img = (b"\xff\xd8"
           + _seg(0xFFDB, b"\x00" + bytes([1] * 64))
           + _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 3)
                  + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
           + _seg(0xFFC4, b"\x00" + dc_payload)
           + _seg(0xFFC4, b"\x10" + ac_payload)
           + _seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00])
                  + b"\x00\x3f\x00")
           + data + b"\xff\xd9")
    w, h, ch, px = decode_jpeg_pixels(img)
    assert (w, h, ch) == (8, 8, 3)
    got = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    r = np.clip(round(y + 1.402 * (cr - 128)), 0, 255)
    g = np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
                0, 255)
    b = np.clip(round(y + 1.772 * (cb - 128)), 0, 255)
    assert (got == np.array([r, g, b], np.uint8)).all()


def _rgb_ref(y, cb, cr):
    """The decoder's documented YCbCr→RGB: floor(x+0.5), clip —
    chosen over np.round so the q209 oracle can reproduce it in SQL."""
    r = np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255)
    g = np.clip(np.floor(y - 0.344136 * (cb - 128)
                         - 0.714136 * (cr - 128) + 0.5), 0, 255)
    b = np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("samp", [(2, 2), (2, 1), (1, 2)])
def test_color_dc_only_subsampled_exact(samp):
    """4:2:0 / 4:2:2 / 4:4:0 DC-only color: every MCU must decode to a
    uniform patch whose RGB is exactly the conversion of its three
    stored bytes — uniform blocks + replication upsampling are the
    lossless corner the q209 oracle rides."""
    hs, vs = samp
    n, mpr = 12, 4
    rng = np.random.RandomState(42)
    yv = rng.randint(0, 256, n).astype(np.uint8).tobytes()
    cbv = rng.randint(0, 256, n).astype(np.uint8).tobytes()
    crv = rng.randint(0, 256, n).astype(np.uint8).tobytes()
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_color_dc_mcus,
    )

    img = encode_jpeg_color_dc_mcus(yv, cbv, crv, mpr, samp=samp)
    w, h, ch, px = decode_jpeg_pixels(img)
    assert (w, h, ch) == (mpr * 8 * hs, (n // mpr) * 8 * vs, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    pw, ph = 8 * hs, 8 * vs  # MCU patch size
    for i in range(n):
        my, mx = divmod(i, mpr)
        patch = got[my * ph:(my + 1) * ph, mx * pw:(mx + 1) * pw]
        exp = _rgb_ref(np.float64(yv[i]), np.float64(cbv[i]),
                       np.float64(crv[i]))
        assert (patch == exp).all(), f"MCU {i} ({yv[i]},{cbv[i]},{crv[i]})"


def test_color_420_general_coefficients_and_restarts():
    """Random AC content through the interleaved 4:2:0 scan with
    restart markers: compare against an independent plane pipeline
    (einsum IDCT → raster assembly → crop → replicate-upsample →
    floor-convert). Catches MCU block-ordering slips the DC-only
    uniform test can't see."""
    rng = np.random.RandomState(11)
    mcus_x, mcus_y = 3, 2
    w, h = mcus_x * 16 - 5, mcus_y * 16 - 3  # odd dims: crop matters

    def rand_blocks(n):
        b = rng.randint(-60, 61, size=(n, 64)).astype(np.int64)
        b[rng.rand(n, 64) < 0.7] = 0
        b[:, 0] = rng.randint(-500, 501, n)
        return b

    yb = rand_blocks(mcus_x * mcus_y * 4)
    cbb = rand_blocks(mcus_x * mcus_y)
    crb = rand_blocks(mcus_x * mcus_y)
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_components,
    )

    img = encode_jpeg_components(
        [(yb, 2, 2), (cbb, 1, 1), (crb, 1, 1)], mcus_x,
        width=w, height=h, restart_interval=2)
    assert b"\xff\xdd" in img and b"\xff\xd0" in img
    gw, gh, ch, px = decode_jpeg_pixels(img)
    assert (gw, gh, ch) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)

    a = _idct_matrix()

    def plane(blocks, hs, vs):
        p = np.einsum("ux,nuv,vy->nxy", a,
                      blocks.reshape(-1, 8, 8).astype(np.float64), a)
        p = np.clip(np.floor(p + 0.5) + 128, 0, 255)
        bx, by = mcus_x * hs, mcus_y * vs
        p = (p.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
             .reshape(by * 8, bx * 8))
        cw, chh = -(-w * hs // 2), -(-h * vs // 2)
        p = p[:chh, :cw]
        p = np.repeat(np.repeat(p, 2 // hs, axis=1), 2 // vs, axis=0)
        return p[:h, :w]

    exp = _rgb_ref(plane(yb, 2, 2), plane(cbb, 1, 1), plane(crb, 1, 1))
    assert (got == exp).all()


def test_color_444_via_components_matches_handmade_path():
    """encode_jpeg_components at all-1x1 color must agree with the
    hand-assembled 4:4:4 image device (same decoder output for the
    same stored planes)."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_color_dc_mcus,
    )

    img = encode_jpeg_color_dc_mcus(b"\x78", b"\x3c", b"\xc8", 1,
                                    samp=(1, 1))
    w, h, ch, px = decode_jpeg_pixels(img)
    assert (w, h, ch) == (8, 8, 3)
    got = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    exp = _rgb_ref(np.float64(120), np.float64(60), np.float64(200))
    assert (got == exp).all()


def test_gates_and_robustness():
    vals = bytes([65] * 16)
    img = encode_jpeg_gray_blocks(vals, 16)

    assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\nxxxx") is None
    assert decode_jpeg_pixels(b"") is None

    # flipping a BASELINE stream's SOF marker to SOF2 yields a LYING
    # stream (its single scan claims the full spectral band, illegal
    # for progressive) — fails loud as corrupt, since r8 made real
    # progressive streams decodable
    prog = bytearray(img)
    i = img.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(prog))

    ext = bytearray(img)
    ext[i + 1] = 0xC1  # extended sequential: still honestly gated
    with pytest.raises(NotImplementedError, match="extended"):
        decode_jpeg_pixels(bytes(ext))

    # a single-COMPONENT frame ignores declared sampling factors
    # (T.81 A.2.2: Hi/Hmax = 1) — r8, where multi-component
    # subsampling became a real decode path
    sub = bytearray(img)
    sub[i + 11] = 0x22  # comp 0 sampling factors -> 2x2
    assert decode_jpeg_pixels(bytes(sub))[3] == decode_jpeg_pixels(img)[3]

    # multi-component factors OUTSIDE 1..2 (e.g. 4:1:1's 4x1) stay
    # honestly gated
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_color_dc_mcus,
    )

    color = encode_jpeg_color_dc_mcus(b"\x40", b"\x80", b"\x80", 1)
    j = color.index(b"\xff\xc0")
    wide = bytearray(color)
    wide[j + 11] = 0x41  # Y sampling -> 4x1
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg_pixels(bytes(wide))

    with pytest.raises(ValueError):
        decode_jpeg_pixels(img[:len(img) // 2])  # truncated entropy data

    # wrong-order garbage: entropy bytes where a marker must be
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8" + b"\x00\x01\x02\x03" + img[2:])


def test_image_pixel_stats_routes_png_and_jpeg(spark):
    """Mixed media batch: PNG rows decode via the PNG path, JPEGs via
    the JPEG path, anything else yields null stats — one operator, one
    schema (the multimodal routing contract)."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_png_gray,
        image_pixel_stats,
    )

    png = encode_png_gray(bytes([10, 20, 30, 40]), 2)
    jpg = encode_jpeg_gray_blocks(bytes([50, 70] * 8), 16)
    rows = [(1, bytearray(png)), (2, bytearray(jpg)), (3, b"not media")]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in image_pixel_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].n_samples,
            got[1].sum_val) == (2, 2, 4, 100)
    assert (got[2].width, got[2].height, got[2].n_samples) \
        == (128, 8, 1024)
    assert got[2].sum_val == 64 * (50 + 70) * 8
    assert got[2].min_val == 50 and got[2].max_val == 70
    assert got[3].width is None and got[3].sum_val is None


def test_entropy_segment_cut_excludes_fill_run():
    """A fill-byte run before an in-scan RST/EOI must be cut at the
    FIRST fill 0xFF — no fill byte may leak into a segment as phantom
    trailing bits (review finding r7)."""
    from sunat_rree_demo_spark.operators.multimodal import (
        _entropy_segments,
    )

    payload = b"AB\xff\xff\xff\xd0CD\xff\xff\xd9"
    assert _entropy_segments(payload, 0) == [b"AB", b"CD"]
    # stuffed 0xFF00 stays in the raw segment; a fill run after it
    # still cuts clean
    payload2 = b"A\xff\x00B\xff\xff\xff\xff\xd9"
    assert _entropy_segments(payload2, 0) == [b"A\xff\x00B"]


def test_pixel_stats_degrade_gated_variants(spark):
    """A mixed crawl batch with one extended-sequential JPEG (gated)
    must yield a null-stats row for it, not abort the aggregate job
    (review finding r7) — while decodable siblings in the same batch
    still get real stats. Since r10 a WELL-FORMED 16-bit PNG is one of
    those decodable siblings (native-grain stats, bit_depth=16); a
    depth-byte-flipped 8-bit PNG is now CORRUPT (declared 16-bit over
    8-bit-sized data) and must raise loudly, per the taxonomy."""
    import pytest as _pytest

    from sunat_rree_demo_spark.operators.multimodal import (
        encode_png_gray,
        image_pixel_stats,
    )

    good = encode_jpeg_gray_blocks(bytes([90] * 16), 16)
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC1  # SOF1 extended (gated)
    png16 = encode_png_gray([257, 2 * 257, 3 * 257, 4 * 257], 2,
                            depth=16)
    rows = [(1, bytearray(good)), (2, prog), (3, bytearray(png16))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in image_pixel_stats(media).collect()}
    assert got[1].n_samples == 1024 and got[1].sum_val == 1024 * 90
    assert got[1].bit_depth == 8
    assert got[2].width is None and got[2].n_samples is None
    assert got[2].bit_depth is None
    assert (got[3].n_samples, got[3].sum_val, got[3].bit_depth) \
        == (4, 10 * 257, 16)

    corrupt = bytearray(encode_png_gray(bytes([1, 2, 3, 4]), 2))
    corrupt[24] = 16  # IHDR says 16-bit over 8-bit-sized IDAT
    bad = spark.createDataFrame([(9, corrupt)],
                                "media_id long, content binary")
    with _pytest.raises(Exception, match="length mismatch"):
        image_pixel_stats(bad).collect()


def test_fill_bytes_before_markers_accepted():
    """JPEG B.1.1.2 allows any number of 0xFF fill bytes before a
    marker (review finding r7: the segment walk misparsed them as a
    marker named 0xFF and read garbage lengths)."""
    vals = bytes([60, 200] * 8)
    img = encode_jpeg_gray_blocks(vals, 16)
    i = img.index(b"\xff\xdb")
    padded = img[:i] + b"\xff\xff\xff" + img[i:]
    w, h, ch, px = decode_jpeg_pixels(padded)
    assert (w, h, ch) == (128, 8, 1)
    assert decode_jpeg_pixels(img)[3] == px


# ------------------------------------------------------------- progressive
def test_progressive_grayscale_matches_baseline():
    """Progressive (SOF2) decode must produce EXACTLY the pixels the
    baseline pipeline produces for the same quantized blocks: both
    entropy layers are lossless, so the full scan script (interleaved
    DC first, two spectral AC bands, successive-approximation DC and
    AC refinements with EOBRUN + correction bits) must reconstruct
    the coefficients bit-for-bit."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(21)
    n = 24
    blocks = rng.randint(-90, 91, size=(n, 64)).astype(np.int64)
    blocks[rng.rand(n, 64) < 0.55] = 0
    blocks[:, 0] = rng.randint(-800, 801, n)
    blocks[4, 1:] = 0           # DC-only block (pure EOBRUN member)
    blocks[7, 1:62] = 0         # long zero run crossing both bands
    blocks[7, 62] = 1           # newly-nonzero only at the last bit
    blocks[9, 1:] = 0
    blocks[9, 5] = -1           # refinement-scan-only coefficient

    base = decode_jpeg_pixels(encode_jpeg_coeff_blocks(blocks, 8))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(
        [(blocks, 1, 1)], 8))
    assert prog[:3] == base[:3] == (64, 24, 1)
    assert prog[3] == base[3]


def test_progressive_color_420_matches_baseline():
    """The same cross-check for 4:2:0 color: interleaved DC scans over
    subsampled components, per-component non-interleaved AC scans on
    each component's OWN ceil grid, odd crop dims."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_components,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    mcus_x, mcus_y = 3, 2
    w, h = mcus_x * 16 - 7, mcus_y * 16 - 2

    def rand_blocks(n):
        b = rng.randint(-70, 71, size=(n, 64)).astype(np.int64)
        b[rng.rand(n, 64) < 0.7] = 0
        b[:, 0] = rng.randint(-600, 601, n)
        return b

    comps = [(rand_blocks(mcus_x * mcus_y * 4), 2, 2),
             (rand_blocks(mcus_x * mcus_y), 1, 1),
             (rand_blocks(mcus_x * mcus_y), 1, 1)]
    base = decode_jpeg_pixels(encode_jpeg_components(
        comps, mcus_x, width=w, height=h))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(
        comps, mcus_x, width=w, height=h))
    assert prog[:3] == base[:3] == (w, h, 3)
    assert prog[3] == base[3]


def test_progressive_deeper_approximation_and_sparse():
    """al=2 (two refinement rounds per band) over a sparse matrix —
    exercises repeated correction-bit passes where |v|>>Al crosses
    1 on different scans — and an all-zero-AC image (pure EOBRUN
    everywhere)."""
    from sunat_rree_demo_spark.operators.multimodal import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(13)
    n = 16
    blocks = rng.randint(-7, 8, size=(n, 64)).astype(np.int64)
    blocks[rng.rand(n, 64) < 0.8] = 0
    blocks[:, 0] = rng.randint(-100, 101, n)
    base = decode_jpeg_pixels(encode_jpeg_coeff_blocks(blocks, 4))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(
        [(blocks, 1, 1)], 4, al=2))
    assert prog[3] == base[3]

    dconly = np.zeros((8, 64), np.int64)
    dconly[:, 0] = [8 * (v - 128) for v in range(40, 200, 20)]
    base = decode_jpeg_pixels(encode_jpeg_coeff_blocks(dconly, 4))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(
        [(dconly, 1, 1)], 4))
    assert prog[3] == base[3]
