"""Baseline JPEG codec (llm/jpeg.py) — spec-conformance + determinism.

No reference JPEG implementation exists in this container (no
PIL/libjpeg/ffmpeg), so the evidence is: analytic fixtures whose
correct decode is computable by hand from ITU-T T.81 (uniform blocks,
DC-only math), round-trip closeness at every supported layout (4:4:4 /
4:2:0 / grayscale / restart markers), byte-level marker structure
checks, pinned fixture hashes (decode is a frozen pure function), and
loud rejection of the unsupported T.81 modes.
"""

import hashlib

import numpy as np
import pytest

from doin_fine_ance__spark.llm.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    _canonical_codes,
    _quality_scaled,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(y * 3 + x * 2, 0, 255),
            np.clip(128 + y, 0, 255),
            np.clip(60 + x * 2, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


def test_uniform_images_decode_exactly():
    """A constant image has only a DC coefficient; quantize/dequantize
    of the DC round-trips the level exactly for any value (T.81 A.3 —
    the analytic case a hand calculation verifies)."""
    for v in (0, 1, 77, 128, 254, 255):
        u = np.full((8, 8, 3), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(u, quality=85)), u)
    # non-8-multiple size: edge padding must not bleed into the crop
    u = np.full((5, 11, 3), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(u)), u)


def test_round_trip_close_at_every_layout():
    img = _smooth(37, 53)
    for kw in (
        {},
        {"subsampling": "420"},
        {"restart_interval": 2},
        {"subsampling": "420", "restart_interval": 3},
    ):
        data = encode_jpeg(img, quality=90, **kw)
        dec = decode_jpeg(data)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 12, (kw, int(err.max()))
        assert err.mean() <= 3.0, (kw, float(err.mean()))


def test_grayscale_single_component_scan():
    g = np.clip(np.add.outer(np.arange(21) * 7, np.arange(33) * 3), 0, 255).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == (21, 33, 3)
    # all three output channels replicate luma
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    err = np.abs(dec[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 12 and err.mean() <= 3.0


def test_encode_is_deterministic_and_decode_is_pure():
    img = _smooth(24, 40)
    b1, b2 = encode_jpeg(img, quality=75), encode_jpeg(img, quality=75)
    assert b1 == b2
    d1, d2 = decode_jpeg(b1), decode_jpeg(b1)
    assert np.array_equal(d1, d2)


def test_pinned_fixture_hashes():
    """Frozen evidence: the encoder's bytes and the decoder's pixels
    for a fixed input must never drift (any change to DCT/quant/
    Huffman/upsampling shows up here first)."""
    img = _smooth(16, 16)
    data = encode_jpeg(img, quality=80, subsampling="420")
    dec = decode_jpeg(data)
    enc_md5 = hashlib.md5(data).hexdigest()
    dec_md5 = hashlib.md5(dec.tobytes()).hexdigest()
    assert (enc_md5, dec_md5) == (
        hashlib.md5(encode_jpeg(img, quality=80, subsampling="420")).hexdigest(),
        hashlib.md5(decode_jpeg(data).tobytes()).hexdigest(),
    )
    # regenerate with: python -c "import tests.test_jpeg as t; t._print_pins()"
    assert enc_md5 == PINNED_ENC_MD5, enc_md5
    assert dec_md5 == PINNED_DEC_MD5, dec_md5


PINNED_ENC_MD5 = "f07ce6e3b0f899fb7755be9aac13e589"
# decoder pin regenerated in r11: the dequantize step mixed zigzag
# coefficients with the raster-ordered quant table (AC cells scaled by
# the wrong entry); the encoder pin is unchanged — only decode moved.
PINNED_DEC_MD5 = "0ae04bda15227ae8839766a862ce2060"


def _print_pins():
    img = _smooth(16, 16)
    data = encode_jpeg(img, quality=80, subsampling="420")
    print(hashlib.md5(data).hexdigest())
    print(hashlib.md5(decode_jpeg(data).tobytes()).hexdigest())


def test_marker_structure():
    """Byte-level JFIF conformance of the emitted stream: SOI, APP0
    with the JFIF tag, two DQTs, SOF0 with 3 components, four DHTs,
    SOS, EOI — everything a foreign baseline decoder needs, in order."""
    data = encode_jpeg(_smooth(8, 8), quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    markers = []
    pos = 2
    while pos < len(data) - 1:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        markers.append(m)
        if m == 0xDA:
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        pos += 2 + seglen
    assert markers.count(0xDB) == 2  # two quant tables
    assert markers.count(0xC4) == 4  # four Huffman tables
    assert 0xC0 in markers and markers[-1] == 0xDA
    # DRI appears iff restart_interval is set
    with_dri = encode_jpeg(_smooth(24, 24), restart_interval=1)
    assert b"\xff\xdd" in with_dri
    assert b"\xff\xd0" in with_dri  # at least one RST0


def test_byte_stuffing_round_trip():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still round-trip (stuffed 0xFF00 never parses as a marker)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=95)
    stuffed = sum(
        1 for i in range(len(data) - 1)
        if data[i] == 0xFF and data[i + 1] == 0x00
    )
    assert stuffed > 0  # precondition: stuffing actually occurred
    dec = decode_jpeg(data)
    assert dec.shape == img.shape


def test_unsupported_modes_raise_loudly():
    base = encode_jpeg(_smooth(8, 8))
    # lossless sequential: flip SOF0 (FFC0) to SOF3 (FFC3)
    lossless = base.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(lossless)
    # a BASELINE scan mislabeled as progressive (SOF2) is corrupt —
    # a full-band Ss=0..Se=63 scan is illegal in progressive mode
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(_smooth(8, 8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_smooth(8, 8), subsampling="422")


def test_quality_scaling_formula():
    """quality=50 is the unscaled Annex-K table; quality=100 is all
    ones (lossless quantization); lower quality → coarser steps."""
    assert list(_quality_scaled(QUANT_LUMA, 50)) == QUANT_LUMA
    assert set(_quality_scaled(QUANT_LUMA, 100).tolist()) == {1}
    q10, q90 = _quality_scaled(QUANT_LUMA, 10), _quality_scaled(QUANT_LUMA, 90)
    assert (q10 >= q90).all() and (q10 > q90).any()


def test_canonical_huffman_codes_prefix_free():
    codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(codes) == len(AC_LUMA_VALS)
    as_bits = {format(c, f"0{n}b") for c, n in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # spot-check the documented T.81 Figure-5 corners
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_resize_images_end_to_end_jpeg(spark):
    """The registry seam: JPEG rows flow through the distributed
    resize (decode → nearest resize → re-encode as JPEG) and decode
    back at the target size with content preserved within lossy
    tolerance."""
    from doin_fine_ance__spark.llm.multimodal import MEDIA_SCHEMA, resize_images

    imgs = {i: np.full((16, 16, 3), 30 + i * 40, np.uint8) for i in range(4)}
    rows = [
        (i, "image", "image/jpeg", 16, 16, None, encode_jpeg(a))
        for i, a in imgs.items()
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(media, 4, 4).collect()}
    assert set(out) == set(imgs)
    for i, r in out.items():
        assert (r.width, r.height) == (4, 4)
        arr = decode_jpeg(bytes(r.content))
        assert arr.shape == (4, 4, 3)
        err = np.abs(arr.astype(int) - int(30 + i * 40))
        assert err.max() <= 4  # uniform image: near-exact through 2 lossy hops


def test_image_ahash_over_jpeg(spark):
    """Perceptual hashing accepts JPEG payloads through the registry:
    a re-encoded (lossy) copy of an image hashes within a few bits of
    the original — the dedup property JPEG ingestion needs."""
    from doin_fine_ance__spark.llm.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash64,
    )

    # structured content (gradient + stripes): the perceptual-hash
    # shape JPEG preserves — random noise is exactly what lossy
    # coding deletes, so it is the wrong fixture here
    y, x = np.mgrid[0:24, 0:24]
    base = np.stack(
        [
            np.clip(y * 10, 0, 255),
            np.clip(x * 10, 0, 255),
            ((x // 4) % 2) * 200,
        ],
        axis=2,
    ).astype(np.uint8)
    jpg = decode_jpeg(encode_jpeg(base, quality=90))
    rows = [
        (1, "image", "image/png", 24, 24, None, encode_png(base)),
        (2, "image", "image/jpeg", 24, 24, None, encode_jpeg(base, quality=90)),
        (3, "image", "image/jpeg", 24, 24, None, encode_jpeg(jpg, quality=90)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    h = {r.media_id: r.ahash for r in image_ahash64(media).collect()}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[1], h[2]) <= 6
    assert ham(h[2], h[3]) <= 6


# ------------------------------------------------------------ progressive
#
# Progressive (SOF2) is a lossless re-arrangement of coefficient
# transmission: decode(progressive bytes) must equal decode(baseline
# bytes) PIXEL-FOR-PIXEL for ANY scan script, because both paths feed
# identical quantized coefficients into the same dequantize+IDCT. That
# equality is the oracle for every test here — far stronger than
# closeness thresholds.

from doin_fine_ance__spark.llm.jpeg import (  # noqa: E402
    _DEFAULT_SCAN_SCRIPT,
    encode_jpeg_progressive,
)


def _images(seed=5):
    rng = np.random.default_rng(seed)
    yield "noise", rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    yield "flat", np.full((48, 48, 3), 200, np.uint8)  # long EOB runs
    yield "smooth", _smooth(24, 40)
    stripes = (
        np.tile(np.array([0, 255], np.uint8).repeat(8)[:16], (32, 2))[:, :32]
    )
    yield "stripes", stripes[:, :, None].repeat(3, 2)  # high-freq AC


@pytest.mark.parametrize("quality,sub", [(85, "444"), (70, "420"), (95, "420")])
def test_progressive_equals_baseline_default_script(quality, sub):
    for label, img in _images():
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsampling=sub)
        )
        assert np.array_equal(base, prog), (label, quality, sub)


PURE_SPECTRAL = [
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 2, 0, 0), ((0,), 3, 8, 0, 0), ((0,), 9, 63, 0, 0),
    ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
]
DEEP_SA = [
    ((0, 1, 2), 0, 0, 0, 3),
    ((0, 1, 2), 0, 0, 3, 2), ((0, 1, 2), 0, 0, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
    ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 0, 2), ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 0, 1), ((2,), 1, 63, 1, 0),
]
NARROW_BANDS = [
    ((0, 1, 2), 0, 0, 0, 1), ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 1, 0, 1), ((0,), 2, 5, 0, 1),
    ((0,), 6, 20, 0, 1), ((0,), 21, 63, 0, 1),
    ((0,), 1, 1, 1, 0), ((0,), 2, 5, 1, 0),
    ((0,), 6, 20, 1, 0), ((0,), 21, 63, 1, 0),
    ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
]


@pytest.mark.parametrize(
    "script", [PURE_SPECTRAL, DEEP_SA, NARROW_BANDS],
    ids=["pure-spectral", "deep-sa", "narrow-bands"],
)
def test_progressive_equals_baseline_alt_scripts(script):
    """Spectral-selection-only, 4-level successive approximation, and
    narrow-band splits all reconstruct the identical pixels — the three
    script families exercise AC first/refine, EOB runs spanning many
    blocks, ZRL-in-refine, and per-scan DHT redefinition."""
    for label, img in _images(seed=11):
        base = decode_jpeg(encode_jpeg(img, quality=70))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=70, scan_script=script)
        )
        assert np.array_equal(base, prog), label


def test_progressive_grayscale_and_determinism():
    g = np.clip(
        np.add.outer(np.arange(21) * 7, np.arange(33) * 3), 0, 255
    ).astype(np.uint8)
    b1 = encode_jpeg_progressive(g, quality=80)
    assert b1 == encode_jpeg_progressive(g, quality=80)
    assert np.array_equal(decode_jpeg(b1), decode_jpeg(encode_jpeg(g, quality=80)))


def test_progressive_stream_structure():
    """SOF2 marker present, one SOS per scan-script entry, DHT
    redefined before every Huffman-coded scan (DC-refine scans carry
    raw bits only and need no table)."""
    img = _smooth(16, 16)
    data = encode_jpeg_progressive(img, quality=85)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    n_sos = data.count(b"\xff\xda")
    assert n_sos == len(_DEFAULT_SCAN_SCRIPT)
    # exactly one scan (the interleaved DC refine) has no DHT
    assert data.count(b"\xff\xc4") == n_sos - 1


def test_progressive_truncated_stream_raises_cleanly():
    img = _smooth(16, 16)
    data = encode_jpeg_progressive(img, quality=85)
    # cut mid-way through the scans: either a clean ValueError or a
    # partial-quality image is acceptable for a PREFIX of scans, but
    # never a crash with a non-ValueError
    for cut in (len(data) // 3, len(data) // 2, 2 * len(data) // 3):
        try:
            decode_jpeg(data[:cut])
        except ValueError:
            pass


def test_progressive_single_component_dc_scans_subsampled_unaligned():
    """Non-interleaved DC scans over a 4:2:0 non-MCU-aligned image
    (40x56: 16-px MCUs don't divide either axis) must walk the
    component's OWN block grid per T.81 A.2.2 — the encoder previously
    used the MCU-padded grid and silently desynced from the decoder
    (r11 ADVICE, reproduced maxdiff 24)."""
    per_component_dc = [
        ((0,), 0, 0, 0, 0), ((1,), 0, 0, 0, 0), ((2,), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
    ]
    # also with a DC successive-approximation split, still one component
    per_component_dc_sa = [
        ((0,), 0, 0, 0, 1), ((1,), 0, 0, 0, 1), ((2,), 0, 0, 0, 1),
        ((0,), 0, 0, 1, 0), ((1,), 0, 0, 1, 0), ((2,), 0, 0, 1, 0),
        ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
    ]
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=70, subsampling="420"))
    for script in (per_component_dc, per_component_dc_sa):
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=70, subsampling="420", scan_script=script
            )
        )
        assert np.array_equal(base, prog)


def test_progressive_corrupt_spectral_params_raise_cleanly():
    """A corrupt SOS with Se>63 or Ss>Se must raise the module's loud
    ValueError, not an IndexError from indexing past the 64-entry
    coefficient row (r11 ADVICE)."""
    img = _smooth(16, 16)
    script = [((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 0, 0),
              ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)]
    data = bytearray(
        encode_jpeg_progressive(img, quality=85, scan_script=script)
    )
    # locate the SECOND SOS (the luma AC scan): header is
    # ff da | len16 | ns | ns*(cid, tdta) | Ss Se AhAl
    sos_positions = []
    i = 0
    while True:
        i = data.find(b"\xff\xda", i)
        if i < 0:
            break
        sos_positions.append(i)
        i += 2
    assert len(sos_positions) == 4
    ac_sos = sos_positions[1]
    ns = data[ac_sos + 4]
    ss_off = ac_sos + 5 + 2 * ns
    assert (data[ss_off], data[ss_off + 1]) == (1, 63)
    for ss, se in ((1, 0xFF), (40, 20), (0xFF, 0xFF)):
        bad = bytes(data[:ss_off]) + bytes([ss, se]) + bytes(data[ss_off + 2:])
        with pytest.raises(ValueError, match="corrupt progressive scan"):
            decode_jpeg(bad)


def test_progressive_rejects_bad_scripts():
    img = _smooth(8, 8)
    with pytest.raises(ValueError, match="Ss=0 needs Se=0"):
        encode_jpeg_progressive(img, scan_script=[((0,), 0, 63, 0, 0)])
    with pytest.raises(ValueError, match="non-interleaved"):
        encode_jpeg_progressive(
            img, subsampling="420",
            scan_script=[((0, 1, 2), 0, 0, 0, 0), ((0, 1), 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="one bit plane"):
        encode_jpeg_progressive(
            img, scan_script=[((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 2, 0)]
        )


def test_decode_lut_matches_canonical_code_assignment():
    """The 16-bit-peek Huffman LUT (_decode_tables) assigns every
    canonical (length, code) pair's full 2^(16-len) entry range to the
    right symbol, and leaves non-code prefixes invalid — checked
    against the spec's C.2 construction for all four Annex-K tables."""
    from doin_fine_ance__spark.llm.jpeg import (
        AC_CHROMA_BITS,
        AC_CHROMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_CHROMA_BITS,
        DC_CHROMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _decode_tables,
    )

    for bits, vals in [
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        lut_len, lut_sym = _decode_tables(tuple(bits), tuple(vals))
        # canonical assignment (T.81 C.2), independent construction
        code, k, covered = 0, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                for probe in (lo, lo + (1 << (16 - length)) - 1):
                    assert lut_len[probe] == length
                    assert lut_sym[probe] == vals[k]
                covered += 1 << (16 - length)
                code += 1
                k += 1
            code <<= 1
        # everything not covered by a code must be invalid (len 0)
        assert sum(1 for v in lut_len if v == 0) == (1 << 16) - covered


def test_decode_invalid_huffman_code_raises():
    """A bitstream starting with a prefix no Annex-K code owns must
    raise the corrupt-entropy-stream error (LUT length 0 path)."""
    from doin_fine_ance__spark.llm.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitReader,
        _decode_tables,
        _read_huff,
    )

    tab = _decode_tables(tuple(DC_LUMA_BITS), tuple(DC_LUMA_VALS))
    with pytest.raises(ValueError, match="invalid JPEG Huffman code"):
        _read_huff(_BitReader(b"\xff\xff\xff"), tab)
