"""Pure JPEG codec (sources/jpeg.py), baseline + progressive.

JPEG is lossy, so round trips assert PSNR bounds rather than equality;
the codec internals (canonical Huffman assignment, DCT matrix, zigzag,
quality scaling) are checked against independent formulations so the
encoder and decoder cannot share a compensating bug, and progressive
streams must decode bit-identically to the baseline encoding of the
same image (same quantized coefficients, two independent scan
machineries).
"""

from __future__ import annotations

import numpy as np
import pytest

from xarray_dataaccessor_spark.sources.jpeg import (
    K1_LUMA,
    K3_AC_LUMA,
    K3_DC_LUMA,
    ZIGZAG,
    _build_huffman,
    _dct_matrix,
    _quality_scale,
    parse_jpeg,
    write_jpeg,
)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            128 + 80 * np.sin(yy / 7.0),
            128 + 70 * np.cos(xx / 8.0),
            128 + 50 * np.sin((xx + yy) / 10.0),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# component checks vs independent formulations
# ---------------------------------------------------------------------------


def test_huffman_canonical_assignment_known_codes():
    # Annex K.3.1 DC luminance: category 0 -> '00', 1 -> '010', ...,
    # 11 -> '111111110' (published canonical code table)
    _, enc = _build_huffman(*K3_DC_LUMA)
    assert enc[0] == (0b00, 2)
    assert enc[1] == (0b010, 3)
    assert enc[2] == (0b011, 3)
    assert enc[11] == (0b111111110, 9)
    # AC luminance: EOB (0x00) -> '1010' (4 bits), ZRL (0xF0) ->
    # '11111111001' (11 bits) — the two best-known codes in the spec
    _, ace = _build_huffman(*K3_AC_LUMA)
    assert ace[0x00] == (0b1010, 4)
    assert ace[0xF0] == (0b11111111001, 11)


def test_huffman_codes_are_prefix_free():
    dec, enc = _build_huffman(*K3_AC_LUMA)
    codes = sorted(
        (format(c, f"0{l}b") for c, l in enc.values()), key=len
    )
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not b.startswith(a), (a, b)


def test_dct_matrix_orthonormal_and_matches_direct_formula():
    C = _dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    x = rng.uniform(-128, 127, (8, 8))
    X = C @ x @ C.T
    # direct O(n^4) DCT-II with the JPEG normalization (A.3.3)
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(
                x[i, j]
                * np.cos((2 * i + 1) * u * np.pi / 16)
                * np.cos((2 * j + 1) * v * np.pi / 16)
                for i in range(8)
                for j in range(8)
            )
            want[u, v] = 0.25 * cu * cv * s
    assert np.allclose(X, want, atol=1e-9)


def test_zigzag_is_antidiagonal_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # transmission order walks anti-diagonals: r+c is non-decreasing
    diag = [(z // 8 + z % 8) for z in ZIGZAG]
    assert diag == sorted(diag) or all(
        abs(diag[i + 1] - diag[i]) <= 1 for i in range(63)
    )
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_quality_scaling_libjpeg_formula():
    assert np.array_equal(_quality_scale(K1_LUMA, 50), K1_LUMA)  # s=100
    q100 = _quality_scale(K1_LUMA, 100)
    assert q100.min() == 1 and q100.max() == 1  # s=0 -> all 1s
    q25 = _quality_scale(K1_LUMA, 25)  # s=200 -> 2x + rounding
    assert np.array_equal(q25, np.clip((K1_LUMA * 200 + 50) // 100, 1, 255))


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_solid_gray_is_lossless():
    img = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(parse_jpeg(write_jpeg(img, 90)), img)


def test_smooth_gray_high_psnr():
    yy, xx = np.mgrid[0:32, 0:48]
    img = (128 + 60 * np.sin(yy / 8.0) + 50 * np.cos(xx / 9.0)).clip(0, 255).astype(np.uint8)
    assert _psnr(img, parse_jpeg(write_jpeg(img, 90))) > 45


@pytest.mark.parametrize("subsample,min_psnr", [("444", 42), ("420", 33)])
def test_color_roundtrip(subsample, min_psnr):
    img = _smooth_rgb(32, 48)
    dec = parse_jpeg(write_jpeg(img, 90, subsample))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > min_psnr


def test_odd_dimensions_crop_exact():
    img = _smooth_rgb(29, 37)
    for ss in ("444", "420"):
        dec = parse_jpeg(write_jpeg(img, 85, ss))
        assert dec.shape == (29, 37, 3)
        assert _psnr(img, dec) > 30


def test_restart_markers_change_nothing():
    img = _smooth_rgb(40, 56)
    base = parse_jpeg(write_jpeg(img, 90, "420"))
    for ri in (1, 2, 5):
        dec = parse_jpeg(write_jpeg(img, 90, "420", restart_interval=ri))
        assert np.array_equal(dec, base), ri
    # >8 restarts exercises the RST0..RST7 modulo wrap
    gray = (np.mgrid[0:80, 0:80][0] * 3 % 256).astype(np.uint8)
    assert np.array_equal(
        parse_jpeg(write_jpeg(gray, 85, restart_interval=1)),
        parse_jpeg(write_jpeg(gray, 85)),
    )


def test_quality_monotone():
    img = _smooth_rgb(32, 32)
    p = [_psnr(img, parse_jpeg(write_jpeg(img, q))) for q in (10, 50, 90)]
    assert p[0] < p[1] < p[2]


def test_gates():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(write_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3  # pretend lossless sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        parse_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"\x00\x01")
    with pytest.raises(ValueError, match="uint8"):
        write_jpeg(np.zeros((8, 8), np.float64))


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # derandomized: the assertion is a heuristic PSNR bound, not an
    # exactness property — pin the corpus so the bound can't flake
    @settings(max_examples=20, deadline=None, derandomize=True)
    @given(
        h=st.integers(4, 24),
        w=st.integers(4, 24),
        q=st.integers(60, 95),
        seed=st.integers(0, 10_000),
        color=st.booleans(),
        ss=st.sampled_from(["444", "420"]),
        ri=st.sampled_from([0, 0, 2]),
    )
    def rt(h, w, q, seed, color, ss, ri):
        rng = np.random.default_rng(seed)
        # smooth-ish content: random low-frequency mixture (pure noise is
        # the concentration worst case and has no meaningful PSNR bound)
        yy, xx = np.mgrid[0:h, 0:w]
        img = 128 + sum(
            rng.uniform(-40, 40) * np.sin(yy / rng.uniform(3, 9))
            + rng.uniform(-40, 40) * np.cos(xx / rng.uniform(3, 9))
            for _ in range(2)
        )
        img = img.clip(0, 255).astype(np.uint8)
        if color:
            img = np.stack([img, np.roll(img, 1, 0), 255 - img], axis=2)
        dec = parse_jpeg(write_jpeg(img, q, ss if color else "444", ri))
        assert dec.shape == img.shape
        assert _psnr(img, dec) > (24 if (color and ss == "420") else 30)

    rt()


def test_spark_distributed_jpeg_decode(spark):
    """End-to-end: real JPEG payloads through the Arrow-batched
    decode_image path, closures shipped by value."""
    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.operators.multimodal import decode_image

    imgs = {i: _smooth_rgb(16 + i, 24) for i in range(4)}
    rows = [(i, bytearray(write_jpeg(imgs[i], 88, "420"))) for i in imgs]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        r["doc_id"]: r
        for r in decode_image(df, codec="jpeg", out_size=(4, 4)).collect()
    }
    assert set(out) == set(imgs)
    for i, img in imgs.items():
        # luma mean of the decode should track the original's luma mean
        luma = img.astype(float) @ np.array([0.299, 0.587, 0.114])
        assert out[i]["mean_pixel"] == pytest.approx(luma.mean(), abs=3.0)
        assert len(out[i]["pixels"]) == 16


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_decodes_identically_to_baseline():
    """Progressive and baseline encode the SAME quantized coefficients,
    so decoding the two streams must agree bit for bit — the cross-mode
    check that keeps both scan machineries honest."""
    from xarray_dataaccessor_spark.sources.jpeg import write_jpeg_progressive

    for shape in [(40, 56), (29, 37), (8, 8), (17, 9)]:
        img = _smooth_rgb(*shape)
        for ss in ("444", "420"):
            for q in (70, 90):
                base = parse_jpeg(write_jpeg(img, q, ss))
                prog = parse_jpeg(write_jpeg_progressive(img, q, ss))
                assert np.array_equal(base, prog), (shape, ss, q)
        gray = img[:, :, 0]
        assert np.array_equal(
            parse_jpeg(write_jpeg(gray, 85)),
            parse_jpeg(write_jpeg_progressive(gray, 85)),
        ), shape


def test_progressive_long_eob_runs_and_sparse_blocks():
    """Mostly-flat image with isolated features: long cross-block EOB
    runs in the AC-first scans and ZRL/correction-bit paths in the
    refinement scan."""
    from xarray_dataaccessor_spark.sources.jpeg import write_jpeg_progressive

    img = np.full((64, 96), 128, np.uint8)
    img[5, 7] = 255
    img[40:42, 60:90] = 30
    img[63, 95] = 0
    assert np.array_equal(
        parse_jpeg(write_jpeg(img, 90)),
        parse_jpeg(write_jpeg_progressive(img, 90)),
    )
    # color variant with hard edges (many newly-significant refinements)
    rgb = np.stack([img, 255 - img, np.roll(img, 3, 1)], axis=2)
    assert np.array_equal(
        parse_jpeg(write_jpeg(rgb, 80, "420")),
        parse_jpeg(write_jpeg_progressive(rgb, 80, "420")),
    )


def test_progressive_parity_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xarray_dataaccessor_spark.sources.jpeg import write_jpeg_progressive

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(4, 32),
        w=st.integers(4, 32),
        q=st.integers(40, 98),
        seed=st.integers(0, 10_000),
        color=st.booleans(),
        ss=st.sampled_from(["444", "420"]),
    )
    def rt(h, w, q, seed, color, ss):
        rng = np.random.default_rng(seed)
        # mixture of flat areas and noise patches: exercises EOB runs,
        # ZRL, and dense-coefficient blocks together
        img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        for _ in range(3):
            y0, x0 = rng.integers(0, h), rng.integers(0, w)
            hh, ww = int(rng.integers(1, h - y0 + 1)), int(rng.integers(1, w - x0 + 1))
            img[y0 : y0 + hh, x0 : x0 + ww] = rng.integers(
                0, 256, (hh, ww), dtype=np.uint8
            )
        if color:
            img = np.stack([img, np.roll(img, 1, 0), 255 - img], axis=2)
        base = parse_jpeg(write_jpeg(img, q, ss if color else "444"))
        prog = parse_jpeg(
            write_jpeg_progressive(img, q, ss if color else "444")
        )
        assert np.array_equal(base, prog)

    rt()


def test_unknown_app_and_comment_markers_are_skipped():
    """Real-world JPEGs carry EXIF/APPn/COM segments the decoder must
    skip by length: inject them after SOI and assert identical pixels."""
    img = _smooth_rgb(24, 16)
    data = write_jpeg(img, 85)
    base = parse_jpeg(data)
    exif = b"\xff\xe1" + (2 + 10).to_bytes(2, "big") + b"Exif\x00\x00ABCD"
    com = b"\xff\xfe" + (2 + 7).to_bytes(2, "big") + b"comment"
    injected = data[:2] + exif + com + data[2:]
    assert np.array_equal(parse_jpeg(injected), base)


def test_three_level_successive_approximation():
    """Real encoders refine over several Al levels; a hand-built SOF2
    stream with DC/AC first passes at Al=2 and two refinement passes
    (2->1->0) must decode bit-identically to the baseline encoding."""
    import struct

    from xarray_dataaccessor_spark.sources.jpeg import (
        FLAT_HUFF,
        _BitWriter,
        _ProgEnc,
        _build_huffman,
        _encode_coeff,
        _quantized_components,
    )

    img = (128 + 60 * np.sin(np.mgrid[0:24, 0:24][0] / 5.0)).clip(0, 255).astype(np.uint8)
    gray, samp, (qy, qc), coefs, mcux, mcuy = _quantized_components(img, 85, "444")
    h, w = img.shape
    _, dc_enc = _build_huffman(*K3_DC_LUMA)
    _, flat_enc = _build_huffman(*FLAT_HUFF)
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0])
            + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    body = bytes([0]) + bytes(K3_DC_LUMA[0]) + bytes(K3_DC_LUMA[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = bytes([0x10]) + bytes(FLAT_HUFF[0]) + bytes(FLAT_HUFF[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(ss, se, ah, al):
        b = bytes([1, 1, 0x00]) + bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(b)) + b

    bh, bwn = coefs[0].shape[:2]
    bw = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bwn):
            v = int(coefs[0][by, bx, 0]) >> 2
            diff, pred = v - pred, v
            t, bits = _encode_coeff(diff)
            c, ln = dc_enc[t]
            bw.write(c, ln)
            if t:
                bw.write(bits, t)
    bw.flush()
    out += sos(0, 0, 0, 2) + bw.out
    for al in (1, 0):
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bwn):
                bw.write((int(coefs[0][by, bx, 0]) >> al) & 1, 1)
        bw.flush()
        out += sos(0, 0, al + 1, al) + bw.out
    bw = _BitWriter()
    enc = _ProgEnc(bw, flat_enc)
    for by in range(bh):
        for bx in range(bwn):
            enc.ac_first_block(coefs[0][by, bx], 1, 63, 2)
    enc.flush_eobrun()
    bw.flush()
    out += sos(1, 63, 0, 2) + bw.out
    for al in (1, 0):
        bw = _BitWriter()
        enc = _ProgEnc(bw, flat_enc)
        for by in range(bh):
            for bx in range(bwn):
                enc.ac_refine_block(coefs[0][by, bx], 1, 63, al)
        enc.flush_eobrun()
        bw.flush()
        out += sos(1, 63, al + 1, al) + bw.out
    out += b"\xff\xd9"
    assert np.array_equal(parse_jpeg(bytes(out)), parse_jpeg(write_jpeg(img, 85)))


def test_dimension_bomb_rejected_and_entropy_corruption_bounded():
    """Corrupt headers declaring huge dimensions raise instead of
    becoming a CPU sink; seeded flips in the entropy segment terminate
    with an error or a (wrong) image."""
    import random
    import struct

    img = _smooth_rgb(24, 24)
    data = bytearray(write_jpeg(img, 85))
    sof = bytes(data).find(b"\xff\xc0")
    bomb = bytearray(data)
    bomb[sof + 5 : sof + 7] = struct.pack(">H", 30000)  # height
    bomb[sof + 7 : sof + 9] = struct.pack(">H", 30000)  # width
    with pytest.raises(ValueError, match="max_pixels"):
        parse_jpeg(bytes(bomb))
    sos = bytes(data).find(b"\xff\xda")
    rng = random.Random(3)
    for _ in range(60):
        buf = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(sos + 14, len(buf))] ^= 1 << rng.randrange(8)
        try:
            parse_jpeg(bytes(buf))
        except (ValueError, IndexError, KeyError):
            pass


def test_bitreader_buffer_stays_bounded():
    """Regression (r4 ADVICE): _BitReader must truncate consumed bits on
    refill; otherwise bitbuf grows with every bit read and a no-restart
    entropy segment decodes in O(n^2)."""
    from xarray_dataaccessor_spark.sources.jpeg import _BitReader

    data = bytes([0x55, 0xAA] * 50_000)  # 100 KB, no 0xFF markers
    br = _BitReader(data, 0)
    total = 0
    for _ in range(len(data)):
        total += br.read_bits(8)
        # buffer must stay a few bytes wide for the whole run
        assert br.bitbuf.bit_length() <= 40
    assert total == (0x55 + 0xAA) * 50_000
