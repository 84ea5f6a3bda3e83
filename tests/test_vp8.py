"""VP8 (WebP-lossy, RFC 6386) key-frame codec: bool-coder fuzz, encoder
twin round trips, container/probe consistency, Spark decode path, and —
when the system libwebp is present — bit-exact cross-validation in BOTH
directions (our streams through the reference decoder, reference-encoder
streams incl. loop-filtered ones through our decoder)."""

from __future__ import annotations

import ctypes
import ctypes.util
import random
import struct

import numpy as np
import pytest

from xarray_dataaccessor_spark.sources import vp8
from xarray_dataaccessor_spark.sources.webp import parse_webp, write_webp_lossy


def _libwebp():
    name = ctypes.util.find_library("webp")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
        lib.WebPDecodeYUV
        lib.WebPEncodeRGB
    except (OSError, AttributeError):
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


LIBWEBP = _libwebp()
needs_libwebp = pytest.mark.skipif(
    LIBWEBP is None, reason="system libwebp not available"
)


def _lw_decode_yuv(lib, webp_bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    ys = ctypes.c_int()
    uvs = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        webp_bytes, len(webp_bytes), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(ys),
        ctypes.byref(uvs),
    )
    assert yp, "libwebp decode failed"
    W, H = w.value, h.value
    Y = np.ctypeslib.as_array(yp, shape=(H, ys.value))[:, :W].copy()
    CH, CW = (H + 1) // 2, (W + 1) // 2
    U = np.ctypeslib.as_array(up, shape=(CH, uvs.value))[:, :CW].copy()
    V = np.ctypeslib.as_array(vp, shape=(CH, uvs.value))[:, :CW].copy()
    lib.WebPFree(yp)
    return W, H, Y, U, V


def _vp8_chunk(data):
    pos = 12
    while pos < len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    return None


def _test_rgb(w, h, seed=3):
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.linspace(0, 4, w), np.linspace(0, 4, h))
    base = 128 + 90 * np.sin(xx) * np.cos(yy * 1.3)
    img = np.stack([base, 128 + 80 * np.cos(xx * 2), base[::-1]], axis=-1)
    img += rng.normal(0, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_bool_coder_fuzz_roundtrip():
    """The arbitrary-precision bool encoder is an exact twin of the
    RFC 6386 range decoder over random (bit, prob) streams."""
    rng = random.Random(7)
    for _ in range(200):
        seq = [
            (rng.randrange(2), rng.randrange(1, 255))
            for _ in range(rng.randrange(1, 400))
        ]
        e = vp8.BoolEncoder()
        for bit, p in seq:
            e.put(bit, p)
        d = vp8.BoolDecoder(e.bytes() + b"\x00\x00")
        assert [d.get(p) for _, p in seq] == [b for b, _ in seq]


@pytest.mark.parametrize("size", [(16, 16), (48, 32), (37, 21), (61, 45)])
def test_self_roundtrip_bounded_error(size):
    """encoder twin -> decoder: reconstruction error is bounded by the
    quantizer step (q_index=4 -> step 8 -> |err| <= step/2 + idct
    rounding), including non-multiple-of-16 dimensions."""
    w, h = size
    rgb = _test_rgb(w, h)
    y, u, v = vp8.rgb_to_yuv420(rgb)
    out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, u, v, q_index=4))
    assert (out["width"], out["height"]) == (w, h)
    assert np.abs(out["y"].astype(int) - y.astype(int)).max() <= 6
    assert np.abs(out["u"].astype(int) - u.astype(int)).max() <= 6
    assert np.abs(out["v"].astype(int) - v.astype(int)).max() <= 6


def test_container_roundtrip_and_probe_consistency():
    """write_webp_lossy -> parse_webp pixels match the subsampling-only
    reference within the quantizer bound; the media probe reports the
    same dimensions the decoder produces."""
    from xarray_dataaccessor_spark.sources.media import image_probe

    rgb = _test_rgb(29, 18)
    data = write_webp_lossy(rgb, q_index=0)
    y, u, v = vp8.rgb_to_yuv420(rgb)
    ref = vp8.yuv420_to_rgb(y, u, v)
    out = parse_webp(data)
    assert out.shape == (18, 29, 3)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 6
    meta = image_probe(bytes(data))
    assert meta["fmt"] == "webp_lossy"
    assert (meta["width"], meta["height"]) == (29, 18)


def test_reject_bad_streams():
    rgb = _test_rgb(16, 16)
    y, u, v = vp8.rgb_to_yuv420(rgb)
    payload = bytearray(vp8.encode_vp8_frame(y, u, v))
    bad = payload.copy()
    bad[0] |= 1  # interframe flag
    with pytest.raises(NotImplementedError, match="interframe"):
        vp8.decode_vp8_frame(bytes(bad))
    bad = payload.copy()
    bad[3] ^= 0xFF  # start code
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8_frame(bytes(bad))
    with pytest.raises(ValueError, match="too short"):
        vp8.decode_vp8_frame(b"\x00\x01")
    with pytest.raises(ValueError, match="truncated"):
        vp8.decode_vp8_frame(bytes(payload[:12]))


def test_decode_image_spark_path(spark):
    """decode_image(codec='webp') decodes lossy payloads through the
    Arrow-batched mapInPandas path (closure shipped by value)."""
    from xarray_dataaccessor_spark.operators.multimodal import decode_image

    rgb = _test_rgb(24, 16, seed=9)
    df = spark.createDataFrame(
        [(1, bytearray(write_webp_lossy(rgb, q_index=0)))],
        "doc_id long, payload binary",
    )
    row = decode_image(df, codec="webp", out_size=(4, 4)).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    assert len(row["pixels"]) == 16
    # mean_pixel is over the pre-resize decoded luma: within quantizer
    # error of the encoder input's luma mean
    y, _, _ = vp8.rgb_to_yuv420(rgb)
    assert abs(row["mean_pixel"] - float(y.mean())) < 4.0


@needs_libwebp
@pytest.mark.parametrize("size", [(16, 16), (48, 32), (37, 21)])
def test_our_streams_decode_bit_exact_in_libwebp(size):
    """Spec-compliance proof: the reference decoder reproduces OUR
    encoder's reconstruction bit-for-bit (YUV planes compared — no
    color-conversion ambiguity)."""
    w, h = size
    rgb = _test_rgb(w, h)
    y, u, v = vp8.rgb_to_yuv420(rgb)
    payload = vp8.encode_vp8_frame(y, u, v, q_index=4)
    mine = vp8.decode_vp8_frame(payload)
    W, H, LY, LU, LV = _lw_decode_yuv(LIBWEBP, bytes(write_webp_lossy(rgb, 4)))
    assert (W, H) == (w, h)
    assert np.array_equal(LY, mine["y"])
    assert np.array_equal(LU, mine["u"])
    assert np.array_equal(LV, mine["v"])


@needs_libwebp
@pytest.mark.parametrize("quality", [95.0, 50.0, 10.0])
def test_reference_streams_decode_bit_exact(quality):
    """Real-encoder streams (mixed intra modes, token partitions,
    segmentation, nonzero loop-filter levels at lower quality) decode
    bit-exactly against the reference decoder's own output."""
    w, h = 96, 64
    rgb = np.ascontiguousarray(_test_rgb(w, h, seed=int(quality)))
    outp = ctypes.POINTER(ctypes.c_uint8)()
    n = LIBWEBP.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, quality, ctypes.byref(outp)
    )
    assert n > 0
    data = bytes(np.ctypeslib.as_array(outp, shape=(n,)))
    LIBWEBP.WebPFree(outp)
    payload = _vp8_chunk(data)
    assert payload is not None
    mine = vp8.decode_vp8_frame(payload)
    _, _, LY, LU, LV = _lw_decode_yuv(LIBWEBP, data)
    assert np.array_equal(LY, mine["y"])
    assert np.array_equal(LU, mine["u"])
    assert np.array_equal(LV, mine["v"])


def test_frame_header_fields_roundtrip():
    """The uncompressed frame tag and first-partition header fields the
    writer emits parse back exactly (q_index, filter level 0, one
    partition, skip enabled)."""
    rgb = _test_rgb(32, 16)
    y, u, v = vp8.rgb_to_yuv420(rgb)
    payload = vp8.encode_vp8_frame(y, u, v, q_index=23)
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    assert tag & 1 == 0 and (tag >> 4) & 1 == 1
    assert payload[3:6] == b"\x9d\x01\x2a"
    assert struct.unpack_from("<HH", payload, 6) == (32, 16)
    bd = vp8.BoolDecoder(payload[10 : 10 + (tag >> 5)])
    h = vp8._parse_header(bd)
    assert h["q_index"] == 23
    assert h["filter_level"] == 0
    assert h["n_partitions"] == 1
    assert h["mb_no_skip"] == 1


def test_solid_gray_qindex0_is_exactly_lossless():
    """The oracle trick behind the webp branch of
    multimodal_binary_features: at q_index 0, a solid-gray frame
    decodes EXACTLY (every B_DC prediction is constant, the constant
    residual's DCT has only a DC term, and 8*residual is divisible by
    the step-4 quantizer) — for every luma value and for multi-MB
    frames where later blocks predict from reconstructed neighbors."""
    for yv in (0, 1, 16, 77, 128, 200, 254, 255):
        y = np.full((16, 32), yv, np.uint8)
        u = np.full((8, 16), 128, np.uint8)
        v = np.full((8, 16), 128, np.uint8)
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, u, v, q_index=0))
        assert np.array_equal(out["y"], y), yv
        assert np.array_equal(out["u"], u) and np.array_equal(out["v"], v)


@pytest.mark.parametrize("alpha_filter", [0, 1, 2, 3])
def test_alpha_plane_lossless_roundtrip(alpha_filter):
    """VP8X + ALPH: the alpha plane is stored losslessly under each of
    the four spec filters (none/horizontal/vertical/gradient) and
    round-trips bit-exactly alongside the lossy color frame."""
    rng = np.random.RandomState(4)
    rgba = np.zeros((21, 33, 4), np.uint8)
    rgba[:, :, :3] = 100
    rgba[:, :, 3] = (
        np.arange(21)[:, None] * 7 + np.arange(33)[None, :] * 3
    ) % 256
    rgba[::5, ::4, 3] = rng.randint(0, 256, rgba[::5, ::4, 3].shape)
    data = write_webp_lossy(rgba, q_index=0, alpha_filter=alpha_filter)
    out = parse_webp(data)
    assert out.shape == (21, 33, 4)
    assert np.array_equal(out[:, :, 3], rgba[:, :, 3])


@needs_libwebp
def test_alpha_container_accepted_by_libwebp():
    """The reference decoder accepts our VP8X/ALPH/VP8 layout and
    reproduces the alpha plane bit-exactly."""
    rgba = np.zeros((12, 20, 4), np.uint8)
    rgba[:, :, :3] = 77
    rgba[:, :, 3] = (np.arange(12 * 20) % 256).reshape(12, 20)
    data = bytes(write_webp_lossy(rgba, q_index=0, alpha_filter=3))
    LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    LIBWEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp rejected the container"
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    LIBWEBP.WebPFree(p)
    assert (w.value, h.value) == (20, 12)
    assert np.array_equal(ref[:, :, 3], rgba[:, :, 3])


@needs_libwebp
def test_real_world_compressed_alpha_bit_exact():
    """python.webp (stdlib test asset): VP8X + method-1 (VP8L-stream)
    compressed ALPH + lossy VP8 — our alpha decode matches the
    reference decoder bit-for-bit. (Color channels are compared via
    YUV elsewhere; RGBA color differs by chroma-upsampling policy.)"""
    import os

    path = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
            "test_email/data/python.webp")
    if not os.path.exists(path):
        pytest.skip("stdlib webp asset not present")
    data = open(path, "rb").read()
    mine = parse_webp(data)
    assert mine.shape[2] == 4
    LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    LIBWEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    LIBWEBP.WebPFree(p)
    assert np.array_equal(mine[:, :, 3], ref[:, :, 3])
