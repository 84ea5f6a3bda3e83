"""Pure-Python WebP-lossless (VP8L): writer/parser round trips across
every decoder path (transforms, LZ77 refs, color cache, palette
bundling), corrupt-input rejection, and the distributed decode_image
integration — same discipline as the JPEG/FLAC/zstd suites."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_dataaccessor_spark.sources.webp import parse_webp, write_webp


def _rt(img, **kw):
    out = parse_webp(write_webp(img, **kw))
    want = img if img.ndim == 3 else np.dstack([img, img, img])
    if want.shape[2] == 4 and (want[:, :, 3] == 255).all():
        want = want[:, :, :3]
    np.testing.assert_array_equal(out, want)
    return out


RNG = np.random.default_rng(7)
RGB = RNG.integers(0, 256, size=(13, 17, 3)).astype("u1")
RGBA = RNG.integers(0, 256, size=(9, 11, 4)).astype("u1")
RUNS = np.repeat(RNG.integers(0, 256, size=(8, 5, 3)), 4, axis=1).astype("u1")


def test_plain_roundtrips():
    _rt(RGB)
    _rt(RGBA)
    _rt((np.arange(64).reshape(8, 8) * 4).astype("u1"))  # gray
    _rt(np.zeros((1, 1, 3), dtype="u1"))  # minimal


@pytest.mark.parametrize(
    "transforms",
    [("subtract_green",), ("predictor",), ("color",),
     ("subtract_green", "predictor"), ("color", "subtract_green", "predictor")],
)
def test_transform_roundtrips(transforms):
    _rt(RGB, transforms=transforms)


def test_palette_bundling_levels():
    """Color-indexing with every sub-byte bundling width: 2 colors
    (8 px/byte), 4 colors (4 px/byte), 16 colors (2 px/byte), 200
    colors (no bundling)."""
    for n_colors in (2, 4, 16, 200):
        vals = np.linspace(0, 255, n_colors).astype("u1")
        img = vals[RNG.integers(0, n_colors, size=(11, 23))]
        img = np.dstack([img, img // 2, 255 - img])
        _rt(img, transforms=("palette",))


def test_lz77_and_cache_paths():
    _rt(RUNS, use_lz77=True)
    _rt(RUNS, cache_bits=6)
    _rt(RUNS, use_lz77=True, cache_bits=4)
    _rt(RGB, use_lz77=True, cache_bits=8)


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(st.integers(1, 16), st.integers(1, 16)),
    st.integers(0, 2**16 - 1),
    st.booleans(),
    st.sampled_from([(), ("subtract_green",), ("predictor",)]),
)
def test_roundtrip_property(hw, seed, lz, transforms):
    h, w = hw
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3)).astype("u1")
    _rt(img, transforms=transforms, use_lz77=lz)


def test_corrupt_rejected():
    good = write_webp(RGB)
    with pytest.raises(ValueError, match="RIFF"):
        parse_webp(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="VP8L chunk"):
        parse_webp(good[:12] + b"XXXX" + good[16:])
    # corrupt the VP8L signature byte
    bad = bytearray(good)
    sig_at = good.index(b"VP8L") + 8
    bad[sig_at] = 0x00
    with pytest.raises(ValueError, match="signature"):
        parse_webp(bytes(bad))
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|prefix|bounds"):
        parse_webp(good[: len(good) - max(4, len(good) // 4)])


def test_lossy_vp8_dispatches_to_vp8_decoder():
    """A VP8 (lossy) chunk now routes to sources.vp8; a malformed
    payload raises that decoder's error rather than a blanket
    NotImplementedError (full decode coverage lives in test_vp8.py)."""
    riff = b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    data = b"RIFF" + (len(riff) + 4).to_bytes(4, "little") + b"WEBP" + riff
    with pytest.raises(ValueError, match="VP8"):
        parse_webp(data)


def test_distributed_decode_image_webp(spark):
    """decode_image(codec='webp') decodes distributed with the parser
    shipped by value; mean_pixel matches the luma of the source."""
    from xarray_dataaccessor_spark.operators.multimodal import decode_image

    imgs = {}
    rows = []
    for d in range(6):
        img = ((d * 11 + np.arange(96)) % 256).astype("u1").reshape(8, 4, 3)
        imgs[d] = img
        rows.append((d, bytearray(write_webp(img, use_lz77=(d % 2 == 0)))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df, codec="webp").collect()}
    assert set(out) == set(range(6))
    for d, img in imgs.items():
        luma = (img @ np.array([0.299, 0.587, 0.114])).mean()
        assert out[d]["mean_pixel"] == pytest.approx(luma)
        assert len(out[d]["pixels"]) == 64


def test_corruption_fuzz_terminates_with_errors():
    """Seeded bit-flip sweep: corrupt VP8L streams raise bounded errors
    promptly (prefix-code walks, repeat runs, backrefs and the pixel
    cap all bounded); crafted 14-bit dimensions beyond max_pixels are
    rejected before allocation."""
    import random
    import struct as _struct
    import time

    base = write_webp(RUNS, use_lz77=True, cache_bits=4)
    random.seed(1)
    t0 = time.time()
    for _ in range(600):
        b = bytearray(base)
        for _f in range(random.randint(1, 6)):
            b[random.randrange(len(b))] = random.randrange(256)
        try:
            parse_webp(bytes(b))
        except (ValueError, NotImplementedError, IndexError, _struct.error,
                OverflowError, KeyError):
            pass
    assert time.time() - t0 < 30
    with pytest.raises(ValueError, match="max_pixels"):
        parse_webp(write_webp(np.zeros((1, 1, 3), "u1")), max_pixels=0)


def test_depth_capped_huffman_is_complete():
    """Fibonacci-skewed frequencies push the unconstrained Huffman tree
    past 15 levels; the capped lengths must still form an exactly
    complete code (the decoder rejects Kraft != 1) and such images must
    round-trip."""
    from fractions import Fraction

    from xarray_dataaccessor_spark.sources.webp import _Huff, _huff_lengths

    fib = [1, 1]
    for _ in range(25):
        fib.append(fib[-1] + fib[-2])
    lens = _huff_lengths({i: f for i, f in enumerate(fib)}, max_len=15)
    assert max(lens.values()) <= 15
    assert sum(Fraction(1, 1 << l) for l in lens.values()) == 1
    arr = [0] * (max(lens) + 1)
    for s, l in lens.items():
        arr[s] = l
    _Huff(arr)  # complete: must not raise


def test_cross_codec_parity_with_png():
    """Two independent machineries, one pixel truth: the same image
    encoded as PNG (media.py) and WebP-lossless (webp.py) must decode
    to identical arrays — the JPEG progressive-vs-baseline discipline
    applied across formats."""
    from xarray_dataaccessor_spark.sources.media import parse_png, write_png

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(21, 13, 3)).astype("u1")
    from_png = parse_png(write_png(img))
    from_webp = parse_webp(write_webp(img, use_lz77=True, cache_bits=5))
    np.testing.assert_array_equal(from_png, from_webp)


class _SpecBitWriter:
    """LSB-first bit assembler used to hand-craft spec-order VP8L streams
    in the golden tests below, independent of write_webp's emitter."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def payload(self):
        out = bytearray([0x2F])
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _riff(payload: bytes) -> bytes:
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _simple_single(bw, sym):
    """Emit a simple prefix code with one symbol (0 data bits on use)."""
    bw.w(1, 1)  # simple
    bw.w(0, 1)  # num_symbols = 1
    if sym >= 2:
        bw.w(1, 1)  # first symbol is 8 bits
        bw.w(sym, 8)
    else:
        bw.w(0, 1)
        bw.w(sym, 1)


def test_golden_spec_order_color_cache_before_meta():
    """Hand-assembled bitstream in RFC 9649 grammar order
    (spatially-coded-image ::= color-cache-info meta-prefix data): a 2x1
    image whose second pixel is a color-cache hit. Pins that the decoder
    reads color-cache-info FIRST — an order-inverted decoder misparses
    the stream. (No libwebp in this environment; this is the manual
    conformance pin.)"""
    from xarray_dataaccessor_spark.sources.webp import _cache_key

    cache_bits = 2
    px = 0xFF0A141E  # a=255 r=10 g=20 b=30
    k = _cache_key(px, cache_bits)

    bw = _SpecBitWriter()
    bw.w(2 - 1, 14)  # width-1
    bw.w(1 - 1, 14)  # height-1
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version
    bw.w(0, 1)  # no transforms
    # --- spatially-coded image: color-cache-info FIRST ---
    bw.w(1, 1)
    bw.w(cache_bits, 4)
    # --- then meta-prefix bit ---
    bw.w(0, 1)
    # green: code-length-coded, two symbols of length 1: 20 and 280+k
    bw.w(0, 1)  # not simple
    bw.w(0, 4)  # num_cl = 4 -> lengths for CL syms 17,18,0,1
    bw.w(0, 3)  # len(17)=0
    bw.w(1, 3)  # len(18)=1
    bw.w(0, 3)  # len(0)=0
    bw.w(1, 3)  # len(1)=1
    # cl canonical: sym1 -> bit0, sym18 -> bit1
    bw.w(1, 1)  # explicit max_symbol
    bw.w(0, 3)  # length_nbits = 2
    bw.w(3, 2)  # max_symbol = 2+3 = 5 cl reads
    bw.w(1, 1)  # cl sym 18
    bw.w(9, 7)  # 11+9 = 20 zeros (positions 0..19)
    bw.w(0, 1)  # cl sym 1 -> length 1 at position 20
    bw.w(1, 1)  # cl sym 18
    bw.w(127, 7)  # 138 zeros
    bw.w(1, 1)  # cl sym 18
    bw.w(110 + k, 7)  # 121+k zeros  (total 259+k zeros: 21..279+k)
    bw.w(0, 1)  # cl sym 1 -> length 1 at position 280+k
    _simple_single(bw, 10)  # red
    _simple_single(bw, 30)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)  # dist
    # data: pixel0 = literal green sym 20 (code 0), pixel1 = cache sym (code 1)
    bw.w(0, 1)
    bw.w(1, 1)

    img = parse_webp(_riff(bw.payload()))
    assert img.shape == (1, 2, 3)
    np.testing.assert_array_equal(img, [[[10, 20, 30], [10, 20, 30]]])


def test_golden_spec_order_meta_prefix_groups():
    """Hand-assembled stream with NO color cache and a meta-prefix
    entropy image selecting two code groups over an 8x1 image (block
    size 4). First bit 0 = no cache, second bit 1 = meta present: a
    decoder that reads the meta bit first sees 0 and misdecodes."""
    bw = _SpecBitWriter()
    bw.w(8 - 1, 14)
    bw.w(1 - 1, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)  # no transforms
    # --- color-cache-info FIRST: none ---
    bw.w(0, 1)
    # --- meta-prefix present ---
    bw.w(1, 1)
    bw.w(0, 3)  # meta_bits = 2 -> 2 blocks of 4
    # meta entropy image (2x1, allow_meta=False): its own cache bit, codes
    bw.w(0, 1)  # no cache in meta image
    bw.w(1, 1)  # green: simple
    bw.w(1, 1)  # two symbols
    bw.w(0, 1)  # first symbol 1-bit
    bw.w(0, 1)  # sym0 = 0 (group 0)
    bw.w(1, 8)  # sym1 = 1 (group 1)
    _simple_single(bw, 0)  # red
    _simple_single(bw, 0)  # blue
    _simple_single(bw, 0)  # alpha
    _simple_single(bw, 0)  # dist
    bw.w(0, 1)  # meta pixel 0 -> green 0
    bw.w(1, 1)  # meta pixel 1 -> green 1
    # two code groups, all single-symbol codes (0 data bits per pixel)
    for g in (111, 222):
        _simple_single(bw, g)  # green
        _simple_single(bw, 0)  # red
        _simple_single(bw, 0)  # blue
        _simple_single(bw, 255)  # alpha
        _simple_single(bw, 0)  # dist
    # data: 8 literals, zero bits each

    img = parse_webp(_riff(bw.payload()))
    assert img.shape == (1, 8, 3)
    np.testing.assert_array_equal(img[0, :4, 1], [111] * 4)
    np.testing.assert_array_equal(img[0, 4:, 1], [222] * 4)
