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


def test_lossy_vp8_rejected():
    riff = b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    data = b"RIFF" + (len(riff) + 4).to_bytes(4, "little") + b"WEBP" + riff
    with pytest.raises(NotImplementedError, match="lossy"):
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
