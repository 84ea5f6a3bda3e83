"""Pure-Python Blosc1 codec: LZ4 block format + byte shuffle + chunk
frame round-trips (hypothesis-driven like the sibling format readers)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_dataaccessor_spark.sources.blosc import (
    decode_blosc,
    encode_blosc,
    lz4_compress_block,
    lz4_decompress_block,
)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lz4_block_roundtrip_random(data):
    assert lz4_decompress_block(lz4_compress_block(data), len(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=64), st.integers(min_value=2, max_value=100))
def test_lz4_block_roundtrip_repetitive(chunk, reps):
    """Repetitive data exercises real matches (incl. overlapping copies)."""
    data = chunk * reps
    comp = lz4_compress_block(data)
    assert lz4_decompress_block(comp, len(data)) == data
    if len(data) > 200:
        assert len(comp) < len(data)  # matches actually fire


@settings(max_examples=40, deadline=None)
@given(
    st.binary(min_size=0, max_size=8192),
    st.sampled_from([1, 2, 4, 8]),
    st.sampled_from(["lz4", "zlib"]),
    st.booleans(),
)
def test_blosc_chunk_roundtrip(data, typesize, cname, shuffle):
    if len(data) % typesize:
        data = data + b"\x00" * (typesize - len(data) % typesize)
    chunk = encode_blosc(data, typesize=typesize, cname=cname, shuffle=shuffle)
    assert decode_blosc(chunk) == data


def test_blosc_multiblock_chunk():
    """Chunks larger than one block exercise the block-start table."""
    arr = (np.arange(100_000, dtype="<f8") * 0.5).tobytes()
    chunk = encode_blosc(arr, typesize=8, cname="lz4", blocksize=32 * 1024)
    assert decode_blosc(chunk) == arr
    assert len(chunk) < len(arr) / 2  # shuffled monotone doubles compress well


def test_blosc_rejects_corrupt_header():
    with pytest.raises(ValueError, match="header"):
        decode_blosc(b"\x02\x01\x00\x08" + b"\x00" * 4)
    good = encode_blosc(b"abcdefgh" * 100, typesize=8)
    with pytest.raises(ValueError, match="cbytes"):
        decode_blosc(good[:-1])


def test_snappy_roundtrip_and_property():
    import random

    from xarray_dataaccessor_spark.sources.blosc import (
        snappy_compress,
        snappy_decompress,
    )

    rng = random.Random(0)
    for c in (b"", b"a", b"hello hello hello world " * 40,
              bytes(range(256)) * 8, rng.randbytes(3000), b"\x00" * 70000,
              rng.randbytes(100) * 700):
        assert snappy_decompress(snappy_compress(c)) == c

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(0, 10000), n=st.integers(0, 3000),
           alphabet=st.sampled_from([2, 16, 256]))
    def rt(seed, n, alphabet):
        r = random.Random(seed)
        data = bytes(r.randrange(alphabet) for _ in range(n))
        assert snappy_decompress(snappy_compress(data)) == data

    rt()


def test_snappy_compressor_code_is_2():
    """Regression (r4 ADVICE): the c-blosc header assigns snappy format
    code 2 (5 is unused); emitted chunks must conform so real blosc
    readers accept them."""
    from xarray_dataaccessor_spark.sources.blosc import (
        _COMPRESSOR_CODES,
        decode_blosc,
        encode_blosc,
    )

    data = (b"0123456789abcdef" * 256)
    chunk = encode_blosc(data, typesize=8, cname="snappy")
    assert (chunk[2] >> 5) == 2  # header flags bits 5-7 = compressor code
    assert _COMPRESSOR_CODES[2] == "snappy"
    assert 5 not in _COMPRESSOR_CODES
    assert decode_blosc(chunk) == data
