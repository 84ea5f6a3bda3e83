"""Pure zstd codec (sources/zstd.py).

Round trips are exact by construction; the spec constants are pinned by
invariants (predefined distributions sum to their table sizes, xxhash64
published vectors, Kraft completeness), and every decoder path the
encoder can reach is reached: Raw/RLE/Compressed blocks, Huffman
literals in 1 and 4 streams, FSE-compressed weight descriptions,
predefined-FSE sequences, repeat offsets, overlapping matches.
"""

from __future__ import annotations

import random

import pytest

from xarray_dataaccessor_spark.sources.zstd import (
    LL_DEFAULT,
    LL_DEFAULT_ALOG,
    ML_DEFAULT,
    ML_DEFAULT_ALOG,
    OF_DEFAULT,
    OF_DEFAULT_ALOG,
    _BackWriter,
    _FwdBits,
    _fse_compress_2state,
    _fse_decompress_2state,
    _huff_decode_stream,
    _huff_encode_table,
    _huff_table_from_weights,
    _read_huff_weights,
    fse_build_decode_table,
    fse_read_distribution,
    fse_write_distribution,
    huff_weights_fse_section,
    xxhash64,
    zstd_compress,
    zstd_decompress,
)


def test_predefined_distributions_sum_to_table_size():
    for norm, alog, nsym in (
        (LL_DEFAULT, LL_DEFAULT_ALOG, 36),
        (OF_DEFAULT, OF_DEFAULT_ALOG, 29),
        (ML_DEFAULT, ML_DEFAULT_ALOG, 53),
    ):
        assert len(norm) == nsym
        assert sum(v if v > 0 else 1 for v in norm) == 1 << alog
        fse_build_decode_table(norm, alog)  # spread must close


def test_xxhash64_published_vectors():
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    # >=32-byte path
    assert xxhash64(b"x" * 100) == xxhash64(b"x" * 100)
    assert xxhash64(b"x" * 100) != xxhash64(b"x" * 99 + b"y")


def test_fse_distribution_writer_reader_roundtrip():
    for norm, alog in (
        (LL_DEFAULT, LL_DEFAULT_ALOG),
        (OF_DEFAULT, OF_DEFAULT_ALOG),
        (ML_DEFAULT, ML_DEFAULT_ALOG),
        ([16, 8, 4, 2, 1, 1], 5),
        ([1, 0, 0, 0, 30, 1], 5),
    ):
        enc = fse_write_distribution(norm, alog)
        got, galog = fse_read_distribution(_FwdBits(enc), len(norm) + 10)
        a, b = list(norm), list(got)
        while a and a[-1] == 0:
            a.pop()
        while b and b[-1] == 0:
            b.pop()
        assert galog == alog and a == b


def test_two_state_fse_roundtrip():
    norm = [16, 8, 4, 2, 1, 1]
    table = fse_build_decode_table(norm, 5)
    rng = random.Random(1)
    for _ in range(100):
        n = rng.choice([4, 6, 8, 20, 60])
        syms = [rng.choice([0, 0, 0, 1, 1, 2, 3, 4, 5]) for _ in range(n)]
        enc = _fse_compress_2state(syms, norm, 5)
        assert list(_fse_decompress_2state(table, 5, enc, 255)) == syms


def test_huffman_weight_sections_and_streams():
    weights = [2, 2, 2, 1]  # + implicit 1 completes 2^3
    sec = huff_weights_fse_section(weights)
    got, used = _read_huff_weights(sec)
    assert used == len(sec) and got == [2, 2, 2, 1, 1]
    mb, lookup = _huff_table_from_weights(got)
    mb2, enc = _huff_encode_table(got)
    assert mb == mb2 == 3
    data = [0, 1, 2, 3, 4, 0, 0, 2, 4, 1]
    bw = _BackWriter()
    for s in data:
        c, nb = enc[s]
        bw.write(c, nb)
    assert list(_huff_decode_stream(bw.bytes(), mb, lookup, len(data))) == data


def test_frame_roundtrips():
    rng = random.Random(0)
    cases = [
        b"",
        b"a",
        b"hello world " * 50,
        bytes(range(256)) * 10,
        b"abcabcabc" * 60,            # short-offset overlapping matches
        b"\x00" * 5000,               # RLE block
        rng.randbytes(5000),          # incompressible -> Raw block
        bytes(rng.choices(b"abcdefgh entresio", k=4000)),   # huffman 4-stream
        bytes(rng.choices(b"etaoin", k=900)),               # huffman 1-stream
        (b"the quick brown fox. " * 40 + rng.randbytes(200)) * 3,
        rng.randbytes(300_000),       # multi-block
        (b"block-spanning repeated content 12345678 " * 8000),  # matches across 128K blocks
    ]
    for c in cases:
        enc = zstd_compress(c)
        assert zstd_decompress(enc) == c, len(c)


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 100000),
        n=st.integers(0, 4000),
        alphabet=st.sampled_from([2, 8, 64, 256]),
        runs=st.booleans(),
    )
    def rt(seed, n, alphabet, runs):
        rng = random.Random(seed)
        if runs:
            out = bytearray()
            while len(out) < n:
                out += bytes([rng.randrange(alphabet)]) * rng.randrange(1, 30)
            data = bytes(out[:n])
        else:
            data = bytes(rng.randrange(alphabet) for _ in range(n))
        assert zstd_decompress(zstd_compress(data)) == data

    rt()


def test_corruption_detected():
    data = b"payload " * 200
    enc = bytearray(zstd_compress(data))
    enc[-2] ^= 0xFF  # checksum byte
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(enc))
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")


def test_treeless_literals_reuse_previous_tree():
    """Literals type 3 (Treeless) reuses the previous block's Huffman
    table — decoded here through two hand-assembled compressed blocks."""
    from xarray_dataaccessor_spark.sources.zstd import _decode_block

    # block 1: compressed literals with a direct-weight tree, no sequences
    weights = [2, 2, 2, 1]  # symbols 0..3 explicit, 4 implicit -> 2^3
    tree = bytes([127 + len(weights), 0x22, 0x21])  # nibbles 2,2 / 2,1
    from xarray_dataaccessor_spark.sources.zstd import (
        _huff_table_from_weights,
        _huff_encode_table,
    )

    full = weights + [1]
    mb, enc = _huff_encode_table(full)
    data1 = [0, 1, 2, 3, 4, 0, 1, 2]
    bw = _BackWriter()
    for s in data1:
        c, nb = enc[s]
        bw.write(c, nb)
    stream1 = bw.bytes()
    csize1 = len(tree) + len(stream1)
    hdr1 = 2 | (0 << 2) | ((len(data1) | (csize1 << 10)) << 4)
    blk1 = hdr1.to_bytes(3, "little") + tree + stream1 + b"\x00"
    # block 2: treeless literals, same stream encoding, no tree bytes
    data2 = [4, 3, 2, 1, 0, 0]
    bw = _BackWriter()
    for s in data2:
        c, nb = enc[s]
        bw.write(c, nb)
    stream2 = bw.bytes()
    hdr2 = 3 | (0 << 2) | ((len(data2) | (len(stream2) << 10)) << 4)
    blk2 = hdr2.to_bytes(3, "little") + stream2 + b"\x00"

    out = bytearray()
    tables: dict = {}
    huff = _decode_block(blk1, out, None, tables)
    assert list(out) == data1
    _decode_block(blk2, out, huff, tables)
    assert list(out) == data1 + data2
    # treeless without a previous tree must refuse
    with pytest.raises(ValueError, match="treeless"):
        _decode_block(blk2, bytearray(), None, {})


def test_concatenated_and_skippable_frames():
    """Real zstd streams concatenate frames and may embed skippable
    frames (magic 0x184D2A5x); both decode transparently."""
    import struct

    a, b = b"first frame " * 30, b"second frame content " * 20
    skippable = struct.pack("<II", 0x184D2A50, 5) + b"metaX"
    stream = zstd_compress(a) + skippable + zstd_compress(b)
    assert zstd_decompress(stream) == a + b


def test_corruption_fuzz_terminates_with_errors():
    """Seeded bit-flip sweep: every corruption must either decode (the
    flip landed somewhere checked later) or raise a normal error —
    never loop unboundedly (truncated block headers used to)."""
    rng = random.Random(7)
    base = zstd_compress(b"compressible payload text " * 40)
    for _ in range(150):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            zstd_decompress(bytes(buf))
        except (ValueError, IndexError, KeyError, struct_error, OverflowError):
            pass


from struct import error as struct_error  # noqa: E402


def test_repeat_mode_after_predefined_tables():
    """Regression (r4 ADVICE): Repeat_Mode (3) repeats whatever sequence
    table was last USED — including Predefined_Mode tables — not only
    FSE_Compressed ones (RFC 8878 §4.2.2)."""
    from xarray_dataaccessor_spark.sources.zstd import (
        _decode_block,
        _encode_block_body,
        _encode_literals,
        _find_sequences,
    )

    block = b"abcdefgh" * 8 + b"tail-literals"
    body = _encode_block_body(block)
    seqs, _trail, lits = _find_sequences(block, 0)
    assert seqs, "fixture must produce at least one sequence"
    mpos = len(_encode_literals(lits)) + 1  # n_seq < 128 -> 1 header byte
    assert body[mpos] == 0  # encoder emits all-predefined modes
    # same bitstream, modes byte patched to repeat/repeat/repeat
    body_repeat = body[:mpos] + bytes([0xFC]) + body[mpos + 1:]

    out = bytearray()
    tables: dict = {}
    _decode_block(body, out, None, tables)
    assert bytes(out) == block
    _decode_block(body_repeat, out, None, tables)
    assert bytes(out) == block + block
    # repeat with NO previous table at all must still refuse
    with pytest.raises(ValueError, match="repeat mode"):
        _decode_block(body_repeat, bytearray(), None, {})


def test_huffman_weight_bound_rejected():
    """Regression (r4 ADVICE): weights above HUF max (11) must be
    rejected before the 2^max_bits lookup allocation."""
    from xarray_dataaccessor_spark.sources.zstd import _read_huff_weights

    # direct header: 2 explicit weights, first is 12 (> 11)
    data = bytes([127 + 2, (12 << 4) | 1])
    with pytest.raises(ValueError, match="weight exceeds"):
        _read_huff_weights(data)
