"""Pure-Python Blosc1 chunk codec (stdlib + numpy) — removes the blosc
gate from the Zarr reader for the compressors public ERA5 Zarr mirrors
actually use (lz4, zlib).

Implements the published c-blosc1 chunk format (BLOSC_HEADER, public
spec in the c-blosc repository docs/README_HEADER.rst):

    byte 0   version            byte 1   versionlz
    byte 2   flags              byte 3   typesize
    4-7      nbytes (LE u32)    8-11     blocksize (LE u32)
    12-15    cbytes (LE u32)

flags: bit0 byte-shuffle, bit1 memcpy (stored raw), bit2 bit-shuffle,
bits 5-7 compressor code (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib,
4 zstd). Non-memcpy chunks carry ``nblocks`` LE u32 block-start offsets,
then per block the c-blosc split layout: ``nsplits`` (typesize splits
for lz4/blosclz when ``blocksize/typesize >= 128`` and
``typesize <= 16``, else 1) of ``[LE i32 csize][payload]``, where
``csize == split size`` marks a stored-raw split. Byte-shuffle is
per-block, undone after the splits are assembled.

The LZ4 *block* format decoder/encoder below is the published spec
(lz4_Block_format.md): token nibbles for literal/match lengths with
255-continuation bytes, 2-byte little-endian match offsets, minimum
match 4, and a literals-only tail. Python-loop speed is fine for the
fixture/ingest chunk sizes this serves; a 100 TB store would decode on
executors where each task touches one chunk (and the zarr extras remain
the vectorized option).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4
_COMPRESSOR_CODES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_MIN_BUFFERSIZE = 128
_MAX_SPLITS = 16


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------
def lz4_decompress_block(src: bytes, dst_size: int) -> bytes:
    """LZ4 block decode (published block format, no frame)."""
    src = bytes(src)
    n = len(src)
    dst = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence: literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block (zero match offset)")
        match_len = token & 0xF
        if match_len == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        start = len(dst) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block (offset before start)")
        if offset >= match_len:
            dst += dst[start : start + match_len]
        else:  # overlapping match: byte-by-byte copy semantics
            for k in range(match_len):
                dst.append(dst[start + k])
    if len(dst) != dst_size:
        raise ValueError(f"LZ4 block decoded {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def lz4_compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block encoder (hash of 4-byte windows, last-5-literals
    + 12-byte end-of-block rules from the spec). Correctness-first — the
    fixture writer and small-grid export path."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0

    def emit(lit_start: int, lit_end: int, offset: int | None, mlen: int):
        nonlocal out
        lit_len = lit_end - lit_start
        token_lit = 15 if lit_len >= 15 else lit_len
        token_match = 0
        if offset is not None:
            token_match = 15 if mlen - 4 >= 15 else mlen - 4
        out.append((token_lit << 4) | token_match)
        rem = lit_len - 15
        while token_lit == 15 and rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out += src[lit_start:lit_end]
        if offset is not None:
            out += struct.pack("<H", offset)
            rem = mlen - 4 - 15
            while token_match == 15 and rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    # matches must end >= 12 bytes before the block end per the spec
    while i + 12 <= n:
        key = src[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and src[j : j + 4] == key:
            mlen = 4
            limit = n - 5  # last 5 bytes are always literals
            while i + mlen < limit and src[j + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, None, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# byte shuffle (per block)
# ---------------------------------------------------------------------------
def _unshuffle(data: bytes, typesize: int) -> bytes:
    nitems, rem = divmod(len(data), typesize)
    if typesize == 1 or nitems == 0:
        return data
    head = np.frombuffer(data[: nitems * typesize], dtype="u1")
    un = head.reshape(typesize, nitems).T.tobytes()
    return un + data[nitems * typesize :]


def _shuffle(data: bytes, typesize: int) -> bytes:
    nitems, rem = divmod(len(data), typesize)
    if typesize == 1 or nitems == 0:
        return data
    head = np.frombuffer(data[: nitems * typesize], dtype="u1")
    sh = head.reshape(nitems, typesize).T.tobytes()
    return sh + data[nitems * typesize :]


def _nsplits(cname: str, typesize: int, blocksize: int) -> int:
    if (
        cname in ("lz4", "blosclz")
        and 1 < typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
        and blocksize % typesize == 0
    ):
        return typesize
    return 1


# ---------------------------------------------------------------------------
# chunk decode / encode
# ---------------------------------------------------------------------------
def decode_blosc(raw: bytes) -> bytes:
    """One Blosc1 chunk -> uncompressed bytes."""
    if len(raw) < 16:
        raise ValueError("Blosc chunk shorter than its 16-byte header")
    flags, typesize = raw[2], raw[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", raw, 4)
    if cbytes != len(raw):
        raise ValueError(f"Blosc header cbytes {cbytes} != chunk size {len(raw)}")
    if flags & _FLAG_MEMCPY:
        return raw[16 : 16 + nbytes]
    if flags & _FLAG_BITSHUFFLE:
        raise NotImplementedError(
            "Blosc bit-shuffle filter unsupported (byte-shuffle and plain "
            "chunks decode here); install the zarr extras."
        )
    cname = _COMPRESSOR_CODES.get(flags >> 5, "unknown")
    if cname == "lz4":
        dec = lz4_decompress_block
    elif cname == "zlib":
        dec = lambda b, size: zlib.decompress(b)  # noqa: E731
    elif cname == "zstd":
        # blosc compresses each split with the codec's one-shot API,
        # which emits complete zstd frames — the pure decoder applies
        from xarray_dataaccessor_spark.sources.zstd import zstd_decompress

        dec = lambda b, size: zstd_decompress(b)  # noqa: E731
    elif cname == "snappy":
        dec = snappy_decompress
    else:
        raise NotImplementedError(
            f"Blosc inner compressor {cname!r} unsupported (lz4/zlib/zstd/"
            "snappy decode here); install the zarr extras."
        )
    nblocks = (nbytes + blocksize - 1) // blocksize
    starts = struct.unpack_from(f"<{nblocks}I", raw, 16)
    out = bytearray()
    for bi, start in enumerate(starts):
        bsize = min(blocksize, nbytes - bi * blocksize)
        nsp = _nsplits(cname, typesize, bsize)
        neblock = bsize // nsp
        pos = start
        block = bytearray()
        for _ in range(nsp):
            (csize,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            payload = raw[pos : pos + csize]
            pos += csize
            block += payload if csize == neblock else dec(payload, neblock)
        if flags & _FLAG_SHUFFLE:
            block = bytearray(_unshuffle(bytes(block), typesize))
        out += block
    if len(out) != nbytes:
        raise ValueError(f"Blosc chunk decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def encode_blosc(
    data: bytes,
    typesize: int,
    cname: str = "lz4",
    shuffle: bool = True,
    blocksize: int | None = None,
) -> bytes:
    """Blosc1 chunk encoder (fixture writer / small-grid export twin of
    :func:`decode_blosc`)."""
    if cname not in ("lz4", "zlib", "zstd", "snappy"):
        raise NotImplementedError(
            f"encode_blosc supports lz4/zlib/zstd/snappy, not {cname!r}"
        )
    nbytes = len(data)
    blocksize = blocksize or min(max(nbytes, typesize), 64 * 1024)
    if blocksize % typesize:
        blocksize += typesize - blocksize % typesize
    code = {"lz4": 1, "snappy": 2, "zlib": 3, "zstd": 4}[cname]
    flags = (code << 5) | (_FLAG_SHUFFLE if shuffle and typesize > 1 else 0)
    nblocks = (nbytes + blocksize - 1) // blocksize
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, flags, typesize
    struct.pack_into("<II", header, 4, nbytes, blocksize)
    starts: list[int] = []
    body = bytearray()
    base = 16 + 4 * nblocks
    for bi in range(nblocks):
        block = data[bi * blocksize : bi * blocksize + blocksize]
        if flags & _FLAG_SHUFFLE:
            block = _shuffle(block, typesize)
        nsp = _nsplits(cname, typesize, len(block))
        neblock = len(block) // nsp
        starts.append(base + len(body))
        for si in range(nsp):
            split = block[si * neblock : (si + 1) * neblock]
            if cname == "lz4":
                comp = lz4_compress_block(split)
            elif cname == "zlib":
                comp = zlib.compress(split, 5)
            elif cname == "zstd":
                from xarray_dataaccessor_spark.sources.zstd import zstd_compress

                comp = zstd_compress(split)
            else:
                comp = snappy_compress(split)
            if len(comp) >= neblock:  # incompressible: store raw per the format
                body += struct.pack("<i", neblock) + split
            else:
                body += struct.pack("<i", len(comp)) + comp
    chunk = bytes(header) + struct.pack(f"<{nblocks}I", *starts) + bytes(body)
    struct.pack_into("<I", header, 12, len(chunk))
    return bytes(header) + chunk[16:]


# ---------------------------------------------------------------------------
# Snappy raw format (blosc compressor codes 2/5): uvarint uncompressed
# length, then tagged elements — literals (tag 00) and copies with
# 1/2/4-byte offsets (tags 01/10/11).
# ---------------------------------------------------------------------------
def snappy_decompress(src: bytes, dst_size: int | None = None) -> bytes:
    src = bytes(src)
    n = len(src)
    # uvarint total length
    total = 0
    shift = 0
    i = 0
    while True:
        b = src[i]
        total |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not b & 0x80:
            break
    dst = bytearray()
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(src[i : i + nb], "little")
                i += nb
            ln += 1
            dst += src[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = src[i] | (src[i + 1] << 8)
            i += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(dst):
            raise ValueError("corrupt snappy stream (bad copy offset)")
        start = len(dst) - off
        for k in range(ln):  # overlapping copies are byte-sequential
            dst.append(dst[start + k])
    if len(dst) != total:
        raise ValueError(f"snappy decoded {len(dst)} bytes, expected {total}")
    if dst_size is not None and len(dst) != dst_size:
        raise ValueError(f"snappy decoded {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def snappy_compress(src: bytes) -> bytes:
    """Greedy snappy encoder (4-byte hash matches, 2-byte-offset copies;
    64-byte copy cap per the format)."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    v = n
    while True:  # uvarint
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break

    def emit_literal(lo: int, hi: int) -> None:
        ln = hi - lo
        while ln > 0:
            take = min(ln, 0x10000)
            if take <= 60:
                out.append(((take - 1) << 2) | 0)
            else:
                nb = (take - 1).bit_length() + 7 >> 3
                out.append(((59 + nb) << 2) | 0)
                out.extend((take - 1).to_bytes(nb, "little"))
            out.extend(src[lo : lo + take])
            lo += take
            ln -= take

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i + 4 <= n:
        key = src[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            ml = 4
            while i + ml < n and src[j + ml] == src[i + ml] and ml < 64:
                ml += 1
            emit_literal(anchor, i)
            out.append(((ml - 1) << 2) | 2)
            out.extend((i - j).to_bytes(2, "little"))
            i += ml
            anchor = i
        else:
            i += 1
    emit_literal(anchor, n)
    return bytes(out)
