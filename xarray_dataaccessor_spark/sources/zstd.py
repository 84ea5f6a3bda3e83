"""Pure-Python Zstandard codec (RFC 8878; stdlib only).

The last compression gate in the format family: Zarr v2/v3 stores and
Blosc frames in the wild increasingly default to zstd, and this
container has no zstd binding — so the decoder here is what lets those
stores ingest, and the encoder builds spec-conforming fixtures the same
way the PNG/JPEG/FLAC writers do.

- decoder: frame header (single-segment and windowed, content size,
  optional dictionary-id field, xxhash64 content checksum — verified),
  Raw / RLE / Compressed blocks; literals sections Raw / RLE /
  Compressed / Treeless with 1- and 4-stream Huffman (direct AND
  FSE-compressed weight descriptions); sequences with all four symbol
  compression modes (predefined RFC distributions, RLE, FSE-compressed
  table descriptions, repeat); repeat-offset history with the
  literals-length-0 shift rule; overlap-safe match copy.
- encoder: single-segment frames with a greedy hash-chain match
  finder, canonical-Huffman literals (1/4 streams, direct weights),
  predefined-FSE sequence coding, RLE/Raw fallbacks, xxhash64
  checksum. decode(encode(x)) == x exactly on arbitrary bytes, and the
  interleaved FSE state machine is exercised end-to-end.

The RFC's predefined distributions and baseline tables are transcribed
below; a unit test asserts each normalized distribution sums to its
table size (the spec invariant a mistranscription would break).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528

# ---------------------------------------------------------------------------
# xxhash64 (public algorithm; used by zstd's content checksum)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<Q", data, i + 8 * j)
                v = (v + lane * _P2) & _M64
                v = (_rotl(v, 31) * _P1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (((h ^ v) * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, i)
        k = (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((lane * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M64), 11)) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bit IO: zstd packs bits little-endian. Forward reader (table
# descriptions) consumes LSB-first; backward reader (Huffman/FSE
# streams) starts from the final byte's sentinel bit and reads DOWN.
# ---------------------------------------------------------------------------


class _FwdBits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bitstream: find the sentinel 1-bit in the last byte,
    then read fields MSB-to-LSB moving toward the first byte."""

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupted backward bitstream (no sentinel)")
        total = len(data) * 8
        sentinel = 8 - data[-1].bit_length()
        self.data = data
        self.avail = total - sentinel - 1  # bits below the sentinel

    def read(self, n: int) -> int:
        """Read n bits; reading past the start zero-pads but drives
        ``avail`` negative — the overflow marker the interleaved weight
        decoder terminates on."""
        if n == 0:
            return 0
        take = min(n, max(self.avail, 0))
        v = 0
        for _ in range(take):
            self.avail -= 1
            byte = self.data[self.avail >> 3]
            v = (v << 1) | ((byte >> (self.avail & 7)) & 1)
        if take < n:
            self.avail -= n - take  # phantom zero bits; marks overflow
        return v << (n - take)


class _FwdWriter:
    """Forward LSB-first bit writer (table descriptions)."""

    def __init__(self):
        self.acc = 0
        self.n = 0

    def write(self, v: int, nb: int) -> None:
        self.acc |= (v & ((1 << nb) - 1)) << self.n
        self.n += nb

    def bytes(self) -> bytes:
        return self.acc.to_bytes((self.n + 7) >> 3, "little")


class _BackWriter:
    """Builds a backward bitstream: fields APPENDED here are read in the
    same order by _BackBits, i.e. append in decoder read order."""

    def __init__(self):
        self.bits: list[tuple[int, int]] = []

    def write(self, v: int, n: int) -> None:
        if n:
            self.bits.append((v & ((1 << n) - 1), n))

    def bytes(self) -> bytes:
        # assemble: first-appended field occupies the TOP bits
        acc = 1  # sentinel
        for v, n in self.bits:
            acc = (acc << n) | v
        nbits = acc.bit_length()
        nbytes = (nbits + 7) >> 3
        return acc.to_bytes(nbytes, "little")


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def fse_build_decode_table(norm: list[int], accuracy_log: int):
    """RFC 8878 §4.1.1: normalized counts -> decode table rows of
    (symbol, nb_bits, baseline)."""
    size = 1 << accuracy_log
    table_sym = [0] * size
    high = size - 1
    # "less than 1" symbols get one cell each at the table's end
    for s, c in enumerate(norm):
        if c == -1:
            table_sym[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(norm):
        if c <= 0:
            continue
        for _ in range(c):
            table_sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupted FSE distribution (spread mismatch)")
    # per-cell nb_bits/baseline: cells of a symbol in increasing state
    # order continue the symbol's state counter
    next_state = [c if c > 0 else 1 for c in norm]
    low_marker = [c == -1 for c in norm]
    rows = [None] * size
    # low-prob cells (at table end) reset: full accuracy_log bits, base 0
    counters = {}
    for state in range(size):
        s = table_sym[state]
        if low_marker[s]:
            rows[state] = (s, accuracy_log, 0)
            continue
        x = counters.get(s, norm[s])
        nb = accuracy_log - (x.bit_length() - 1)
        base = (x << nb) - size
        rows[state] = (s, nb, base)
        counters[s] = x + 1
    return rows


def fse_read_distribution(fb: _FwdBits, max_symbols: int):
    """Read an FSE table description (forward LSB bitstream) ->
    (normalized counts, accuracy_log). The variable-width probability
    coding follows the reference FSE_readNCount flow: a probability is
    read in nb_bits-1 bits when its low value falls under the spare
    range, else in nb_bits with the spare range folded away; remaining
    mass halves the threshold as it depletes."""
    accuracy_log = fb.read(4) + 5
    if accuracy_log > 9:
        raise ValueError(f"zstd: FSE accuracy {accuracy_log} > 9")
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    norm: list[int] = []
    while remaining > 1 and len(norm) <= max_symbols:
        spare = (2 * threshold - 1) - remaining
        low = fb.read(nb_bits - 1)
        if low < spare:
            count = low
        else:
            extra = fb.read(1)
            count = low + (extra << (nb_bits - 1))
            if count >= threshold:
                count -= spare
        count -= 1  # -1 means "less than 1"
        norm.append(count)
        remaining -= -count if count < 0 else count
        if count == 0:
            while True:
                rep = fb.read(2)
                norm.extend([0] * rep)
                if rep != 3:
                    break
        while remaining < threshold and threshold > 1:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupted FSE table description")
    return norm, accuracy_log


def _fse_decompress_2state(table, alog: int, stream: bytes, max_out: int) -> bytes:
    """Generic interleaved 2-state FSE decompression (the scheme huff0
    uses for weight tables): symbols alternate between the two states;
    when a state update overruns the bitstream, one final symbol from
    the OTHER state is emitted and decoding ends."""
    bb = _BackBits(stream)
    s1 = bb.read(alog)
    s2 = bb.read(alog)
    out = bytearray()
    while len(out) <= max_out:
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + bb.read(nb)
        if bb.avail < 0:
            out.append(table[s2][0])
            return bytes(out)
        sym2, nb2, base2 = table[s2]
        out.append(sym2)
        s2 = base2 + bb.read(nb2)
        if bb.avail < 0:
            out.append(table[s1][0])
            return bytes(out)
    raise ValueError("zstd: runaway FSE weight stream")


def _fse_compress_2state(symbols: list[int], norm: list[int], alog: int) -> bytes:
    """Encode ``symbols`` so :func:`_fse_decompress_2state` reproduces
    them exactly: even indices ride state 1, odd indices state 2; the
    final symbol is the post-overflow flush, so its state needs no
    bits. Requires len(symbols) >= 4 and even."""
    if len(symbols) < 4 or len(symbols) % 2:
        raise ValueError("2-state FSE needs an even count >= 4")
    cells = _fse_encode_cells(norm, alog)
    a_syms = symbols[0::2]
    b_syms = symbols[1::2]
    # A's final update is the overflow trigger: it must read >= 1 bit
    sa, ba = _fse_chain(a_syms, cells, end_nb_positive=True)
    sb, bbits = _fse_chain(b_syms, cells)
    bw = _BackWriter()
    bw.write(sa[0], alog)
    bw.write(sb[0], alog)
    for i in range(len(a_syms) - 1):
        bw.write(*ba[i])
        bw.write(*bbits[i])
    return bw.bytes()


# ---------------------------------------------------------------------------
# Huffman literals
# ---------------------------------------------------------------------------


def _huff_table_from_weights(weights: list[int]):
    """Canonical Huffman decode table from explicit weights (last weight
    implicit per spec — the caller appends it). Returns
    (max_bits, lookup list of (symbol, nb_bits) of size 2^max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total & (total - 1):
        raise ValueError("zstd: corrupted Huffman weights (not a power of 2)")
    max_bits = total.bit_length() - 1  # total == 2^max_bits
    if max_bits > 11:  # HUF_TABLELOG_MAX — bounds the 2^max_bits lookup
        raise ValueError("zstd: Huffman table log exceeds spec maximum (11)")
    # number of bits per symbol = max_bits + 1 - weight
    ranked = sorted(
        (s for s, w in enumerate(weights) if w > 0),
        key=lambda s: (weights[s], -s),
    )
    # canonical assignment: lower weight (longer code) first, codes
    # ascending; spec assigns by increasing weight, symbols ascending
    lookup = [None] * (1 << max_bits)
    code = 0
    for w in range(1, max_bits + 1):
        syms = [s for s, ww in enumerate(weights) if ww == w]
        nb = max_bits + 1 - w
        span = 1 << (w - 1)
        for s in syms:
            for i in range(span):
                lookup[code + i] = (s, nb)
            code += span
    if code != (1 << max_bits):
        raise ValueError("zstd: corrupted Huffman weights (not Kraft-complete)")
    return max_bits, lookup


def _read_huff_weights(data: bytes):
    """Huffman tree description -> (weights incl. implicit last,
    bytes consumed)."""
    hb = data[0]
    if hb >= 128:  # direct: hb-127 weights, 4-bit each
        n = hb - 127
        weights = []
        for i in range(n):
            nib = data[1 + i // 2]
            weights.append((nib >> 4) if i % 2 == 0 else (nib & 0x0F))
        used = 1 + (n + 1) // 2
    else:  # FSE-compressed weights: hb = compressed size
        fb = _FwdBits(data[1 : 1 + hb])
        norm, alog = fse_read_distribution(fb, 255)
        table = fse_build_decode_table(norm, alog)
        stream = data[1 + fb.bytes_consumed() : 1 + hb]
        weights = list(_fse_decompress_2state(table, alog, stream, 255))
        used = 1 + hb
    # HUF_TABLELOG_MAX is 11: any larger weight is corrupt and would drive
    # a 2^weight lookup allocation downstream — reject before building it
    if any(w > 11 for w in weights):
        raise ValueError("zstd: Huffman weight exceeds spec maximum (11)")
    # implicit last weight completes the next power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman tree")
    nxt = 1 << (total - 1).bit_length() if total & (total - 1) else total
    if nxt == total:
        nxt <<= 1
    rest = nxt - total
    if rest & (rest - 1):
        raise ValueError("zstd: invalid Huffman weight total")
    weights.append(rest.bit_length())
    return weights, used


def _huff_decode_stream(data: bytes, max_bits: int, lookup, n_out: int) -> bytes:
    bb = _BackBits(data)
    out = bytearray()
    state = bb.read(max_bits)
    while len(out) < n_out:
        sym, nb = lookup[state]
        out.append(sym)
        state = ((state << nb) | bb.read(nb)) & ((1 << max_bits) - 1)
    return bytes(out)


# ---------------------------------------------------------------------------
# Predefined sequence tables (RFC 8878 §3.1.1.3.2.2)
# ---------------------------------------------------------------------------

LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
              2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
LL_DEFAULT_ALOG = 6
ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
ML_DEFAULT_ALOG = 6
OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, -1, -1, -1, -1, -1]
OF_DEFAULT_ALOG = 5

#: literals-length codes -> (baseline, extra bits)
LL_TABLE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
#: match-length codes -> (baseline, extra bits)
ML_TABLE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def zstd_decompress(data: bytes) -> bytes:
    """Decode a zstd stream (RFC 8878): one or more concatenated frames,
    with skippable frames (magic 0x184D2A5x) skipped. Content checksums
    are verified when present."""
    out_all = bytearray()
    pos = 0
    while pos < len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            (skip,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + skip
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError("Not a zstd frame (bad magic)")
        pos = _decode_frame(data, pos, out_all)
    return bytes(out_all)


def _decode_frame(data: bytes, pos: int, out_all: bytearray) -> int:
    pos += 4
    fhd = data[pos]
    pos += 1
    dict_flag = fhd & 0x03
    checksum_flag = (fhd >> 2) & 1
    single_segment = (fhd >> 5) & 1
    fcs_flag = (fhd >> 6) & 0x03
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_len:
        content_size = int.from_bytes(data[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256
        pos += fcs_len
    out = bytearray()
    prev_huff = None
    prev_tables = {}
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 0x03
        bsize = hdr >> 3
        if btype == 0:  # Raw
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            out += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:  # Compressed
            prev_huff = _decode_block(
                data[pos : pos + bsize], out, prev_huff, prev_tables
            )
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if checksum_flag:
        (want,) = struct.unpack_from("<I", data, pos)
        if xxhash64(bytes(out)) & 0xFFFFFFFF != want:
            raise ValueError("zstd: content checksum mismatch")
        pos += 4
    if content_size is not None and len(out) != content_size:
        raise ValueError("zstd: content size mismatch")
    out_all += out
    return pos


def _decode_block(blk: bytes, out: bytearray, prev_huff, prev_tables):
    # --- literals section ---
    b0 = blk[0]
    lit_type = b0 & 0x03
    size_fmt = (b0 >> 2) & 0x03
    if lit_type in (0, 1):  # Raw / RLE
        if size_fmt in (0, 2):
            rsize = b0 >> 3
            p = 1
        elif size_fmt == 1:
            rsize = (b0 >> 4) | (blk[1] << 4)
            p = 2
        else:
            rsize = (b0 >> 4) | (blk[1] << 4) | (blk[2] << 12)
            p = 3
        if lit_type == 0:
            literals = blk[p : p + rsize]
            p += rsize
        else:
            literals = blk[p : p + 1] * rsize
            p += 1
        huff = prev_huff
    else:  # Compressed / Treeless
        if size_fmt in (0, 1):
            v = b0 >> 4 | (blk[1] << 4) | (blk[2] << 12)
            rsize = v & 0x3FF
            csize = v >> 10
            p = 3
            streams = 1 if size_fmt == 0 else 4
        elif size_fmt == 2:
            v = (b0 >> 4) | (blk[1] << 4) | (blk[2] << 12) | (blk[3] << 20)
            rsize = v & 0x3FFF
            csize = v >> 14
            p = 4
            streams = 4
        else:
            v = (
                (b0 >> 4) | (blk[1] << 4) | (blk[2] << 12)
                | (blk[3] << 20) | (blk[4] << 28)
            )
            rsize = v & 0x3FFFF
            csize = v >> 18
            p = 5
            streams = 4
        section = blk[p : p + csize]
        p += csize
        if lit_type == 2:
            weights, used = _read_huff_weights(section)
            huff = _huff_table_from_weights(weights)
            section = section[used:]
        else:
            if prev_huff is None:
                raise ValueError("zstd: treeless literals without a tree")
            huff = prev_huff
        max_bits, lookup = huff
        if streams == 1:
            literals = _huff_decode_stream(section, max_bits, lookup, rsize)
        else:
            if rsize < 4:
                raise ValueError(
                    "zstd: 4-stream Huffman literals with regenerated "
                    f"size {rsize} (spec requires streams of >= 1 byte)"
                )
            s1, s2, s3 = struct.unpack_from("<HHH", section, 0)
            body = section[6:]
            sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
            outs = []
            off = 0
            per = (rsize + 3) // 4
            want = [per, per, per, rsize - 3 * per]
            for sz, w in zip(sizes, want):
                outs.append(
                    _huff_decode_stream(body[off : off + sz], max_bits, lookup, w)
                )
                off += sz
            literals = b"".join(outs)
    # --- sequences section ---
    seq = blk[p:]
    b = seq[0]
    if b == 0:
        out += literals
        return huff
    if b < 128:
        n_seq = b
        q = 1
    elif b < 255:
        n_seq = ((b - 128) << 8) + seq[1]
        q = 2
    else:
        n_seq = seq[1] + (seq[2] << 8) + 0x7F00
        q = 3
    modes = seq[q]
    q += 1
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3

    def load_table(mode, key, default, default_alog, max_sym, max_alog):
        nonlocal q
        if mode == 0:
            t = fse_build_decode_table(default, default_alog), default_alog
            prev_tables[key] = t  # Repeat_Mode repeats the LAST-USED table,
            return t              # whatever mode loaded it (RFC 8878 §4.2.2)
        if mode == 1:  # RLE: single symbol, 0-bit table
            sym = seq[q]
            q += 1
            t = [(sym, 0, 0)], 0
            prev_tables[key] = t
            return t
        if mode == 2:
            fb = _FwdBits(seq[q:])
            norm, alog = fse_read_distribution(fb, max_sym)
            if alog > max_alog:
                raise ValueError("zstd: sequence table accuracy too large")
            q += fb.bytes_consumed()
            t = fse_build_decode_table(norm, alog), alog
            prev_tables[key] = t
            return t
        if key not in prev_tables:
            raise ValueError("zstd: repeat mode without a previous table")
        return prev_tables[key]

    ll_t, ll_alog = load_table(ll_mode, "ll", LL_DEFAULT, LL_DEFAULT_ALOG, 35, 9)
    of_t, of_alog = load_table(of_mode, "of", OF_DEFAULT, OF_DEFAULT_ALOG, 31, 8)
    ml_t, ml_alog = load_table(ml_mode, "ml", ML_DEFAULT, ML_DEFAULT_ALOG, 52, 9)

    bb = _BackBits(seq[q:])
    ll_state = bb.read(ll_alog)
    of_state = bb.read(of_alog)
    ml_state = bb.read(ml_alog)
    rep = [1, 4, 8]
    lit_pos = 0
    for i in range(n_seq):
        of_sym = of_t[of_state][0]
        ml_sym = ml_t[ml_state][0]
        ll_sym = ll_t[ll_state][0]
        of_value = (1 << of_sym) + bb.read(of_sym)
        ml_base, ml_bits = ML_TABLE[ml_sym]
        ml = ml_base + bb.read(ml_bits)
        ll_base, ll_bits = LL_TABLE[ll_sym]
        ll = ll_base + bb.read(ll_bits)
        # repeat-offset resolution
        if of_value > 3:
            offset = of_value - 3
            rep = [offset, rep[0], rep[1]]
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep = [offset, rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                rep = [offset, rep[0], rep[1]]
            else:  # of_value==3, ll==0: rep[0]-1
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: offset 0")
                rep = [offset, rep[0], rep[1]]
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        # overlap-safe copy
        start = len(out) - offset
        for j in range(ml):
            out.append(out[start + j])
        if i < n_seq - 1:
            ll_state = ll_t[ll_state][2] + bb.read(ll_t[ll_state][1])
            ml_state = ml_t[ml_state][2] + bb.read(ml_t[ml_state][1])
            of_state = of_t[of_state][2] + bb.read(of_t[of_state][1])
    out += literals[lit_pos:]
    return huff


# ---------------------------------------------------------------------------
# Encoder (fixture writer): single-segment frames, greedy matches,
# canonical-Huffman literals with direct weights, predefined-FSE
# sequences, xxhash64 checksum. Lossless by construction.
# ---------------------------------------------------------------------------


def _fse_encode_cells(norm: list[int], accuracy_log: int):
    """Per-symbol encode view of the decode table: for each symbol, the
    list of (state, baseline, nb) cells; cell ranges partition [0, size)
    so the backward chain step is a unique lookup."""
    rows = fse_build_decode_table(norm, accuracy_log)
    cells: dict[int, list[tuple[int, int, int]]] = {}
    for state, (sym, nb, base) in enumerate(rows):
        cells.setdefault(sym, []).append((state, base, nb))
    return cells


def _fse_chain(
    symbols: list[int], cells, end_nb_positive: bool = False
) -> tuple[list[int], list[tuple[int, int]]]:
    """Backward state-chain construction: returns (states per step,
    update-bit fields (value, nb) per step i -> transition i->i+1).
    ``end_nb_positive`` picks a final cell whose update reads >= 1 bit
    (the 2-state weight scheme terminates on that read overflowing)."""
    n = len(symbols)
    states = [0] * n
    # last step: canonical first cell of its symbol
    end_cells = cells[symbols[n - 1]]
    if end_nb_positive:
        positive = [c for c in end_cells if c[2] > 0]
        if not positive:
            raise ValueError("no bit-consuming final cell for this symbol")
        end_cells = positive
    states[n - 1] = end_cells[0][0]
    bits: list[tuple[int, int]] = [None] * (n - 1)
    for i in range(n - 2, -1, -1):
        target = states[i + 1]
        for st, base, nb in cells[symbols[i]]:
            if base <= target < base + (1 << nb):
                states[i] = st
                bits[i] = (target - base, nb)
                break
        else:  # pragma: no cover - ranges partition the state space
            raise AssertionError("FSE cell ranges must cover the state space")
    return states, bits


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    for code in range(len(LL_TABLE) - 1, 15, -1):
        if v >= LL_TABLE[code][0]:
            return code
    raise ValueError(v)


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    for code in range(len(ML_TABLE) - 1, 31, -1):
        if v >= ML_TABLE[code][0]:
            return code
    raise ValueError(v)


def _huff_encode_table(weights: list[int]):
    """(max_bits, {symbol: (code, nb)}) with the same canonical
    assignment as _huff_table_from_weights."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1  # total == 2^max_bits
    enc = {}
    code = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for s, ww in enumerate(weights):
            if ww == w:
                enc[s] = (code >> (max_bits - nb), nb)
                code += span
    return max_bits, enc


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int] | None:
    """Plain heap Huffman code lengths; None when unusable for the
    direct-weight header (depth > 11 or symbol space too wide)."""
    import heapq

    if len(freqs) < 2:
        return None
    heap = [(f, [s]) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    if max(depth.values()) > 11:
        return None
    return depth


def _encode_literals(lit: bytes) -> bytes:
    """Literals section: RLE / compressed-Huffman / Raw, whichever is
    legal and smallest."""
    n = len(lit)
    if n and lit.count(lit[0:1]) == n and n < (1 << 20):
        if n < 32:
            return bytes([1 | (0 << 2) | (n << 3)]) + lit[:1]
        return bytes([
            1 | (1 << 2) | ((n & 0x0F) << 4), (n >> 4) & 0xFF,
        ]) + lit[:1] if n < (1 << 12) else _raw_literals(lit)
    if n >= 64:
        freqs: dict[int, int] = {}
        for b in lit:
            freqs[b] = freqs.get(b, 0) + 1
        lengths = _huffman_lengths(freqs)
        if lengths is not None and max(freqs) <= 127:
            max_len = max(lengths.values())
            weights = [0] * (max(freqs) + 1)
            for s, l in lengths.items():
                weights[s] = max_len + 1 - l
            # direct header: weights for all symbols except the LAST
            # nonzero one (implicit); symbol count <= 128
            last_sym = max(freqs)
            head_weights = weights[:last_sym]
            if len(head_weights) <= 128:
                tree = bytes([127 + len(head_weights)])
                nibs = bytearray()
                for i in range(0, len(head_weights), 2):
                    hi = head_weights[i] << 4
                    lo = head_weights[i + 1] if i + 1 < len(head_weights) else 0
                    nibs.append(hi | lo)
                tree += bytes(nibs)
                max_bits, enc = _huff_encode_table(weights)

                def stream(chunk: bytes) -> bytes:
                    bw = _BackWriter()
                    for b in chunk:
                        c, nb = enc[b]
                        bw.write(c, nb)
                    return bw.bytes()

                if n <= 1023:
                    body = stream(lit)
                    csize = len(tree) + len(body)
                    if csize <= 1023 and csize < n:
                        hdr = 2 | (0 << 2) | ((n | (csize << 10)) << 4)
                        return hdr.to_bytes(3, "little") + tree + body
                else:
                    per = (n + 3) // 4
                    chunks = [lit[i * per : (i + 1) * per] for i in range(4)]
                    streams = [stream(c) for c in chunks]
                    sizes = struct.pack(
                        "<HHH", len(streams[0]), len(streams[1]), len(streams[2])
                    )
                    body = sizes + b"".join(streams)
                    csize = len(tree) + len(body)
                    if n < (1 << 14) and csize < (1 << 14) and csize < n:
                        hdr = 2 | (2 << 2) | ((n | (csize << 14)) << 4)
                        return hdr.to_bytes(4, "little") + tree + body
    return _raw_literals(lit)


def _raw_literals(lit: bytes) -> bytes:
    n = len(lit)
    if n < 32:
        return bytes([0 | (0 << 2) | (n << 3)]) + lit
    if n < (1 << 12):
        return bytes([0 | (1 << 2) | ((n & 0x0F) << 4), (n >> 4) & 0xFF]) + lit
    return bytes([
        0 | (3 << 2) | ((n & 0x0F) << 4), (n >> 4) & 0xFF, (n >> 12) & 0xFF,
    ]) + lit


def _find_sequences(block: bytes, base_offset: int):
    """Greedy 4-byte hash-chain match finder. Returns (sequences as
    (ll, ml, offset), trailing literals, all literals bytes)."""
    seqs = []
    lits = bytearray()
    n = len(block)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = block[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= (1 << 20):
            ml = 4
            while i + ml < n and block[j + ml] == block[i + ml] and ml < 65000:
                ml += 1
            # spec: the LAST match of a block must end at least 1 byte
            # before the end? (last_literals can be empty; but ml must
            # leave the sequence valid) — keep 1 trailing literal for
            # simplicity
            if i + ml >= n:
                ml = n - i - 1
            if ml >= 4:
                seqs.append((i - lit_start, ml, i - j))
                lits += block[lit_start:i]
                for k in range(i + 1, min(i + ml, n - 3)):
                    table[block[k : k + 4]] = k
                i += ml
                lit_start = i
                continue
        i += 1
    lits += block[lit_start:]
    trailing = n - lit_start
    return seqs, trailing, bytes(lits)


def _encode_block_body(block: bytes) -> bytes:
    seqs, trailing, lits = _find_sequences(block, 0)
    out = bytearray(_encode_literals(lits))
    n_seq = len(seqs)
    if n_seq == 0:
        out.append(0)
        return bytes(out)
    if n_seq < 128:
        out.append(n_seq)
    elif n_seq < 0x7F00:
        out += bytes([128 + (n_seq >> 8), n_seq & 0xFF])
    else:
        out += bytes([255, n_seq & 0xFF, (n_seq >> 8) & 0xFF])
    out.append((0 << 6) | (0 << 4) | (0 << 2))  # all predefined
    ll_cells = _fse_encode_cells(LL_DEFAULT, LL_DEFAULT_ALOG)
    of_cells = _fse_encode_cells(OF_DEFAULT, OF_DEFAULT_ALOG)
    ml_cells = _fse_encode_cells(ML_DEFAULT, ML_DEFAULT_ALOG)
    ll_syms, of_syms, ml_syms = [], [], []
    extras = []
    for ll, ml, offset in seqs:
        of_value = offset + 3
        of_sym = of_value.bit_length() - 1
        ll_sym = _ll_code(ll)
        ml_sym = _ml_code(ml)
        of_syms.append(of_sym)
        ll_syms.append(ll_sym)
        ml_syms.append(ml_sym)
        extras.append((
            (of_value - (1 << of_sym), of_sym),
            (ml - ML_TABLE[ml_sym][0], ML_TABLE[ml_sym][1]),
            (ll - LL_TABLE[ll_sym][0], LL_TABLE[ll_sym][1]),
        ))
    ll_states, ll_bits = _fse_chain(ll_syms, ll_cells)
    of_states, of_bits = _fse_chain(of_syms, of_cells)
    ml_states, ml_bits = _fse_chain(ml_syms, ml_cells)
    bw = _BackWriter()
    bw.write(ll_states[0], LL_DEFAULT_ALOG)
    bw.write(of_states[0], OF_DEFAULT_ALOG)
    bw.write(ml_states[0], ML_DEFAULT_ALOG)
    for i in range(n_seq):
        (ofv, ofn), (mlv, mln), (llv, lln) = extras[i]
        bw.write(ofv, ofn)
        bw.write(mlv, mln)
        bw.write(llv, lln)
        if i < n_seq - 1:
            bw.write(*ll_bits[i])
            bw.write(*ml_bits[i])
            bw.write(*of_bits[i])
    out += bw.bytes()
    return bytes(out)


def zstd_compress(data: bytes, block_size: int = 1 << 17) -> bytes:
    """bytes -> one zstd frame (single segment, content size, xxhash64
    checksum). Greedy matches + predefined FSE + Huffman literals; falls
    back to Raw blocks when compression does not pay."""
    out = bytearray()
    n = len(data)
    if n < 256:
        fhd = (1 << 5) | (1 << 2) | (0 << 6)
        fcs = bytes([n])
    elif n < 65536 + 256:
        fhd = (1 << 5) | (1 << 2) | (1 << 6)
        fcs = struct.pack("<H", n - 256)
    else:
        fhd = (1 << 5) | (1 << 2) | (2 << 6)
        fcs = struct.pack("<I", n)
    out += struct.pack("<I", ZSTD_MAGIC) + bytes([fhd]) + fcs
    blocks = [data[i : i + block_size] for i in range(0, n, block_size)] or [b""]
    for bi, blk in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        body = _encode_block_body(blk) if len(blk) >= 16 else None
        if body is not None and len(body) < len(blk):
            hdr = last | (2 << 1) | (len(body) << 3)
            out += hdr.to_bytes(3, "little") + body
        elif len(blk) and blk.count(blk[0:1]) == len(blk):
            hdr = last | (1 << 1) | (len(blk) << 3)
            out += hdr.to_bytes(3, "little") + blk[:1]
        else:
            hdr = last | (0 << 1) | (len(blk) << 3)
            out += hdr.to_bytes(3, "little") + blk
    out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)


def fse_write_distribution(norm: list[int], accuracy_log: int) -> bytes:
    """Mirror of :func:`fse_read_distribution` (the FSE_writeNCount
    flow): emits the accuracy nibble then each probability in the
    variable width the reader expects, with 2-bit repeat flags after
    zeros."""
    if not 5 <= accuracy_log <= 9:
        raise ValueError("zstd FSE accuracy must be in [5, 9]")
    fw = _FwdWriter()
    fw.write(accuracy_log - 5, 4)
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    i = 0
    while remaining > 1 and i < len(norm):
        count = norm[i]
        i += 1
        spare = (2 * threshold - 1) - remaining
        x = count + 1
        if x < spare:
            fw.write(x, nb_bits - 1)
        else:
            if x >= threshold:
                x += spare
            fw.write(x, nb_bits)
        remaining -= -count if count < 0 else count
        if count == 0:
            z = 0
            while i + z < len(norm) and norm[i + z] == 0:
                z += 1
            i += z
            while True:
                rep = min(z, 3)
                fw.write(rep, 2)
                z -= rep
                if rep != 3:
                    break
        while remaining < threshold and threshold > 1:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("normalized counts do not sum to the table size")
    return fw.bytes()


def huff_weights_fse_section(weights: list[int]) -> bytes:
    """Build an FSE-compressed Huffman tree description (header byte +
    table description + 2-state stream) for ``weights`` (the explicit
    list, excluding the implicit last weight). Used by tests and by
    callers wanting the compact tree form."""
    if len(weights) % 2:
        raise ValueError("pad the weight list to an even count")
    max_w = max(weights)
    hist = [0] * (max_w + 1)
    for w in weights:
        hist[w] += 1
    # normalize exactly: counts already small; use accuracy covering sum
    total = len(weights)
    alog = max(5, (total - 1).bit_length())
    size = 1 << alog
    norm = [c * size // total for c in hist]
    # fix rounding so the norm sums to size (bump largest entries)
    deficit = size - sum(norm)
    order = sorted(range(len(hist)), key=lambda s: -hist[s])
    j = 0
    while deficit > 0:
        s = order[j % len(order)]
        if hist[s]:
            norm[s] += 1
            deficit -= 1
        j += 1
    for s, c in enumerate(hist):
        if c and norm[s] == 0:
            # donate one slot from the largest symbol
            norm[s] = 1
            norm[order[0]] -= 1
    dist = fse_write_distribution(norm, alog)
    stream = _fse_compress_2state(weights, norm, alog)
    body = dist + stream
    if len(body) >= 128:
        raise ValueError("weight section too large for the 1-byte header")
    return bytes([len(body)]) + body
