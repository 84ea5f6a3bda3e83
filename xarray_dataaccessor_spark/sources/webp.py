"""Pure-Python WebP-lossless (VP8L) decoder + fixture-writer twin.

WebP is the most common scraped-image format after JPEG/PNG; its
lossless variant (VP8L, public bitstream spec at
developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
is a canonical-prefix-code + LZ77 + color-cache pixel codec with four
invertible pre-transforms. This module decodes the full VP8L surface:

- RIFF container (bare ``VP8L`` chunk or extended ``VP8X`` layout)
- LSB-first bit stream, 14-bit dimensions
- all four transforms, inverted in reverse order: predictor (14 modes,
  per-block sub-image), color (per-block ColorTransformElement deltas),
  subtract-green, color-indexing (palette, incl. sub-byte pixel
  bundling for <=16 colors)
- prefix-code groups (green+length+cache / red / blue / alpha /
  distance), both "simple" (1-2 symbol) and code-length-coded forms
  with 16/17/18 repeats and the optional max_symbol cap
- meta prefix codes (entropy image selecting per-block code groups)
- LZ77 backward references with the 120-entry 2D distance mapping
- color cache (hash-indexed ARGB cache, 1-11 bits)

The writer emits valid lossless streams (fixed 8-bit literal codes or
runs via LZ77 distance-1 references, optional color cache, optional
subtract-green / fixed-mode predictor / color / palette transforms) so
tests can round-trip every decoder path without external tooling.
The lossy VP8 codec lives in the sibling ``vp8`` module (bool coder,
intra prediction, DCT/WHT, loop filter); ``parse_webp`` dispatches
``VP8 `` chunks there and ``write_webp_lossy`` wraps its encoder twin
in the RIFF container.

Same discipline as the sibling ``jpeg``/``flac``/``zstd`` modules:
stdlib + numpy only, bounded loops, corrupt input raises ValueError /
NotImplementedError naming the construct.
"""

from __future__ import annotations

import struct

import numpy as np

# module-level import (not lazy): executors receive this module BY VALUE
# (multimodal._ship_by_value) and a function-body `import` would resolve
# by name at runtime on workers that don't have the package installed
from xarray_dataaccessor_spark.sources import vp8 as _vp8

# spec: order in which code-length code lengths are stored
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# spec: 2D neighborhood offsets for distance codes 1..120, as (dx, dy);
# distance = dy * xsize + dx (clamped to >= 1)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(_DIST_MAP) == 120


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def read(self, n: int) -> int:
        while self.n < n:
            if self.pos >= len(self.data):
                raise ValueError("VP8L: bit stream truncated")
            self.buf |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.n -= n
        return v


class _Huff:
    """Canonical prefix code: bit-by-bit walk over a (len, code) map.
    A single-symbol code (length 0) consumes no bits."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: increasing length, then symbol order
        kraft = sum(1 / (1 << ln) for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: prefix code not complete (Kraft != 1)")
        nz.sort()
        table = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        self.table = table
        self.max_len = nz[-1][0]

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code word")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huff:
    """Spec 'prefix code' reader: simple (1-2 symbols) or
    code-length-coded with 16/17/18 repeats."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        sym0 = br.read(8) if first_8 else br.read(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 1:
            lengths[sym0] = 1  # single-symbol code: 0 bits on the wire
            h = _Huff.__new__(_Huff)
            h.single, h.table, h.max_len = sym0, None, 0
            return h
        sym1 = br.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise ValueError("VP8L: simple-code symbol invalid")
        lengths[sym0] = lengths[sym1] = 1
        return _Huff(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev_len = 8
    while len(lengths) < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_huff.decode(br)
        if sym < 16:
            lengths.append(sym)
            if sym != 0:
                prev_len = sym
        elif sym == 16:
            lengths.extend([prev_len] * (3 + br.read(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:
            lengths.extend([0] * (11 + br.read(7)))
        if len(lengths) > alphabet_size:
            raise ValueError("VP8L: code length repeat overruns alphabet")
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _Huff(lengths)


def _prefix_value(sym: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding: symbol -> value."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _read_entropy_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """Decode one entropy-coded image of w*h ARGB pixels (list of ints).
    ``allow_meta`` is True only for the spatially-coded (main) image."""
    # Spec grammar (RFC 9649 §5): spatially-coded-image ::=
    #   color-cache-info meta-prefix data; entropy-coded-image ::=
    #   color-cache-info data.  Color-cache-info is always read FIRST,
    #   then (main image only) the meta-prefix bit.
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: color cache bits {cache_bits} out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_huff = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _read_entropy_image(br, mw, mh, False)[0]
        meta_huff = [((p >> 8) & 0xFFFF) for p in meta_px]  # (r<<8)|g
        n_groups = max(meta_huff) + 1

    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = w * h
    out = [0] * n
    pos = 0
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta_huff else 0
    while pos < n:
        if meta_huff:
            x, y = pos % w, pos // w
            g_idx = meta_huff[(y >> meta_bits) * mw + (x >> meta_bits)]
            if g_idx >= len(groups):
                raise ValueError("VP8L: meta prefix group out of range")
            green, red, blue, alpha, dist = groups[g_idx]
        else:
            green, red, blue, alpha, dist = groups[0]
        sym = green.decode(br)
        if sym < 256:
            r = red.decode(br)
            b = blue.decode(br)
            a = alpha.decode(br)
            px = (a << 24) | (r << 16) | (sym << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif sym < 280:
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(dist.decode(br), br)
            if dist_code > 120:
                distance = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                distance = max(dy * w + dx, 1)
            if distance > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of bounds")
            for _ in range(length):
                px = out[pos - distance]
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[sym - 280]
            pos += 1
    return out, cache_bits


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """One ARGB prediction (per-channel ops on packed pixels)."""

    def ch(p, s):
        return (p >> s) & 0xFF

    def pack(f):
        return (
            (f(24) << 24) | (f(16) << 16) | (f(8) << 8) | f(0)
        )

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return pack(lambda s: _avg2(_avg2(ch(L, s), ch(TR, s)), ch(T, s)))
    if mode == 6:
        return pack(lambda s: _avg2(ch(L, s), ch(TL, s)))
    if mode == 7:
        return pack(lambda s: _avg2(ch(L, s), ch(T, s)))
    if mode == 8:
        return pack(lambda s: _avg2(ch(TL, s), ch(T, s)))
    if mode == 9:
        return pack(lambda s: _avg2(ch(T, s), ch(TR, s)))
    if mode == 10:
        return pack(
            lambda s: _avg2(
                _avg2(ch(L, s), ch(TL, s)), _avg2(ch(T, s), ch(TR, s))
            )
        )
    if mode == 11:  # Select
        p_l = sum(abs(ch(T, s) - ch(TL, s)) for s in (24, 16, 8, 0))
        p_t = sum(abs(ch(L, s) - ch(TL, s)) for s in (24, 16, 8, 0))
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return pack(lambda s: _clamp(ch(L, s) + ch(T, s) - ch(TL, s)))
    if mode == 13:  # ClampAddSubtractHalf
        def f(s):
            ave = _avg2(ch(L, s), ch(T, s))
            return _clamp(ave + (ave - ch(TL, s)) // 2)

        return pack(f)
    raise ValueError(f"VP8L: predictor mode {mode} invalid")


def _add_px(a: int, b: int) -> int:
    """Per-channel modulo-256 addition of packed ARGB pixels."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 product >> 5."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def parse_webp(data: bytes, max_pixels: int | None = 1 << 27) -> np.ndarray:
    """WebP bytes -> ndarray (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when
    any alpha < 255. Both flavors decode: lossless VP8L here, lossy VP8
    key frames via ``sources.vp8`` (an ALPH chunk alongside a lossy
    frame is ignored — the color planes decode, alpha-compressed data
    is its own sub-format). ``max_pixels`` (same 2^27 cap as the JPEG
    parser) bounds the decode allocation against crafted headers — the
    14-bit dimension fields allow 16384^2 = 268M pixels."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    pos = 12
    payload = None
    lossy = None
    alpha_chunk = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            payload = body
            break
        if cid == b"VP8 ":
            lossy = body
            break
        if cid == b"ALPH":
            alpha_chunk = body  # precedes the VP8 chunk in VP8X layouts
        pos += 8 + size + (size & 1)
    if lossy is not None:
        if max_pixels is not None and len(lossy) >= 10:
            w14 = struct.unpack_from("<H", lossy, 6)[0] & 0x3FFF
            h14 = struct.unpack_from("<H", lossy, 8)[0] & 0x3FFF
            if w14 * h14 > max_pixels:
                raise ValueError(
                    f"VP8 dimensions {w14}x{h14} exceed max_pixels={max_pixels}"
                )
        f = _vp8.decode_vp8_frame(lossy)
        rgb = _vp8.yuv420_to_rgb(f["y"], f["u"], f["v"])
        if alpha_chunk is not None:
            a = _decode_alpha(alpha_chunk, f["width"], f["height"])
            if not (a == 255).all():
                return np.dstack([rgb, a])
        return rgb
    if payload is None:
        raise ValueError("WebP container has no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version}")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(
            f"VP8L dimensions {w}x{h} exceed max_pixels={max_pixels}"
        )
    px = _decode_image_stream(br, w, h)
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype("u1")
    r = ((arr >> 16) & 0xFF).astype("u1")
    g = ((arr >> 8) & 0xFF).astype("u1")
    b = (arr & 0xFF).astype("u1")
    if (a == 255).all():
        return np.dstack([r, g, b])
    return np.dstack([r, g, b, a])


def _decode_image_stream(br: _BitReader, w: int, h: int) -> list[int]:
    """VP8L image-stream (transforms + entropy-coded ARGB) of known
    dimensions — the headerless grammar shared by the main VP8L payload
    and compressed ALPH alpha planes (which carry the alpha values in
    the green channel)."""
    # transforms, recorded in read order then inverted in reverse
    transforms = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            bw = (xsize + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(br, bw, bh, False)[0]
            transforms.append(("predictor", bits, bw, sub))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            bw = (xsize + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(br, bw, bh, False)[0]
            transforms.append(("color", bits, bw, sub))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # color indexing
            pal_size = br.read(8) + 1
            pal_px = _read_entropy_image(br, pal_size, 1, False)[0]
            # palette entries are delta-coded per channel
            pal = []
            prev = 0
            for p in pal_px:
                cur = _add_px(prev, p)
                pal.append(cur)
                prev = cur
            if pal_size <= 2:
                wbits = 3
            elif pal_size <= 4:
                wbits = 2
            elif pal_size <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", pal, wbits, xsize))
            xsize = (xsize + (1 << wbits) - 1) >> wbits
    px, _ = _read_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, wbits, full_w = t
            if wbits:
                unpacked = [0] * (full_w * h)
                per = 1 << wbits
                ibits = 8 >> wbits
                mask = (1 << ibits) - 1
                for y in range(h):
                    for bx in range(xsize):
                        g = (px[y * xsize + bx] >> 8) & 0xFF
                        for k in range(per):
                            x = bx * per + k
                            if x >= full_w:
                                break
                            unpacked[y * full_w + x] = (g >> (k * ibits)) & mask
                idxs = unpacked
            else:
                idxs = [(p >> 8) & 0xFF for p in px]
            out = []
            for i in idxs:
                if i >= len(pal):
                    raise ValueError("VP8L: palette index out of range")
                out.append(pal[i])
            px = out
            xsize = full_w
        elif t[0] == "subtract_green":
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                r = ((p >> 16) + g) & 0xFF
                b = (p + g) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif t[0] == "color":
            _, bits, bw, sub = t
            for i, p in enumerate(px):
                x, y = i % xsize, i // xsize
                cte = sub[(y >> bits) * bw + (x >> bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                g = (p >> 8) & 0xFF
                r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g) & 0xFF
                b = ((p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | b
        else:  # predictor
            _, bits, bw, sub = t
            for i in range(len(px)):
                x, y = i % xsize, i // xsize
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]  # mode 1 (L) forced on first row
                elif x == 0:
                    pred = px[i - xsize]  # mode 2 (T) forced on first col
                else:
                    mode = (sub[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                    if mode > 13:
                        raise ValueError(f"VP8L: predictor mode {mode} invalid")
                    L = px[i - 1]
                    T = px[i - xsize]
                    TL = px[i - xsize - 1]
                    TR = px[i - xsize + 1]  # last column wraps to row start
                    pred = _predict(mode, L, T, TL, TR)
                px[i] = _add_px(px[i], pred)
    return px


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane. Header byte: 2 reserved
    bits, 2 preprocessing bits (level reduction is not inverted — by
    spec it is lossy and the stored values ARE the output), 2 filtering
    bits (none/horizontal/vertical/gradient, inverted here), 2
    compression bits (0 = raw bytes, 1 = headerless VP8L image-stream
    with alpha in the green channel)."""
    if not body:
        raise ValueError("ALPH chunk empty")
    hdr = body[0]
    filt = (hdr >> 2) & 0x3
    comp = hdr & 0x3
    if comp == 0:
        raw = body[1 : 1 + w * h]
        if len(raw) < w * h:
            raise ValueError("ALPH raw data truncated")
        plane = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.int32)
    elif comp == 1:
        px = _decode_image_stream(_BitReader(body[1:]), w, h)
        plane = (
            (np.array(px, dtype=np.uint32).reshape(h, w) >> 8) & 0xFF
        ).astype(np.int32)
    else:
        raise NotImplementedError(f"ALPH compression method {comp}")
    if filt:
        # per-pixel predictor over the FILTERED residuals: invert in
        # raster order (first pixel predicts 0; first row predicts left,
        # first column predicts above — same borders for all methods)
        out = np.zeros((h, w), dtype=np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    if filt == 1:
                        pred = out[y, x - 1]
                    elif filt == 2:
                        pred = out[y - 1, x]
                    else:
                        g = (
                            int(out[y, x - 1])
                            + int(out[y - 1, x])
                            - int(out[y - 1, x - 1])
                        )
                        pred = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (plane[y, x] + pred) & 0xFF
        plane = out
    return plane.astype(np.uint8)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        """n bits of v, LSB-first into the stream."""
        self.cur |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.cur & 0xFF)
            self.cur >>= 8
            self.n -= 8

    def write_code(self, code: int, ln: int) -> None:
        """A canonical prefix code word: its bits MSB-first (the order
        the decoder's bit-by-bit walk consumes)."""
        for i in range(ln - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.cur & 0xFF)
        return bytes(out)


def _canonical_codes(lengths):
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev = nz[0][0]
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _huff_lengths(freqs: dict, max_len: int = 15) -> dict:
    """Huffman code lengths with a depth cap. When the unconstrained
    tree exceeds ``max_len`` (skewed frequencies on large images), the
    lengths are clamped and then repaired to an EXACTLY complete code
    (Kraft sum == 1): over-full codes lengthen their deepest
    still-shortenable symbol; under-full codes shorten a deepest
    symbol whose mass fits the deficit. The decoder rejects incomplete
    codes, so completeness is a hard requirement, optimality is not."""
    import heapq
    from fractions import Fraction

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, s1 + s2))
        i += 1
    if max(depth.values()) <= max_len:
        return depth
    lens = {s: min(d, max_len) for s, d in depth.items()}

    def kraft():
        return sum(Fraction(1, 1 << l) for l in lens.values())

    k = kraft()
    while k > 1:  # over-full after clamping: push a shallow symbol down
        s = max((s for s, l in lens.items() if l < max_len),
                key=lambda s: lens[s])
        k -= Fraction(1, 1 << (lens[s] + 1))
        lens[s] += 1
    while k < 1:  # under-full: pull up the deepest symbol that fits
        deficit = 1 - k
        s = max((s for s, l in lens.items()
                 if l > 1 and Fraction(1, 1 << l) <= deficit),
                key=lambda s: lens[s])
        k += Fraction(1, 1 << lens[s])
        lens[s] -= 1
    return lens


def _emit_prefix_code(bw: _BitWriter, lengths, alphabet_size: int) -> None:
    """Emit a prefix code: simple form when <=2 symbols (and all fit in
    8 bits), else the code-length-coded form with 16/18 runs."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s, _ in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0][0]
        if s0 < 2 and len(used) == 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1][0], 8)
        return
    # build the CL symbol sequence: literals with 16-runs for repeats of
    # the previous nonzero length and 18-runs for zeros
    seq = []  # (cl_symbol, extra_value, extra_bits)
    i = 0
    prev_nz = 8
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                seq.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                seq.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                seq.append((0, 0, 0))
        else:
            seq.append((ln, 0, 0))
            if ln != 0:
                prev_nz = ln
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                seq.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                seq.append((ln, 0, 0))
        i += run
    cl_freq: dict = {}
    for s, _, _ in seq:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths_map = _huff_lengths(cl_freq, max_len=7)
    if len(cl_lengths_map) == 1:
        # a 1-symbol CL code is incomplete; pad with a harmless partner
        only = next(iter(cl_lengths_map))
        partner = 0 if only != 0 else 1
        cl_lengths_map = {only: 1, partner: 1}
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    num_cl = max(
        i + 1 for i in range(19) if cl_lengths[_CL_ORDER[i]] > 0
    )
    num_cl = max(num_cl, 4)
    bw.write(0, 1)  # not simple
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra, ebits in seq:
        c, ln = cl_codes[s]
        bw.write_code(c, ln)
        if ebits:
            bw.write(extra, ebits)


def _prefix_encode(value: int):
    """LZ77 value -> (prefix_symbol, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    vm1 = value - 1
    hi = vm1.bit_length() - 1
    extra = hi - 1
    second = (vm1 >> extra) & 1
    sym = 2 * hi + second
    offset = (2 + second) << extra
    return sym, value - offset - 1, extra


def write_webp(
    img: np.ndarray,
    transforms: tuple = (),
    use_lz77: bool = False,
    cache_bits: int = 0,
) -> bytes:
    """(h, w, 3|4) uint8 (or (h, w) gray) -> lossless WebP bytes.

    ``transforms`` may contain 'subtract_green', 'predictor' (fixed
    mode-2/T blocks), 'color' (fixed ColorTransformElement), 'palette'
    (requires <=256 distinct colors; bundles sub-byte indices for
    <=16). ``use_lz77`` emits distance-1 backward references for
    horizontal runs; ``cache_bits`` enables the color cache. All
    combinations decode back bit-exactly (lossless)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.dstack([img, img, img])
    h, w = img.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions out of range")
    has_alpha = img.shape[2] == 4
    a = img[:, :, 3].astype(np.uint32) if has_alpha else np.full((h, w), 255, np.uint32)
    px = (
        (a << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1).tolist()

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    CT = (16, 8, 4)  # fixed g2r, g2b, r2b for the 'color' transform
    for t in transforms:
        if t == "palette":
            colors = sorted(set(px))
            if len(colors) > 256:
                raise ValueError("palette transform needs <=256 colors")
            bw.write(1, 1)
            bw.write(3, 2)
            pal = colors
            bw.write(len(pal) - 1, 8)
            deltas = []
            prev = 0
            for c in pal:
                deltas.append(
                    ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                    | (((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
                )
                prev = c
            _write_entropy_image(bw, deltas)
            lut = {c: i for i, c in enumerate(pal)}
            idxs = [lut[p] for p in px]
            if len(pal) <= 2:
                wbits = 3
            elif len(pal) <= 4:
                wbits = 2
            elif len(pal) <= 16:
                wbits = 1
            else:
                wbits = 0
            if wbits:
                per = 1 << wbits
                ibits = 8 >> wbits
                packed_w = (xsize + per - 1) >> wbits
                packed = []
                for y in range(h):
                    for bx in range(packed_w):
                        g = 0
                        for k in range(per):
                            x = bx * per + k
                            if x < xsize:
                                g |= idxs[y * xsize + x] << (k * ibits)
                        packed.append(0xFF000000 | (g << 8))
                px = packed
                xsize = packed_w
            else:
                px = [0xFF000000 | (i << 8) for i in idxs]
        elif t == "subtract_green":
            bw.write(1, 1)
            bw.write(2, 2)
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                r = ((p >> 16) - g) & 0xFF
                b = (p - g) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif t == "color":
            bw.write(1, 1)
            bw.write(1, 2)
            bits = 4
            bw.write(bits - 2, 3)
            bwid = (xsize + (1 << bits) - 1) >> bits
            bhei = (h + (1 << bits) - 1) >> bits
            cte = 0xFF000000 | (CT[2] << 16) | (CT[1] << 8) | CT[0]
            _write_entropy_image(bw, [cte] * (bwid * bhei))
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                r0 = (p >> 16) & 0xFF
                b0 = p & 0xFF
                r = (r0 - _ct_delta(CT[0], g)) & 0xFF
                b = (b0 - _ct_delta(CT[1], g) - _ct_delta(CT[2], r0)) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif t == "predictor":
            bw.write(1, 1)
            bw.write(0, 2)
            bits = 4
            bw.write(bits - 2, 3)
            bwid = (xsize + (1 << bits) - 1) >> bits
            bhei = (h + (1 << bits) - 1) >> bits
            _write_entropy_image(bw, [0xFF000000 | (2 << 8)] * (bwid * bhei))
            res = list(px)
            for i in range(len(px) - 1, -1, -1):
                x, y = i % xsize, i // xsize
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - xsize]
                else:
                    pred = px[i - xsize]  # fixed mode 2: T
                p = px[i]
                res[i] = (
                    ((((p >> 24) - (pred >> 24)) & 0xFF) << 24)
                    | (((((p >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((p >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((p & 0xFF) - (pred & 0xFF)) & 0xFF)
                )
            px = res
        else:
            raise ValueError(f"unknown transform {t!r}")
    bw.write(0, 1)  # end of transforms

    _write_entropy_image(
        bw, px, allow_meta=True, use_lz77=use_lz77, cache_bits=cache_bits
    )

    payload = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _write_entropy_image(
    bw: _BitWriter,
    px: list,
    allow_meta: bool = False,
    use_lz77: bool = False,
    cache_bits: int = 0,
) -> None:
    """Emit one entropy-coded image: literal/backref/cache symbol stream
    under per-channel Huffman codes built from actual frequencies."""
    # Emission order mirrors the spec: color-cache-info first, then the
    # meta-prefix bit (main image only).
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = [None] * (1 << cache_bits)
    else:
        bw.write(0, 1)
        cache = None
    if allow_meta:
        bw.write(0, 1)  # no meta prefix codes

    # tokenize: (kind, payload) with kind 'lit' (pixel), 'ref' (length),
    # 'cache' (index) — distance is always 1 (horizontal runs)
    tokens = []
    n = len(px)
    i = 0
    while i < n:
        p = px[i]
        if use_lz77 and i > 0 and p == px[i - 1]:
            run = 1
            while i + run < n and px[i + run] == p and run < 4095:
                run += 1
            tokens.append(("ref", run))
            if cache is not None:
                key = _cache_key(p, cache_bits)
                cache[key] = p
            i += run
            continue
        if cache is not None:
            key = _cache_key(p, cache_bits)
            if cache[key] == p:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = p
        tokens.append(("lit", p))
        i += 1

    gfreq: dict = {}
    rfreq: dict = {}
    bfreq: dict = {}
    afreq: dict = {}
    dfreq: dict = {}
    for kind, v in tokens:
        if kind == "lit":
            gfreq[(v >> 8) & 0xFF] = gfreq.get((v >> 8) & 0xFF, 0) + 1
            rfreq[(v >> 16) & 0xFF] = rfreq.get((v >> 16) & 0xFF, 0) + 1
            bfreq[v & 0xFF] = bfreq.get(v & 0xFF, 0) + 1
            afreq[(v >> 24) & 0xFF] = afreq.get((v >> 24) & 0xFF, 0) + 1
        elif kind == "ref":
            sym, _, _ = _prefix_encode(v)
            gfreq[256 + sym] = gfreq.get(256 + sym, 0) + 1
            dsym, _, _ = _prefix_encode(121)  # dist_code 121 = distance 1
            dfreq[dsym] = dfreq.get(dsym, 0) + 1
        else:
            gfreq[280 + v] = gfreq.get(280 + v, 0) + 1
    for fr in (rfreq, bfreq, afreq):
        if not fr:
            fr[0] = 1
    if not dfreq:
        dfreq[0] = 1

    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    codes = []
    for freq, alpha in (
        (gfreq, galpha),
        (rfreq, 256),
        (bfreq, 256),
        (afreq, 256),
        (dfreq, 40),
    ):
        lm = _huff_lengths(freq)
        lengths = [0] * alpha
        for s, ln in lm.items():
            lengths[s] = ln
        _emit_prefix_code(bw, lengths, alpha)
        codes.append((_canonical_codes(lengths), {s: 0 for s in lm} if len(lm) == 1 else None))

    (gc, gsingle), (rc, rsingle), (bc, bsingle), (ac, asingle), (dc, dsingle) = codes

    def emit(codemap, single, sym):
        if single is not None:
            return  # single-symbol code: zero bits
        c, ln = codemap[sym]
        bw.write_code(c, ln)

    for kind, v in tokens:
        if kind == "lit":
            emit(gc, gsingle, (v >> 8) & 0xFF)
            emit(rc, rsingle, (v >> 16) & 0xFF)
            emit(bc, bsingle, v & 0xFF)
            emit(ac, asingle, (v >> 24) & 0xFF)
        elif kind == "ref":
            sym, extra, ebits = _prefix_encode(v)
            emit(gc, gsingle, 256 + sym)
            if ebits:
                bw.write(extra, ebits)
            dsym, dextra, debits = _prefix_encode(121)
            emit(dc, dsingle, dsym)
            if debits:
                bw.write(dextra, debits)
        else:
            emit(gc, gsingle, 280 + v)


def write_webp_lossy(
    rgb: np.ndarray, q_index: int = 8, alpha_filter: int = 0
) -> bytes:
    """RGB or RGBA ndarray -> lossy WebP bytes (RIFF container around a
    VP8 key frame from ``sources.vp8``'s encoder twin). ``q_index`` is
    the VP8 quantizer index 0-127 (lower = higher fidelity; 0 quantizes
    at step 4). A 4th channel becomes an extended (VP8X) layout with an
    uncompressed ALPH chunk — the alpha plane is stored LOSSLESSLY,
    optionally under ``alpha_filter`` 0-3 (none/horizontal/vertical/
    gradient, the spec's per-pixel predictors)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    alpha = None
    if arr.ndim == 3 and arr.shape[2] == 4:
        alpha = arr[:, :, 3]
        arr = arr[:, :, :3]
    y, u, v = _vp8.rgb_to_yuv420(arr)
    payload = _vp8.encode_vp8_frame(y, u, v, q_index=q_index)

    def chunk(cid: bytes, body: bytes) -> bytes:
        c = cid + struct.pack("<I", len(body)) + body
        return c + (b"\x00" if len(body) & 1 else b"")

    chunks = b""
    if alpha is not None:
        if alpha_filter not in (0, 1, 2, 3):
            raise ValueError("alpha_filter must be 0..3")
        h, w = alpha.shape
        plane = alpha.astype(np.int32)
        if alpha_filter:
            res = np.zeros_like(plane)
            for yy in range(h):
                for xx in range(w):
                    if xx == 0 and yy == 0:
                        pred = 0
                    elif yy == 0:
                        pred = plane[0, xx - 1]
                    elif xx == 0:
                        pred = plane[yy - 1, 0]
                    elif alpha_filter == 1:
                        pred = plane[yy, xx - 1]
                    elif alpha_filter == 2:
                        pred = plane[yy - 1, xx]
                    else:
                        g = (
                            int(plane[yy, xx - 1])
                            + int(plane[yy - 1, xx])
                            - int(plane[yy - 1, xx - 1])
                        )
                        pred = 0 if g < 0 else (255 if g > 255 else g)
                    res[yy, xx] = (plane[yy, xx] - pred) & 0xFF
            body = res.astype(np.uint8).tobytes()
        else:
            body = plane.astype(np.uint8).tobytes()
        vp8x = bytes([0x10]) + bytes(3) + struct.pack(
            "<I", w - 1
        )[:3] + struct.pack("<I", h - 1)[:3]
        chunks += chunk(b"VP8X", vp8x)
        chunks += chunk(b"ALPH", bytes([alpha_filter << 2]) + body)
    chunks += chunk(b"VP8 ", payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
