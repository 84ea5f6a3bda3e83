"""Pure-Python VP8 key-frame (intra) codec — the WebP-lossy payload.

Decoder for RFC 6386 key frames: bool (range) coder, frame/segment/
filter/quantizer headers, probability updates, key-frame intra modes
(16x16 DC/V/H/TM, full 4x4 B_PRED with all ten sub-modes, chroma
modes), token-tree DCT coefficient decode with per-plane contexts,
dequantization, 4x4 inverse DCT and Walsh-Hadamard (Y2), intra
reconstruction, and the in-loop deblocking filter (both the normal
6/4-tap and the simple flavor). Multiple token partitions supported.

The fixture-writer twin (:func:`encode_vp8_frame`) emits spec-compliant
key frames (all-B_PRED luma with B_DC sub-modes, chroma DC, default
probabilities, one partition, per-MB skip flags, loop filter level 0)
that real decoders accept — the test suite cross-checks both directions
bit-exactly against the system libwebp when present (tests skip the
cross-checks otherwise; the codec itself is dependency-free).

Reference parity: the reference repo has no media path at all
(SURVEY §2 extension surface); the WebP container/VP8L half lives in
``sources/webp.py``, which dispatches lossy payloads here.

Scale note: this is the Arrow-batched ``mapInPandas`` decode path of
``operators/multimodal.py`` — pure-Python per-pixel work is the honest
CPU cost, the Spark-side plumbing (schema, batching, closure shipping)
is identical to the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from xarray_dataaccessor_spark.sources.vp8_tables import (
    AC_QLOOKUP,
    BMODE_TREE,
    CAT_BASE,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    TOKEN_TREE,
    UV_MODE_TREE,
    ZIGZAG,
)

# 16x16 / chroma mode ids
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 sub-mode ids
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)
#: implied sub-mode of a 16x16-coded neighbor, for B_PRED contexts
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


class BoolDecoder:
    """RFC 6386 §7 bool (range) decoder."""

    __slots__ = ("buf", "pos", "value", "range", "bit_count")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 2
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.get(128) else v

    def tree(self, tree: list[int], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Exact twin of :class:`BoolDecoder` (arbitrary-precision interval
    start — carries propagate through the big int, no byte juggling).
    Fuzz-validated against the decoder over random (bit, prob) streams.
    """

    __slots__ = ("low", "range", "nbits")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def put_literal(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def put_signed(self, v: int, nbits: int) -> None:
        self.put_literal(abs(v), nbits)
        self.put(1 if v < 0 else 0, 128)

    def put_tree(self, tree: list[int], probs, leaf: int) -> None:
        # walk the tree to find the bit path for `leaf`
        path = self._path(tree, leaf)
        for node, bit in path:
            self.put(bit, probs[node >> 1])

    @staticmethod
    def _path(tree: list[int], leaf: int, i: int = 0, acc=()):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -leaf:
                return list(acc) + [(i, bit)]
            if nxt > 0:
                r = BoolEncoder._path(tree, leaf, nxt, tuple(acc) + ((i, bit),))
                if r is not None:
                    return r
        return None

    def bytes(self) -> bytes:
        # the initial window byte sits above the shifted bits; pad the
        # interval start out to whole bytes (any value in
        # [low, low + range) decodes identically)
        total = self.nbits + 8
        pad = (-total) % 8
        total += pad
        return (self.low << pad).to_bytes(total // 8, "big")


def _clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_s(v):
    return -128 if v < -128 else (127 if v > 127 else v)


# ---------------------------------------------------------------------------
# transforms (RFC 6386 §14.3-§14.4)
# ---------------------------------------------------------------------------
def idct4x4(block) -> np.ndarray:
    """VP8 inverse DCT, integer-exact (constants 20091/35468)."""
    tmp = [0] * 16
    for i in range(4):
        x0, x4, x8, x12 = block[i], block[i + 4], block[i + 8], block[i + 12]
        a1 = x0 + x8
        b1 = x0 - x8
        t1 = (x4 * 35468) >> 16
        t2 = x12 + ((x12 * 20091) >> 16)
        c1 = t1 - t2
        t1 = x4 + ((x4 * 20091) >> 16)
        t2 = (x12 * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        x0, x1, x2, x3 = tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        a1 = x0 + x2
        b1 = x0 - x2
        t1 = (x1 * 35468) >> 16
        t2 = x3 + ((x3 * 20091) >> 16)
        c1 = t1 - t2
        t1 = x1 + ((x1 * 20091) >> 16)
        t2 = (x3 * 35468) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block) -> list[int]:
    """VP8 inverse Walsh-Hadamard (Y2 DC distribution)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[i + 12]
        b1 = block[i + 4] + block[i + 8]
        c1 = block[i + 4] - block[i + 8]
        d1 = block[i] - block[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


# float forward transforms derived as the numerical inverses of the
# integer inverse transforms above — the encoder only needs a forward
# map whose quantized output the FIXED decoder-side inverse reproduces,
# so deriving it from idct4x4/iwht4x4 guarantees the pair is consistent
def _float_inv_matrix(int_inverse) -> np.ndarray:
    m = np.empty((16, 16))
    for k in range(16):
        e = [0] * 16
        e[k] = 4096  # large basis amplitude swamps the integer rounding
        col = np.asarray(int_inverse(e), dtype=np.float64).reshape(-1)
        m[:, k] = col / 4096.0
    return np.linalg.inv(m)


_FDCT_M = _float_inv_matrix(idct4x4)
_FWHT_M = _float_inv_matrix(iwht4x4)


def fdct4x4(res: np.ndarray) -> np.ndarray:
    return np.rint(_FDCT_M @ res.reshape(16).astype(np.float64)).astype(np.int64)


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    return np.rint(_FWHT_M @ np.asarray(dcs, dtype=np.float64)).astype(np.int64)


# ---------------------------------------------------------------------------
# quantizer (RFC 6386 §9.6 / §14.1)
# ---------------------------------------------------------------------------
def _clip_q(v: int, hi: int = 127) -> int:
    return 0 if v < 0 else (hi if v > hi else v)


def dequant_factors(q: int, dq: dict) -> dict:
    """Per-plane (dc, ac) dequantization factors for base index ``q``
    and the header's delta dict."""
    y1 = (DC_QLOOKUP[_clip_q(q + dq.get("y1_dc", 0))], AC_QLOOKUP[_clip_q(q)])
    y2_dc = DC_QLOOKUP[_clip_q(q + dq.get("y2_dc", 0))] * 2
    y2_ac = (AC_QLOOKUP[_clip_q(q + dq.get("y2_ac", 0))] * 155) // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clip_q(q + dq.get("uv_dc", 0))]
    if uv_dc > 132:
        uv_dc = 132
    uv_ac = AC_QLOOKUP[_clip_q(q + dq.get("uv_ac", 0))]
    return {"y1": y1, "y2": (y2_dc, y2_ac), "uv": (uv_dc, uv_ac)}


# ---------------------------------------------------------------------------
# coefficient tokens (RFC 6386 §13)
# ---------------------------------------------------------------------------
def decode_coeffs(
    bd: BoolDecoder, probs, plane_type: int, first_coeff: int, ctx: int,
    dc_q: int, ac_q: int,
):
    """Decode one 4x4 block's tokens; returns (coeffs float32[16] in
    raster order already dequantized, has_nonzero)."""
    coeffs = np.zeros(16, dtype=np.int32)
    c = first_coeff
    tp = probs[plane_type]
    skip_eob = False
    nonzero = False
    while c < 16:
        p = tp[COEFF_BANDS[c]][ctx]
        if not skip_eob:
            if not bd.get(p[0]):
                break  # EOB
        if not bd.get(p[1]):
            # zero token: EOB is not allowed immediately after
            skip_eob = True
            ctx = 0
            c += 1
            continue
        skip_eob = False
        if not bd.get(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.get(p[3]):
                # tokens 2/3/4
                if not bd.get(p[4]):
                    val = 2
                else:
                    val = 3 if not bd.get(p[5]) else 4
            else:
                if not bd.get(p[6]):
                    # cat1 / cat2
                    cat = 0 if not bd.get(p[7]) else 1
                else:
                    if not bd.get(p[8]):
                        cat = 2 if not bd.get(p[9]) else 3
                    else:
                        cat = 4 if not bd.get(p[10]) else 5
                extra = 0
                for cp in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.get(cp)
                val = CAT_BASE[cat] + extra
        if bd.get(128):
            val = -val
        q = dc_q if c == 0 else ac_q
        coeffs[ZIGZAG[c]] = val * q
        nonzero = True
        c += 1
    return coeffs, nonzero


def encode_coeffs(
    be: BoolEncoder, probs, plane_type: int, first_coeff: int, ctx: int,
    levels,
) -> bool:
    """Token-encode quantized levels (zigzag-position indexed from 0,
    i.e. ``levels[i]`` is the level at scan position ``i``)."""
    last = -1
    for i in range(first_coeff, 16):
        if levels[i]:
            last = i
    c = first_coeff
    tp = probs[plane_type]
    skip_eob = False
    while c < 16:
        p = tp[COEFF_BANDS[c]][ctx]
        if not skip_eob:
            if c > last:
                be.put(0, p[0])  # EOB
                return last >= first_coeff
            be.put(1, p[0])
        v = int(levels[c])
        if v == 0:
            be.put(0, p[1])
            skip_eob = True
            ctx = 0
            c += 1
            continue
        skip_eob = False
        be.put(1, p[1])
        a = abs(v)
        if a == 1:
            be.put(0, p[2])
            ctx = 1
        else:
            be.put(1, p[2])
            ctx = 2
            if a <= 4:
                be.put(0, p[3])
                if a == 2:
                    be.put(0, p[4])
                else:
                    be.put(1, p[4])
                    be.put(0 if a == 3 else 1, p[5])
            else:
                be.put(1, p[3])
                cat = next(
                    k for k in range(5, -1, -1)
                    if a >= CAT_BASE[k]
                )
                extra = a - CAT_BASE[cat]
                if cat <= 1:
                    be.put(0, p[6])
                    be.put(cat, p[7])
                else:
                    be.put(1, p[6])
                    if cat <= 3:
                        be.put(0, p[8])
                        be.put(cat - 2, p[9])
                    else:
                        be.put(1, p[8])
                        be.put(cat - 4, p[10])
                nb = len(CAT_PROBS[cat])
                for j, cp in enumerate(CAT_PROBS[cat]):
                    be.put((extra >> (nb - 1 - j)) & 1, cp)
        be.put(1 if v < 0 else 0, 128)
        c += 1
        if c > last and c < 16 and not skip_eob:
            p2 = tp[COEFF_BANDS[c]][ctx]
            be.put(0, p2[0])
            return True
    return last >= first_coeff


# ---------------------------------------------------------------------------
# intra predictors (RFC 6386 §12)
# ---------------------------------------------------------------------------
def _pred_block(mode, above, left, aboveleft, size, has_above, has_left):
    """16x16 / 8x8 whole-block predictor. ``above``/``left`` are the
    `size` reconstructed neighbor pixels (int arrays)."""
    out = np.empty((size, size), dtype=np.int32)
    if mode == DC_PRED:
        if has_above and has_left:
            shift = 5 if size == 16 else 4
            dc = (int(above.sum()) + int(left.sum()) + (1 << (shift - 1))) >> shift
        elif has_above:
            shift = 4 if size == 16 else 3
            dc = (int(above.sum()) + (1 << (shift - 1))) >> shift
        elif has_left:
            shift = 4 if size == 16 else 3
            dc = (int(left.sum()) + (1 << (shift - 1))) >> shift
        else:
            dc = 128
        out[:, :] = dc
    elif mode == V_PRED:
        out[:, :] = above[None, :]
    elif mode == H_PRED:
        out[:, :] = left[:, None]
    elif mode == TM_PRED:
        t = left[:, None].astype(np.int32) + above[None, :].astype(np.int32) - int(aboveleft)
        out[:, :] = np.clip(t, 0, 255)
    else:  # pragma: no cover - mode range enforced by trees
        raise ValueError(f"bad whole-block mode {mode}")
    return out


def _pred4(mode, a, l, al, ar):
    """4x4 sub-block predictor. ``a``: above[4], ``l``: left[4],
    ``al``: above-left, ``ar``: above-right[4] (ints)."""
    o = np.empty((4, 4), dtype=np.int32)
    A0, A1, A2, A3 = int(a[0]), int(a[1]), int(a[2]), int(a[3])
    R0, R1, R2, R3 = int(ar[0]), int(ar[1]), int(ar[2]), int(ar[3])
    L0, L1, L2, L3 = int(l[0]), int(l[1]), int(l[2]), int(l[3])
    AL = int(al)

    def avg3(x, y, z):
        return (x + 2 * y + z + 2) >> 2

    def avg2(x, y):
        return (x + y + 1) >> 1

    if mode == B_DC:
        o[:, :] = (A0 + A1 + A2 + A3 + L0 + L1 + L2 + L3 + 4) >> 3
    elif mode == B_TM:
        t = (np.array([L0, L1, L2, L3])[:, None]
             + np.array([A0, A1, A2, A3])[None, :] - AL)
        o[:, :] = np.clip(t, 0, 255)
    elif mode == B_VE:
        row = [avg3(AL, A0, A1), avg3(A0, A1, A2), avg3(A1, A2, A3),
               avg3(A2, A3, R0)]
        o[:, :] = np.array(row)[None, :]
    elif mode == B_HE:
        col = [avg3(AL, L0, L1), avg3(L0, L1, L2), avg3(L1, L2, L3),
               avg3(L2, L3, L3)]
        o[:, :] = np.array(col)[:, None]
    elif mode == B_LD:
        p = [avg3(A0, A1, A2), avg3(A1, A2, A3), avg3(A2, A3, R0),
             avg3(A3, R0, R1), avg3(R0, R1, R2), avg3(R1, R2, R3),
             avg3(R2, R3, R3)]
        for r in range(4):
            for c in range(4):
                o[r, c] = p[r + c]
    elif mode == B_RD:
        p = [avg3(L3, L2, L1), avg3(L2, L1, L0), avg3(L1, L0, AL),
             avg3(L0, AL, A0), avg3(AL, A0, A1), avg3(A0, A1, A2),
             avg3(A1, A2, A3)]
        for r in range(4):
            for c in range(4):
                o[r, c] = p[3 - r + c]
    elif mode == B_VR:
        o[0, 0] = o[2, 1] = avg2(AL, A0)
        o[0, 1] = o[2, 2] = avg2(A0, A1)
        o[0, 2] = o[2, 3] = avg2(A1, A2)
        o[0, 3] = avg2(A2, A3)
        o[1, 0] = o[3, 1] = avg3(L0, AL, A0)
        o[1, 1] = o[3, 2] = avg3(AL, A0, A1)
        o[1, 2] = o[3, 3] = avg3(A0, A1, A2)
        o[1, 3] = avg3(A1, A2, A3)
        o[2, 0] = avg3(AL, L0, L1)
        o[3, 0] = avg3(L0, L1, L2)
    elif mode == B_VL:
        o[0, 0] = avg2(A0, A1)
        o[0, 1] = o[2, 0] = avg2(A1, A2)
        o[0, 2] = o[2, 1] = avg2(A2, A3)
        o[0, 3] = o[2, 2] = avg2(A3, R0)
        o[1, 0] = avg3(A0, A1, A2)
        o[1, 1] = o[3, 0] = avg3(A1, A2, A3)
        o[1, 2] = o[3, 1] = avg3(A2, A3, R0)
        o[1, 3] = o[3, 2] = avg3(A3, R0, R1)
        o[2, 3] = avg3(R0, R1, R2)
        o[3, 3] = avg3(R1, R2, R3)
    elif mode == B_HD:
        o[0, 0] = o[1, 2] = avg2(AL, L0)
        o[0, 1] = o[1, 3] = avg3(A0, AL, L0)
        o[0, 2] = avg3(A1, A0, AL)
        o[0, 3] = avg3(A2, A1, A0)
        o[1, 0] = o[2, 2] = avg2(L0, L1)
        o[1, 1] = o[2, 3] = avg3(AL, L0, L1)
        o[2, 0] = o[3, 2] = avg2(L1, L2)
        o[2, 1] = o[3, 3] = avg3(L0, L1, L2)
        o[3, 0] = avg2(L2, L3)
        o[3, 1] = avg3(L1, L2, L3)
    elif mode == B_HU:
        o[0, 0] = avg2(L0, L1)
        o[0, 1] = avg3(L0, L1, L2)
        o[0, 2] = o[1, 0] = avg2(L1, L2)
        o[0, 3] = o[1, 1] = avg3(L1, L2, L3)
        o[1, 2] = o[2, 0] = avg2(L2, L3)
        o[1, 3] = o[2, 1] = avg3(L2, L3, L3)
        o[2, 2] = o[2, 3] = o[3, 0] = o[3, 1] = o[3, 2] = o[3, 3] = L3
    else:  # pragma: no cover
        raise ValueError(f"bad sub-mode {mode}")
    return o


# ---------------------------------------------------------------------------
# frame decoding
# ---------------------------------------------------------------------------
_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]


def _parse_header(bd: BoolDecoder):
    """First-partition header after the uncompressed frame tag
    (RFC 6386 §9). Returns a dict of everything the MB loops need."""
    h: dict = {}
    h["color_space"] = bd.get()
    h["clamping"] = bd.get()
    h["seg_enabled"] = bd.get()
    h["seg_update_map"] = 0
    h["seg_probs"] = [255, 255, 255]
    h["seg_abs"] = 0
    h["seg_q"] = [0, 0, 0, 0]
    h["seg_lf"] = [0, 0, 0, 0]
    if h["seg_enabled"]:
        h["seg_update_map"] = bd.get()
        update_data = bd.get()
        if update_data:
            h["seg_abs"] = bd.get()
            for i in range(4):
                if bd.get():
                    h["seg_q"][i] = bd.signed(7)
            for i in range(4):
                if bd.get():
                    h["seg_lf"][i] = bd.signed(6)
        if h["seg_update_map"]:
            for i in range(3):
                h["seg_probs"][i] = bd.literal(8) if bd.get() else 255
    h["filter_type"] = bd.get()
    h["filter_level"] = bd.literal(6)
    h["sharpness"] = bd.literal(3)
    h["lf_delta_enabled"] = bd.get()
    h["ref_lf_delta"] = [0, 0, 0, 0]
    h["mode_lf_delta"] = [0, 0, 0, 0]
    if h["lf_delta_enabled"]:
        if bd.get():  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.get():
                    h["ref_lf_delta"][i] = bd.signed(6)
            for i in range(4):
                if bd.get():
                    h["mode_lf_delta"][i] = bd.signed(6)
    h["n_partitions"] = 1 << bd.literal(2)
    h["q_index"] = bd.literal(7)
    dq = {}
    for key in ("y1_dc", "y2_dc", "y2_ac", "uv_dc", "uv_ac"):
        dq[key] = bd.signed(4) if bd.get() else 0
    h["dq"] = dq
    h["refresh_entropy"] = bd.get()
    probs = [
        [[list(p) for p in ctx] for ctx in band] for band in DEFAULT_COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get(COEFF_UPDATE_PROBS[t][b][c][p]):
                        probs[t][b][c][p] = bd.literal(8)
    h["coeff_probs"] = probs
    h["mb_no_skip"] = bd.get()
    h["skip_prob"] = bd.literal(8) if h["mb_no_skip"] else 0
    return h


def decode_vp8_frame(data: bytes) -> dict:
    """Decode a VP8 key frame (the payload of a WebP ``VP8 `` chunk).
    Returns ``{"width", "height", "y", "u", "v"}`` with numpy planes
    cropped to the visible size (u/v at half resolution, ceil)."""
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError("VP8 interframe (only key frames)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 key-frame start code missing")
    w_raw = struct.unpack_from("<H", data, 6)[0]
    h_raw = struct.unpack_from("<H", data, 8)[0]
    width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("VP8 frame has zero dimension")
    first = data[10 : 10 + part0_size]
    if len(first) < part0_size:
        raise ValueError("VP8 first partition truncated")
    bd = BoolDecoder(first)
    h = _parse_header(bd)

    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16
    # token partitions: (n-1) 3-byte sizes, then the partitions
    rest = data[10 + part0_size :]
    nparts = h["n_partitions"]
    sizes = []
    off = 3 * (nparts - 1)
    for i in range(nparts - 1):
        sizes.append(
            rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        )
    parts = []
    for i in range(nparts):
        if i < nparts - 1:
            parts.append(rest[off : off + sizes[i]])
            off += sizes[i]
        else:
            parts.append(rest[off:])
    token_bds = [BoolDecoder(p) for p in parts]

    # ---- per-MB mode parse (first partition) ----
    seg_ids = np.zeros((mb_h, mb_w), dtype=np.int8)
    skips = np.zeros((mb_h, mb_w), dtype=bool)
    ymodes = np.zeros((mb_h, mb_w), dtype=np.int8)
    uvmodes = np.zeros((mb_h, mb_w), dtype=np.int8)
    bmodes = np.zeros((mb_h, mb_w, 16), dtype=np.int8)
    above_sub = np.zeros((mb_w, 4), dtype=np.int8)  # bottom sub-modes
    for my in range(mb_h):
        left_sub = np.zeros(4, dtype=np.int8)
        for mx in range(mb_w):
            if h["seg_update_map"]:
                seg_ids[my, mx] = bd.tree(_SEGMENT_TREE, h["seg_probs"])
            if h["mb_no_skip"]:
                skips[my, mx] = bool(bd.get(h["skip_prob"]))
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = (
                        bmodes[my, mx, sb - 4]
                        if r > 0
                        else int(above_sub[mx, c])
                    )
                    l = (
                        bmodes[my, mx, sb - 1]
                        if c > 0
                        else int(left_sub[r])
                    )
                    bmodes[my, mx, sb] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[a][l]
                    )
                above_sub[mx] = bmodes[my, mx, 12:16]
                left_sub[:] = bmodes[my, mx, [3, 7, 11, 15]]
            else:
                b = _MODE_TO_B[ym]
                bmodes[my, mx, :] = b
                above_sub[mx] = b
                left_sub[:] = b
            uvmodes[my, mx] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

    # ---- residual decode + reconstruction ----
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8
    Y = np.zeros((H16, W16), dtype=np.uint8)
    U = np.zeros((H8, W8), dtype=np.uint8)
    V = np.zeros((H8, W8), dtype=np.uint8)
    probs = h["coeff_probs"]
    base_q = h["q_index"]
    seg_qf = []
    for s in range(4):
        if h["seg_enabled"]:
            q = h["seg_q"][s] if h["seg_abs"] else base_q + h["seg_q"][s]
        else:
            q = base_q
        seg_qf.append(dequant_factors(_clip_q(q), h["dq"]))

    # nnz contexts: per MB column 4 Y + 2 U + 2 V + 1 Y2
    above_nz = np.zeros((mb_w, 9), dtype=np.int8)
    top_y = np.full(W16 + 8, 127, dtype=np.int32)
    top_u = np.full(W8, 127, dtype=np.int32)
    top_v = np.full(W8, 127, dtype=np.int32)
    has_coeffs = np.zeros((mb_h, mb_w), dtype=bool)
    for my in range(mb_h):
        left_nz = np.zeros(9, dtype=np.int8)
        tbd = token_bds[my % nparts]
        left_y = np.full(16, 129, dtype=np.int32)
        left_u = np.full(8, 129, dtype=np.int32)
        left_v = np.full(8, 129, dtype=np.int32)
        tl_y = tl_u = tl_v = 127 if my == 0 else 129
        new_top_y = np.empty_like(top_y)
        new_top_u = np.empty_like(top_u)
        new_top_v = np.empty_like(top_v)
        for mx in range(mb_w):
            qf = seg_qf[seg_ids[my, mx]]
            ym = int(ymodes[my, mx])
            is_b = ym == B_PRED
            ycoeffs = np.zeros((16, 16), dtype=np.int32)
            ucoeffs = np.zeros((4, 16), dtype=np.int32)
            vcoeffs = np.zeros((4, 16), dtype=np.int32)
            mb_nonzero = False
            if skips[my, mx]:
                left_nz[0:8] = 0
                above_nz[mx, 0:8] = 0
                if not is_b:
                    left_nz[8] = 0
                    above_nz[mx, 8] = 0
            else:
                if not is_b:
                    ctx = int(above_nz[mx, 8]) + int(left_nz[8])
                    y2, nz = decode_coeffs(
                        tbd, probs, 1, 0, ctx, qf["y2"][0], qf["y2"][1]
                    )
                    above_nz[mx, 8] = left_nz[8] = 1 if nz else 0
                    mb_nonzero |= nz
                    dcs = iwht4x4([int(v) for v in y2])
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = int(above_nz[mx, c]) + int(left_nz[r])
                    ptype = 3 if is_b else 0
                    first = 0 if is_b else 1
                    coeffs, nz = decode_coeffs(
                        tbd, probs, ptype, first, ctx, qf["y1"][0], qf["y1"][1]
                    )
                    if not is_b:
                        coeffs[0] = dcs[sb]
                    ycoeffs[sb] = coeffs
                    above_nz[mx, c] = left_nz[r] = 1 if nz else 0
                    mb_nonzero |= nz
                for pi, (dst, base_i) in enumerate(((ucoeffs, 4), (vcoeffs, 6))):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = int(above_nz[mx, base_i + c]) + int(
                            left_nz[base_i + r]
                        )
                        coeffs, nz = decode_coeffs(
                            tbd, probs, 2, 0, ctx, qf["uv"][0], qf["uv"][1]
                        )
                        dst[sb] = coeffs
                        above_nz[mx, base_i + c] = left_nz[base_i + r] = (
                            1 if nz else 0
                        )
                        mb_nonzero |= nz
            has_coeffs[my, mx] = mb_nonzero

            # --- luma reconstruction ---
            x0, y0 = mx * 16, my * 16
            buf = np.empty((17, 21), dtype=np.int32)  # row 0 = above ctx
            # above context row: above-left, 16 above, 4 above-right
            buf[0, 0] = tl_y
            buf[0, 1:17] = top_y[x0 : x0 + 16]
            if mx == mb_w - 1:
                buf[0, 17:21] = 127 if my == 0 else top_y[W16 - 1]
            else:
                buf[0, 17:21] = top_y[x0 + 16 : x0 + 20]
            tr_ctx = buf[0, 17:21].copy()
            if not is_b:
                above = buf[0, 1:17]
                pred = _pred_block(
                    ym, above, left_y, buf[0, 0], 16, my > 0, mx > 0
                )
                if my == 0 and mx == 0 and ym == DC_PRED:
                    pred[:, :] = 128
                elif my == 0 and ym == DC_PRED:
                    pred[:, :] = (int(left_y.sum()) + 8) >> 4
                elif mx == 0 and ym == DC_PRED:
                    pred[:, :] = (int(above.sum()) + 8) >> 4
                rec = buf[1:17, 1:17]
                rec[:, :] = pred
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    res = idct4x4([int(v) for v in ycoeffs[sb]])
                    blk = rec[4 * r : 4 * r + 4, 4 * c : 4 * c + 4]
                    blk[:, :] = np.clip(blk + res, 0, 255)
            else:
                buf[1:17, 0] = left_y
                rec = buf[1:17, 1:17]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = buf[4 * r, 4 * c + 1 : 4 * c + 5]
                    l = buf[4 * r + 1 : 4 * r + 5, 4 * c]
                    al = buf[4 * r, 4 * c]
                    ar = (
                        tr_ctx
                        if c == 3
                        else buf[4 * r, 4 * c + 5 : 4 * c + 9]
                    )
                    pred = _pred4(int(bmodes[my, mx, sb]), a, l, al, ar)
                    res = idct4x4([int(v) for v in ycoeffs[sb]])
                    rec[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] = np.clip(
                        pred + res, 0, 255
                    )
            Y[y0 : y0 + 16, x0 : x0 + 16] = rec
            tl_y = int(top_y[x0 + 15])
            left_y = rec[:, 15].astype(np.int32)
            new_top_y[x0 : x0 + 16] = rec[15, :]

            # --- chroma reconstruction ---
            uvm = int(uvmodes[my, mx])
            cx0, cy0 = mx * 8, my * 8
            for plane, coeffs, top_p, new_top_p, left_p, tl_p in (
                (U, ucoeffs, top_u, new_top_u, left_u, tl_u),
                (V, vcoeffs, top_v, new_top_v, left_v, tl_v),
            ):
                above = top_p[cx0 : cx0 + 8]
                pred = _pred_block(uvm, above, left_p, tl_p, 8, my > 0, mx > 0)
                if uvm == DC_PRED:
                    if my == 0 and mx == 0:
                        pred[:, :] = 128
                    elif my == 0:
                        pred[:, :] = (int(left_p.sum()) + 4) >> 3
                    elif mx == 0:
                        pred[:, :] = (int(above.sum()) + 4) >> 3
                rec8 = pred
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    res = idct4x4([int(v) for v in coeffs[sb]])
                    blk = rec8[4 * r : 4 * r + 4, 4 * c : 4 * c + 4]
                    blk[:, :] = np.clip(blk + res, 0, 255)
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = rec8
                if plane is U:
                    tl_u = int(top_p[cx0 + 7])
                    left_u = rec8[:, 7].astype(np.int32)
                else:
                    tl_v = int(top_p[cx0 + 7])
                    left_v = rec8[:, 7].astype(np.int32)
                new_top_p[cx0 : cx0 + 8] = rec8[7, :]
        new_top_y[W16:] = new_top_y[W16 - 1]
        top_y, new_top_y = new_top_y, top_y
        top_u, new_top_u = new_top_u, top_u
        top_v, new_top_v = new_top_v, top_v

    if h["filter_level"] > 0:
        _loop_filter(
            Y, U, V, h, seg_ids, ymodes, skips, has_coeffs, mb_w, mb_h
        )

    cw, ch = (width + 1) // 2, (height + 1) // 2
    return {
        "width": width,
        "height": height,
        "y": Y[:height, :width].copy(),
        "u": U[:ch, :cw].copy(),
        "v": V[:ch, :cw].copy(),
    }


# ---------------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 §15)
# ---------------------------------------------------------------------------
def _s(v):
    return int(v) - 128


def _u(v):
    return _clip255(v + 128)


def _do_filter2(px, i, step):
    """Common adjust with outer taps: filters p0/q0."""
    p1, p0, q0, q1 = (_s(px[i - 2 * step]), _s(px[i - step]), _s(px[i]),
                      _s(px[i + step]))
    a = _clamp_s(_clamp_s(p1 - q1) + 3 * (q0 - p0))
    f1 = _clamp_s(a + 4) >> 3
    f2 = _clamp_s(a + 3) >> 3
    px[i] = _u(q0 - f1)
    px[i - step] = _u(p0 + f2)


def _do_filter4(px, i, step):
    """Inner-edge filter without outer taps; also adjusts p1/q1."""
    p1, p0, q0, q1 = (_s(px[i - 2 * step]), _s(px[i - step]), _s(px[i]),
                      _s(px[i + step]))
    a = _clamp_s(3 * (q0 - p0))
    f1 = _clamp_s(a + 4) >> 3
    f2 = _clamp_s(a + 3) >> 3
    a3 = (f1 + 1) >> 1
    px[i] = _u(q0 - f1)
    px[i - step] = _u(p0 + f2)
    px[i + step] = _u(q1 - a3)
    px[i - 2 * step] = _u(p1 + a3)


def _do_filter6(px, i, step):
    """Macroblock-edge 6-tap filter (27/18/9 weights)."""
    p2, p1, p0 = _s(px[i - 3 * step]), _s(px[i - 2 * step]), _s(px[i - step])
    q0, q1, q2 = _s(px[i]), _s(px[i + step]), _s(px[i + 2 * step])
    w = _clamp_s(_clamp_s(p1 - q1) + 3 * (q0 - p0))
    a0 = (27 * w + 63) >> 7
    a1 = (18 * w + 63) >> 7
    a2 = (9 * w + 63) >> 7
    px[i] = _u(q0 - a0)
    px[i - step] = _u(p0 + a0)
    px[i + step] = _u(q1 - a1)
    px[i - 2 * step] = _u(p1 + a1)
    px[i + 2 * step] = _u(q2 - a2)
    px[i - 3 * step] = _u(p2 + a2)


def _needs_filter(px, i, step, E, I):
    p3, p2, p1, p0 = (int(px[i - 4 * step]), int(px[i - 3 * step]),
                      int(px[i - 2 * step]), int(px[i - step]))
    q0, q1, q2, q3 = (int(px[i]), int(px[i + step]), int(px[i + 2 * step]),
                      int(px[i + 3 * step]))
    return (
        abs(p3 - p2) <= I and abs(p2 - p1) <= I and abs(p1 - p0) <= I
        and abs(q3 - q2) <= I and abs(q2 - q1) <= I and abs(q1 - q0) <= I
        and 2 * abs(p0 - q0) + abs(p1 - q1) // 2 <= E
    )


def _hev(px, i, step, t):
    return (abs(int(px[i - 2 * step]) - int(px[i - step])) > t
            or abs(int(px[i + step]) - int(px[i])) > t)


def _filter_edge(plane, xs, ys, horiz, E, I, t, length, mb_edge):
    """Filter one edge: pixels cross the edge along `step`."""
    hh, ww = plane.shape
    flat = plane.reshape(-1)
    step = ww if horiz else 1
    for k in range(length):
        i = (ys + (0 if horiz else k)) * ww + xs + (k if horiz else 0)
        if not _needs_filter(flat, i, step, E, I):
            continue
        if _hev(flat, i, step, t):
            _do_filter2(flat, i, step)
        elif mb_edge:
            _do_filter6(flat, i, step)
        else:
            _do_filter4(flat, i, step)


def _simple_edge(plane, xs, ys, horiz, E, length):
    ww = plane.shape[1]
    flat = plane.reshape(-1)
    step = ww if horiz else 1
    for k in range(length):
        i = (ys + (0 if horiz else k)) * ww + xs + (k if horiz else 0)
        p1, p0 = int(flat[i - 2 * step]), int(flat[i - step])
        q0, q1 = int(flat[i]), int(flat[i + step])
        if 2 * abs(p0 - q0) + abs(p1 - q1) // 2 <= E:
            _do_filter2(flat, i, step)


def _loop_filter(Y, U, V, h, seg_ids, ymodes, skips, has_coeffs, mb_w, mb_h):
    sharp = h["sharpness"]
    for my in range(mb_h):
        for mx in range(mb_w):
            level = h["filter_level"]
            if h["seg_enabled"]:
                s = int(seg_ids[my, mx])
                level = h["seg_lf"][s] if h["seg_abs"] else level + h["seg_lf"][s]
            if h["lf_delta_enabled"]:
                level += h["ref_lf_delta"][0]  # intra frame
                if ymodes[my, mx] == B_PRED:
                    level += h["mode_lf_delta"][0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            if level == 0:
                continue
            interior = level
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior == 0:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            E_mb = (level + 2) * 2 + interior
            E_sb = level * 2 + interior
            inner = bool(has_coeffs[my, mx]) or ymodes[my, mx] == B_PRED
            x0, y0 = mx * 16, my * 16
            cx0, cy0 = mx * 8, my * 8
            if h["filter_type"] == 1:  # simple: luma only
                if mx > 0:
                    _simple_edge(Y, x0, y0, False, E_mb, 16)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_edge(Y, x0 + dx, y0, False, E_sb, 16)
                if my > 0:
                    _simple_edge(Y, x0, y0, True, E_mb, 16)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_edge(Y, x0, y0 + dy, True, E_sb, 16)
                continue
            if mx > 0:
                _filter_edge(Y, x0, y0, False, E_mb, interior, hev_t, 16, True)
                _filter_edge(U, cx0, cy0, False, E_mb, interior, hev_t, 8, True)
                _filter_edge(V, cx0, cy0, False, E_mb, interior, hev_t, 8, True)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, x0 + dx, y0, False, E_sb, interior, hev_t,
                                 16, False)
                _filter_edge(U, cx0 + 4, cy0, False, E_sb, interior, hev_t,
                             8, False)
                _filter_edge(V, cx0 + 4, cy0, False, E_sb, interior, hev_t,
                             8, False)
            if my > 0:
                _filter_edge(Y, x0, y0, True, E_mb, interior, hev_t, 16, True)
                _filter_edge(U, cx0, cy0, True, E_mb, interior, hev_t, 8, True)
                _filter_edge(V, cx0, cy0, True, E_mb, interior, hev_t, 8, True)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, x0, y0 + dy, True, E_sb, interior, hev_t,
                                 16, False)
                _filter_edge(U, cx0, cy0 + 4, True, E_sb, interior, hev_t,
                             8, False)
                _filter_edge(V, cx0, cy0 + 4, True, E_sb, interior, hev_t,
                             8, False)


# ---------------------------------------------------------------------------
# encoder twin (all-B_PRED key frames, default probabilities)
# ---------------------------------------------------------------------------
def _quantize(coeffs: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    """Zigzag-scan levels from raster fdct output (round-to-nearest —
    the level choice is encoder-free in VP8, the decoder only ever
    multiplies, and nearest halves the reconstruction error)."""
    out = np.zeros(16, dtype=np.int64)
    for i in range(16):
        v = int(coeffs[ZIGZAG[i]])
        q = dc_q if i == 0 else ac_q
        out[i] = (abs(v) + q // 2) // q * (1 if v >= 0 else -1)
    return out


def _dequant(levels: np.ndarray, dc_q: int, ac_q: int) -> list[int]:
    out = [0] * 16
    for i in range(16):
        q = dc_q if i == 0 else ac_q
        out[ZIGZAG[i]] = int(levels[i]) * q
    return out


def encode_vp8_frame(
    y: np.ndarray, u: np.ndarray, v: np.ndarray, q_index: int = 8,
) -> bytes:
    """Encode planes (uint8; u/v ceil-half resolution) as a VP8 key
    frame: all-B_PRED luma (B_DC sub-modes), chroma DC, default token
    probabilities, one token partition, per-MB skip flags, loop filter
    level 0. Prediction runs off the locally-reconstructed pixels, so
    any conformant decoder reproduces this encoder's reconstruction
    bit-exactly."""
    height, width = y.shape
    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8

    def pad(p, H, W):
        out = np.empty((H, W), dtype=np.int32)
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[:ph, pw:] = p[:, pw - 1 : pw]
        out[ph:, :] = out[ph - 1 : ph, :]
        return out

    Yp = pad(y.astype(np.int32), H16, W16)
    Up = pad(u.astype(np.int32), H8, W8)
    Vp = pad(v.astype(np.int32), H8, W8)
    qf = dequant_factors(_clip_q(q_index), {})
    probs = DEFAULT_COEFF_PROBS
    skip_prob = 128

    # pass 1: transform/quantize/reconstruct, collecting per-MB tokens
    recY = np.zeros((H16, W16), dtype=np.int32)
    recU = np.zeros((H8, W8), dtype=np.int32)
    recV = np.zeros((H8, W8), dtype=np.int32)
    mb_levels: list[tuple] = []
    top_y = np.full(W16 + 8, 127, dtype=np.int32)
    top_u = np.full(W8, 127, dtype=np.int32)
    top_v = np.full(W8, 127, dtype=np.int32)
    for my in range(mb_h):
        left_y = np.full(16, 129, dtype=np.int32)
        left_u = np.full(8, 129, dtype=np.int32)
        left_v = np.full(8, 129, dtype=np.int32)
        new_top_y = top_y.copy()
        new_top_u = top_u.copy()
        new_top_v = top_v.copy()
        for mx in range(mb_w):
            x0, y0 = mx * 16, my * 16
            ylv = []
            buf = np.empty((17, 17), dtype=np.int32)
            buf[0, 1:17] = top_y[x0 : x0 + 16]
            buf[1:17, 0] = left_y
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                a = buf[4 * r, 4 * c + 1 : 4 * c + 5]
                l = buf[4 * r + 1 : 4 * r + 5, 4 * c]
                dc = (int(a.sum()) + int(l.sum()) + 4) >> 3
                src = Yp[y0 + 4 * r : y0 + 4 * r + 4, x0 + 4 * c : x0 + 4 * c + 4]
                res = src - dc
                lv = _quantize(fdct4x4(res), qf["y1"][0], qf["y1"][1])
                ylv.append(lv)
                deq = _dequant(lv, qf["y1"][0], qf["y1"][1])
                rblk = np.clip(dc + idct4x4(deq), 0, 255)
                buf[1 + 4 * r : 5 + 4 * r, 1 + 4 * c : 5 + 4 * c] = rblk
            recY[y0 : y0 + 16, x0 : x0 + 16] = buf[1:17, 1:17]
            left_y = buf[1:17, 16].copy()
            new_top_y[x0 : x0 + 16] = buf[16, 1:17]

            cx0, cy0 = mx * 8, my * 8
            uvlv = []
            for plane, recP, top_p, new_top_p, left_ref in (
                (Up, recU, top_u, new_top_u, "u"),
                (Vp, recV, top_v, new_top_v, "v"),
            ):
                left_p = left_u if left_ref == "u" else left_v
                above = top_p[cx0 : cx0 + 8]
                if my == 0 and mx == 0:
                    dc = 128
                elif my == 0:
                    dc = (int(left_p.sum()) + 4) >> 3
                elif mx == 0:
                    dc = (int(above.sum()) + 4) >> 3
                else:
                    dc = (int(above.sum()) + int(left_p.sum()) + 8) >> 4
                rec8 = np.empty((8, 8), dtype=np.int32)
                plv = []
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    src = plane[cy0 + 4 * r : cy0 + 4 * r + 4,
                                cx0 + 4 * c : cx0 + 4 * c + 4]
                    lv = _quantize(fdct4x4(src - dc), qf["uv"][0], qf["uv"][1])
                    plv.append(lv)
                    deq = _dequant(lv, qf["uv"][0], qf["uv"][1])
                    rec8[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] = np.clip(
                        dc + idct4x4(deq), 0, 255
                    )
                recP[cy0 : cy0 + 8, cx0 : cx0 + 8] = rec8
                if left_ref == "u":
                    left_u = rec8[:, 7].copy()
                else:
                    left_v = rec8[:, 7].copy()
                new_top_p[cx0 : cx0 + 8] = rec8[7, :]
                uvlv.append(plv)
            skip = all(not lv.any() for lv in ylv) and all(
                not lv.any() for plv in uvlv for lv in plv
            )
            mb_levels.append((skip, ylv, uvlv[0], uvlv[1]))
        new_top_y[W16:] = new_top_y[W16 - 1]
        top_y, top_u, top_v = new_top_y, new_top_u, new_top_v

    # pass 2: first partition (header + modes)
    be = BoolEncoder()
    be.put(0)  # color space
    be.put(0)  # clamping
    be.put(0)  # segmentation disabled
    be.put(0)  # filter type: normal
    be.put_literal(0, 6)  # filter level 0
    be.put_literal(0, 3)  # sharpness
    be.put(0)  # no lf deltas
    be.put_literal(0, 2)  # one token partition
    be.put_literal(_clip_q(q_index), 7)
    for _ in range(5):
        be.put(0)  # no quantizer deltas
    be.put(1)  # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put(0, COEFF_UPDATE_PROBS[t][b][c][p])
    be.put(1)  # mb_no_coeff_skip enabled
    be.put_literal(skip_prob, 8)
    mi = 0
    for my in range(mb_h):
        for mx in range(mb_w):
            skip = mb_levels[mi][0]
            mi += 1
            be.put(1 if skip else 0, skip_prob)
            be.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, B_PRED)
            for _sb in range(16):  # all-B_DC: every context stays (0, 0)
                be.put_tree(BMODE_TREE, KF_BMODE_PROBS[B_DC][B_DC], B_DC)
            be.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)
    part0 = be.bytes()

    # pass 3: token partition
    te = BoolEncoder()
    above_nz = np.zeros((mb_w, 9), dtype=np.int8)
    mi = 0
    for my in range(mb_h):
        left_nz = np.zeros(9, dtype=np.int8)
        for mx in range(mb_w):
            skip, ylv, ulv, vlv = mb_levels[mi]
            mi += 1
            if skip:
                left_nz[0:8] = 0
                above_nz[mx, 0:8] = 0
                continue
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                ctx = int(above_nz[mx, c]) + int(left_nz[r])
                nz = encode_coeffs(te, probs, 3, 0, ctx, ylv[sb])
                above_nz[mx, c] = left_nz[r] = 1 if nz else 0
            for plv, base_i in ((ulv, 4), (vlv, 6)):
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    ctx = int(above_nz[mx, base_i + c]) + int(
                        left_nz[base_i + r]
                    )
                    nz = encode_coeffs(te, probs, 2, 0, ctx, plv[sb])
                    above_nz[mx, base_i + c] = left_nz[base_i + r] = (
                        1 if nz else 0
                    )
    tokens = te.bytes()

    tag = (len(part0) << 5) | (1 << 4) | (0 << 1) | 0  # show, v0, keyframe
    header = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    return header + part0 + tokens


# ---------------------------------------------------------------------------
# YUV <-> RGB (BT.601 studio range, libwebp-compatible integer forms)
# ---------------------------------------------------------------------------
def rgb_to_yuv420(rgb: np.ndarray):
    """uint8 HxWx3 -> (y, u, v) planes, u/v ceil-half size."""
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    y = (66 * r + 129 * g + 25 * b + 128 + (16 << 8)) >> 8
    h, w = r.shape
    H2, W2 = (h + 1) // 2, (w + 1) // 2
    rp = np.empty((2 * H2, 2 * W2), dtype=np.int32)
    out_uv = []
    for coefs, off in (((-38, -74, 112), 128), ((112, -94, -18), 128)):
        full = (coefs[0] * r + coefs[1] * g + coefs[2] * b + 128 + (128 << 8)) >> 8
        rp[:h, :w] = full
        rp[:h, w:] = full[:, -1:]
        rp[h:, :] = rp[h - 1 : h, :]
        sub = (rp[0::2, 0::2] + rp[0::2, 1::2] + rp[1::2, 0::2]
               + rp[1::2, 1::2] + 2) >> 2
        out_uv.append(np.clip(sub, 0, 255).astype(np.uint8))
    return np.clip(y, 0, 255).astype(np.uint8), out_uv[0], out_uv[1]


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    c = y.astype(np.int32) - 16
    d = uu - 128
    e = vv - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
