"""Pure-Python FLAC codec (stdlib + numpy).

Speech corpora (LibriSpeech, MLS, people's podcast dumps) ship FLAC,
not WAV — this closes the audio half of the compressed-media gap the
same way ``jpeg.py`` closed the image half. Scope is the published
FLAC format (xiph.org spec):

- decoder: ``fLaC`` stream marker, METADATA blocks (STREAMINFO parsed;
  others skipped), frames with UTF-8-style frame numbers and CRC-8
  headers, all four channel assignments (independent, left/side,
  right/side, mid/side), subframe types CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (quantized-coefficient linear prediction, any
  order), Rice-coded residuals (partition methods 0 and 1, escape code
  0b11111 raw residuals), wasted-bits shifts, CRC-16 frame footers
  (verified), and the STREAMINFO decoded-audio MD5 (verified when
  present).
- encoder (fixture writer): STREAMINFO + frames using the FIXED
  predictor family with per-frame order selection and per-partition
  Rice parameter fit, independent or mid/side stereo, 8/16/24-bit.
  FLAC is lossless, so tests assert decode(encode(x)) == x exactly —
  the same discipline as the PNG/GIF writers, with the two sides kept
  honest by spec-pinned CRC polynomials and the MD5 in STREAMINFO.

Reference parity note: the reference has no audio path at all (its
sources are reanalysis grids); this is extension surface for the
training-data pipeline (``operators/multimodal.py::resample_audio``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (FLAC spec: CRC-8 poly 0x07 over the frame header, CRC-16 poly
# 0x8005 over the whole frame)
# ---------------------------------------------------------------------------

_CRC8_TABLE = None
_CRC16_TABLE = None


def crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        t = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            t.append(c)
        _CRC8_TABLE = t
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        t = []
        for i in range(256):
            c = i << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            t.append(c)
        _CRC16_TABLE = t
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _rice_read(bits: _Bits, k: int) -> int:
    q = bits.read_unary()
    u = (q << k) | bits.read(k) if k else q
    return (u >> 1) ^ -(u & 1)  # zigzag -> signed


def _rice_write(bw: _BitsW, v: int, k: int) -> None:
    u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
    q = u >> k
    bw.write_unary(q)
    if k:
        bw.write(u & ((1 << k) - 1), k)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def parse_flac(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes -> (sample_rate, (n_samples, n_channels) int32).
    Frame CRC-16s and the STREAMINFO MD5 (when non-zero) are verified."""
    if data[:4] != b"fLaC":
        raise ValueError("Not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            bits = _Bits(body)
            bits.read(16)  # min block size
            bits.read(16)  # max block size
            bits.read(24)
            bits.read(24)
            sr = bits.read(20)
            nch = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            md5 = body[18:34]
            info = dict(sr=sr, nch=nch, bps=bps, total=total, md5=md5)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC: no STREAMINFO block")
    channels = [[] for _ in range(info["nch"])]
    n_read = 0
    while pos < len(data) and (info["total"] == 0 or n_read < info["total"]):
        pos, blk = _read_frame(data, pos, info)
        for c in range(info["nch"]):
            channels[c].append(blk[c])
        n_read += len(blk[0])
    out = np.stack(
        [np.concatenate(ch) for ch in channels], axis=1
    ).astype(np.int32)
    if info["total"]:
        out = out[: info["total"]]
    if info["md5"] != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(out, info["bps"])).digest() != info["md5"]:
            raise ValueError("FLAC: decoded-audio MD5 mismatch")
    return info["sr"], out


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian PCM at bps bits (the MD5 input)."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1)
    raw = flat.astype("<i4").tobytes()
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)
    return arr[:, :nbytes].tobytes()


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _read_frame(data: bytes, pos: int, info: dict):
    start = pos
    bits = _Bits(data, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"FLAC: bad frame sync at byte {pos}")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)
    if bs_code == 6:
        block = bits.read(8) + 1
    elif bs_code == 7:
        block = bits.read(16) + 1
    else:
        block = _BLOCK_SIZES[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZES[ss_code]
    hdr_end = bits.byte + (1 if bits.bit else 0)
    want = bits.read(8)
    if crc8(data[start:hdr_end]) != want:
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    if ch_code < 8:
        nch = ch_code + 1
        kinds = ["indep"] * nch
    elif ch_code == 8:
        nch, kinds = 2, ["left", "side"]
    elif ch_code == 9:
        nch, kinds = 2, ["side", "right"]
    elif ch_code == 10:
        nch, kinds = 2, ["mid", "side"]
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
    chans = []
    for c, kind in enumerate(kinds):
        eff_bps = bps + (1 if kind == "side" else 0)
        chans.append(_read_subframe(bits, block, eff_bps))
    bits.align()
    body_end = bits.byte
    want16 = (data[body_end] << 8) | data[body_end + 1]
    if crc16(data[start:body_end]) != want16:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    # undo inter-channel decorrelation
    if kinds == ["left", "side"]:
        left, side = chans
        chans = [left, left - side]
    elif kinds == ["side", "right"]:
        side, right = chans
        chans = [side + right, right]
    elif kinds == ["mid", "side"]:
        mid, side = chans
        left = (((mid << 1) | (side & 1)) + side) >> 1
        chans = [left, left - side]
    return body_end + 2, chans


def _read_subframe(bits: _Bits, block: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(block, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([bits.read_signed(eff) for _ in range(block)], np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, block, order)
        out = _predict_fixed(order, warm, resid)
    elif t >= 32:  # LPC order 1-32
        order = t - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, block, order)
        out = _predict_lpc(order, warm, coefs, shift, resid)
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    if wasted:
        out = out << wasted
    return out


def _read_residual(bits: _Bits, block: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    out = np.empty(block - order, np.int64)
    w = 0
    for p in range(nparts):
        n = block >> porder
        if p == 0:
            n -= order
        k = bits.read(kbits)
        if k == escape:
            raw = bits.read(5)
            for i in range(n):
                out[w + i] = bits.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                out[w + i] = _rice_read(bits, k)
        w += n
    return out


def _predict_fixed(order, warm, resid):
    out = np.empty(order + len(resid), np.int64)
    out[:order] = warm
    co = FIXED_COEFFS[order]
    for i in range(order, len(out)):
        p = 0
        for j, c in enumerate(co):
            p += c * out[i - 1 - j]
        out[i] = resid[i - order] + p
    return out


def _predict_lpc(order, warm, coefs, shift, resid):
    out = np.empty(order + len(resid), np.int64)
    out[:order] = warm
    for i in range(order, len(out)):
        p = 0
        for j in range(order):
            p += coefs[j] * out[i - 1 - j]
        out[i] = resid[i - order] + (p >> shift)
    return out


# ---------------------------------------------------------------------------
# Encoder (FIXED predictors + Rice; lossless)
# ---------------------------------------------------------------------------


def write_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mid_side: bool = False,
    stereo_mode: str | None = None,
    lpc_order: int = 0,
    partition_order: int = 0,
) -> bytes:
    """(n,) or (n, ch) int -> FLAC bytes. Lossless.

    Defaults encode FIXED predictors (order chosen by residual
    magnitude) with one fitted Rice partition. The extra knobs exist so
    round-trip tests exercise every DECODER path: ``stereo_mode`` in
    {'indep', 'mid', 'left', 'right'} selects the channel
    decorrelation (``mid_side=True`` is shorthand for 'mid');
    ``lpc_order`` > 0 encodes LPC subframes (autocorrelation +
    Levinson-Durbin, 12-bit quantized coefficients);
    ``partition_order`` splits each residual into 2^p Rice partitions
    with per-partition parameters (escape-coded raw residuals when the
    fitted parameter saturates)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    s = s.astype(np.int64)
    lim = 1 << (bps - 1)
    if s.min() < -lim or s.max() >= lim:
        raise ValueError(f"samples exceed {bps}-bit range")
    n, nch = s.shape
    if stereo_mode is None:
        stereo_mode = "mid" if mid_side else "indep"
    if stereo_mode not in ("indep", "mid", "left", "right"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if stereo_mode != "indep" and nch != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    md5 = hashlib.md5(_pcm_bytes(s.astype(np.int32), bps)).digest()
    body = bytes(si.out) + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        out += _write_frame(
            blk, fi, sample_rate, bps, block_size, stereo_mode,
            lpc_order, partition_order,
        )
    return bytes(out)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    parts = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    first = lead | (v >> shift)
    parts.append(first & 0xFF)
    for i in range(nbytes - 1):
        shift -= 6
        parts.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(parts)


def _write_frame(blk, fi, sr, bps, nominal_block, stereo_mode,
                 lpc_order, partition_order):
    block = blk.shape[0]
    nch = blk.shape[1]
    bw = _BitsW()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed blocksize strategy
    bs_code = {v: k for k, v in _BLOCK_SIZES.items()}.get(block)
    ch_code = {"indep": nch - 1, "left": 8, "right": 9, "mid": 10}[stereo_mode]
    ss_code = {v: k for k, v in _SAMPLE_SIZES.items()}[bps]
    bw.write(bs_code if bs_code is not None else 7, 4)
    bw.write({v: k for k, v in _SAMPLE_RATES.items()}.get(sr, 0), 4)
    bw.write(ch_code, 4)
    bw.write(ss_code, 3)
    bw.write(0, 1)
    # 32 header bits written -> byte aligned; append the coded number
    # (+ optional explicit block size) and the CRC-8
    head = bytearray(bw.out)
    head += _utf8_number(fi)
    if bs_code is None:
        head += bytes([((block - 1) >> 8) & 0xFF, (block - 1) & 0xFF])
    head.append(crc8(bytes(head)))

    body = _BitsW()
    if stereo_mode != "indep":
        left = blk[:, 0]
        right = blk[:, 1]
        side = left - right
        if stereo_mode == "mid":
            subs = [((left + right) >> 1, bps), (side, bps + 1)]
        elif stereo_mode == "left":
            subs = [(left, bps), (side, bps + 1)]
        else:  # right (side, right)
            subs = [(side, bps + 1), (right, bps)]
        for x, b in subs:
            _write_subframe(body, x, b, lpc_order, partition_order)
    else:
        for c in range(nch):
            _write_subframe(body, blk[:, c], bps, lpc_order, partition_order)
    body.align()
    frame = bytes(head) + bytes(body.out)
    return frame + crc16(frame).to_bytes(2, "big")


def _lpc_coeffs(x: np.ndarray, order: int, precision: int = 12):
    """Quantized LPC coefficients via autocorrelation + Levinson-Durbin
    (the standard FLAC analysis); returns (coefs, shift) or None when
    the signal is degenerate."""
    xf = x.astype(np.float64)
    r = np.array([np.dot(xf[: len(xf) - i], xf[i:]) for i in range(order + 1)])
    if r[0] == 0:
        return None
    a = np.zeros(order)
    err = r[0]
    for i in range(order):
        acc = r[i + 1] - np.dot(a[:i], r[i:0:-1][:i])
        kref = acc / err
        a[: i + 1] = np.concatenate([a[:i] - kref * a[:i][::-1], [kref]])
        err *= 1 - kref * kref
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0:
        return None
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    q = np.clip(q, -(1 << (precision - 1)), (1 << (precision - 1)) - 1)
    if not q.any():
        return None
    return q, shift


def _write_subframe(
    bw: _BitsW, x: np.ndarray, bps: int, lpc_order: int = 0,
    partition_order: int = 0,
) -> None:
    # wasted-bits detection (spec: common trailing zero bits are shifted
    # out and signalled in the subframe header)
    wasted = 0
    if np.any(x):
        ored = 0
        for v in x:
            ored |= int(v)
        while not ored & 1:
            wasted += 1
            ored >>= 1
        if wasted:
            x = x >> wasted
            bps -= wasted
    if lpc_order and len(x) > lpc_order:
        got = _lpc_coeffs(x, lpc_order)
        if got is not None:
            q, shift = got
            resid = np.empty(len(x) - lpc_order, np.int64)
            for i in range(lpc_order, len(x)):
                p = 0
                for j in range(lpc_order):
                    p += int(q[j]) * int(x[i - 1 - j])
                resid[i - lpc_order] = int(x[i]) - (p >> shift)
            bw.write(0, 1)
            bw.write(32 + lpc_order - 1, 6)
            _write_wasted(bw, wasted)
            for v in x[:lpc_order]:
                bw.write(int(v), bps)
            bw.write(12 - 1, 4)  # precision 12
            bw.write(shift, 5)
            for c in q:
                bw.write(int(c), 12)
            _write_residual(bw, resid, len(x), lpc_order, partition_order)
            return
    # pick the FIXED order with the smallest absolute residual sum
    best_order, best_resid, best_cost = 0, None, None
    for order in range(min(4, len(x) - 1) + 1):
        co = FIXED_COEFFS[order]
        resid = x[order:].copy()
        for j, c in enumerate(co):
            resid = resid - c * x[order - 1 - j : len(x) - 1 - j]
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    order, resid = best_order, best_resid
    bw.write(0, 1)
    bw.write(8 + order, 6)
    _write_wasted(bw, wasted)
    for v in x[:order]:
        bw.write(int(v), bps)
    _write_residual(bw, resid, len(x), order, partition_order)


def _write_wasted(bw: _BitsW, wasted: int) -> None:
    """Subframe wasted-bits field: flag bit, then unary k-1 (the decoder
    reads unary and adds 1)."""
    if wasted == 0:
        bw.write(0, 1)
    else:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)


def _write_residual(bw: _BitsW, resid, block, order, partition_order):
    # partitions must divide the block evenly with the first shortened
    # by the predictor order (spec); fall back to order 0 otherwise
    while partition_order > 0 and (
        block % (1 << partition_order) != 0
        or (block >> partition_order) <= order
    ):
        partition_order -= 1
    bw.write(0, 2)  # method 0 (4-bit rice params)
    bw.write(partition_order, 4)
    w = 0
    for p in range(1 << partition_order):
        n = block >> partition_order
        if p == 0:
            n -= order
        part = resid[w : w + n]
        mean = (int(np.abs(part).sum()) // max(len(part), 1)) if len(part) else 0
        k = 0
        while (1 << k) < mean + 1 and k < 14:
            k += 1
        if k >= 14 and mean >= (1 << 14):
            # escape: raw binary residuals at a fixed width
            raw = max(int(v).bit_length() + 1 for v in part) if len(part) else 1
            raw = min(raw, 31)
            bw.write(0xF, 4)
            bw.write(raw, 5)
            for v in part:
                bw.write(int(v), raw)
        else:
            bw.write(k, 4)
            for v in part:
                _rice_write(bw, int(v), k)
        w += n
