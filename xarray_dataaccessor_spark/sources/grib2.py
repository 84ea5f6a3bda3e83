"""Pure-Python minimal GRIB2 reader + fixture-writer twin (stdlib
``struct`` + numpy, same discipline as the sibling ``netcdf3``/``hdf5``/
``geotiff``/``zarr`` readers).

The reference's CDS accessor downloads ERA5 either as NetCDF or as GRIB
(``era5_from_cds.py`` request ``format`` param); GRIB2 is the WMO wire
format (FM 92, public spec) ERA5 is natively distributed in. This module
decodes the common ERA5 shape:

- Section 0 indicator (edition 2), multi-message files
- Section 1 identification (reference time)
- Section 3 grid definition template 3.0 (regular latitude/longitude),
  including the 1e-6-degree coordinates and scanning-mode handling for
  the standard north-to-south row order
- Section 4 product definition template 4.0 (parameter category/number,
  forecast hour)
- Section 5 data representation template 5.0 (simple packing:
  ``value = (R + packed * 2^E) / 10^D`` with signed-magnitude E/D)
- Section 6 bitmap (indicator 255 = none; a present bitmap masks
  missing points to NaN)
- Section 7 bit-packed data, unpacked vectorized via numpy

Everything else (complex/jpeg/png packing, spectral grids, ensemble
templates) raises NotImplementedError naming the construct —
detect-and-reject, never misread.
"""

from __future__ import annotations

import struct

import numpy as np


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "big")


def _s_mag(buf: bytes, off: int, n: int) -> int:
    """GRIB signed-magnitude integer: high bit = sign."""
    raw = _u(buf, off, n)
    sign_bit = 1 << (8 * n - 1)
    return -(raw & ~sign_bit) if raw & sign_bit else raw


def _unpack_bits(data: bytes, nbits: int, count: int) -> np.ndarray:
    """Vectorized fixed-width big-endian bit-field unpack."""
    if nbits == 0:
        return np.zeros(count, dtype="int64")
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    need = count * nbits
    if bits.size < need:
        raise ValueError("GRIB data section shorter than packed payload")
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype="int64"))
    return bits[:need].reshape(count, nbits).astype("int64") @ weights


def parse_grib2(buf: bytes) -> list[dict]:
    """Parse every GRIB2 message in ``buf``. Each message yields
    ``{ref_time, forecast_hour, category, number, lats, lons, data}``
    with ``data`` shaped (nlat, nlon), north-to-south rows, NaN where
    the bitmap masks missing points."""
    messages: list[dict] = []
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 4] != b"GRIB":
            if not buf[pos:].strip(b"\x00"):
                break  # trailing padding
            raise ValueError("GRIB indicator not found")
        edition = buf[pos + 7]
        if edition != 2:
            raise NotImplementedError(f"GRIB edition {edition} (want 2)")
        total_len = _u(buf, pos + 8, 8)
        msg = buf[pos : pos + total_len]
        if msg[-4:] != b"7777":
            raise ValueError("GRIB message missing 7777 trailer")
        messages.extend(_parse_message(msg))
        pos += total_len
    return messages


def _parse_message(msg: bytes) -> list[dict]:
    """All fields of one message. Sections 2-7 may legally REPEAT —
    one (4,5,6,7) run per field, with earlier sections carried forward
    — so the walk emits a field at every section-7 boundary from the
    latest-seen state instead of keying a dict by section number."""
    pos = 16  # past section 0
    sec: dict[int, bytes] = {}
    fields: list[dict] = []
    while pos < len(msg) - 4:
        ln = _u(msg, pos, 4)
        if ln < 5:
            raise ValueError(
                f"GRIB2 section length {ln} < 5 (corrupt message)"
            )
        num = msg[pos + 4]
        sec[num] = msg[pos : pos + ln]
        pos += ln
        if num == 7:
            for required in (1, 3, 5):
                if required not in sec:
                    raise ValueError(f"GRIB field missing section {required}")
            fields.append(_parse_field(sec))
            # bitmap indicator 254 means "reuse previous"; our reader
            # treats each field independently, so drop 6/7 between fields
            sec.pop(7, None)
            sec.pop(6, None)
    if not fields:
        raise ValueError("GRIB message contains no data section")
    return fields


def _parse_field(sec: dict[int, bytes]) -> dict:
    import datetime as dt

    s1 = sec[1]
    ref_time = dt.datetime(
        _u(s1, 12, 2), s1[14], s1[15], s1[16], s1[17], s1[18]
    )

    s3 = sec[3]
    template3 = _u(s3, 12, 2)
    if template3 != 0:
        raise NotImplementedError(
            f"GRIB grid definition template 3.{template3} (only 3.0 "
            "regular lat/lon)"
        )
    ni = _u(s3, 30, 4)  # points along a parallel (lon count)
    nj = _u(s3, 34, 4)  # points along a meridian (lat count)
    lat1 = _s_mag(s3, 46, 4) / 1e6
    lon1 = _s_mag(s3, 50, 4) / 1e6
    lat2 = _s_mag(s3, 55, 4) / 1e6
    lon2 = _s_mag(s3, 59, 4) / 1e6
    scan = s3[71]
    if scan & 0b00100000:
        raise NotImplementedError("GRIB consecutive-j (column-major) scanning")
    lats = np.linspace(lat1, lat2, nj)
    lons = np.linspace(lon1, lon2, ni)
    if scan & 0b10000000:  # -i direction: lon descending as stored
        lons = lons[::-1].copy()
    j_ascending = bool(scan & 0b01000000)

    forecast_hour = 0
    category = number = None
    if 4 in sec:
        s4 = sec[4]
        template4 = _u(s4, 7, 2)
        if template4 != 0:
            raise NotImplementedError(
                f"GRIB product definition template 4.{template4} (only 4.0)"
            )
        category, number = s4[9], s4[10]
        forecast_hour = _u(s4, 18, 4)

    s5 = sec[5]
    npoints = _u(s5, 5, 4)
    template5 = _u(s5, 9, 2)
    if template5 != 0:
        raise NotImplementedError(
            f"GRIB data representation template 5.{template5} (only 5.0 "
            "simple packing)"
        )
    (ref_val,) = struct.unpack(">f", s5[11:15])
    e_scale = _s_mag(s5, 15, 2)
    d_scale = _s_mag(s5, 17, 2)
    nbits = s5[19]

    bitmap = None
    if 6 in sec:
        s6 = sec[6]
        indicator = s6[5]
        if indicator == 0:
            bitmap = np.unpackbits(np.frombuffer(s6[6:], dtype=np.uint8))[
                : ni * nj
            ].astype(bool)
        elif indicator != 255:
            raise NotImplementedError(f"GRIB bitmap indicator {indicator}")

    s7 = sec[7]
    packed = _unpack_bits(s7[5:], nbits, npoints)
    values = (ref_val + packed.astype("float64") * (2.0**e_scale)) / (10.0**d_scale)

    if bitmap is not None:
        if ni <= 0 or nj <= 0 or ni * nj > (1 << 28):
            raise ValueError(
                f"GRIB2 grid {ni}x{nj} invalid or beyond the 2^28-point "
                "sanity cap (corrupt section 3)"
            )
        full = np.full(ni * nj, np.nan)
        full[bitmap] = values
        values = full
    elif npoints != ni * nj:
        raise ValueError("GRIB point count != grid size without a bitmap")
    data = values.reshape(nj, ni)
    if j_ascending:  # stored south-to-north: normalize to north-first
        data = data[::-1]
        lats = lats[::-1].copy() if lats[0] < lats[-1] else lats
    if lats[0] < lats[-1]:
        lats = lats[::-1].copy()
        data = data[::-1]
    return {
        "ref_time": ref_time,
        "forecast_hour": forecast_hour,
        "category": category,
        "number": number,
        "lats": lats,
        "lons": lons,
        "data": data,
    }


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------
def _pack_bits(vals: np.ndarray, nbits: int) -> bytes:
    bits = (
        (vals[:, None] >> np.arange(nbits - 1, -1, -1, dtype="int64")) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def write_grib2(
    path: str,
    fields: list[dict],
    fields_per_message: int = 1,
) -> str:
    """Write a GRIB2 file. Each field dict:
    ``{ref_time, forecast_hour, category, number, lats, lons, data,
    e_scale?, d_scale?}`` — ``lats`` north-to-south, ``data`` shaped
    (nlat, nlon). Values are simple-packed with the given binary/decimal
    scales (defaults 0/0: integers-only exact; use e_scale=-2 for
    quarter-degree-style payloads). ``fields_per_message`` > 1 groups
    consecutive fields into one message with repeated (4,5,6,7) section
    runs — the multi-field layout operational products use."""
    out = bytearray()
    for i in range(0, len(fields), fields_per_message):
        out += _write_message_multi(fields[i : i + fields_per_message])
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return path


def _write_message_multi(fields: list[dict]) -> bytes:
    """One GRIB2 message holding ``fields`` as repeated section runs.
    Section 1 comes from the first field (one reference time per
    message, per spec)."""
    t = fields[0]["ref_time"]
    s1 = _sec(
        1,
        struct.pack(">HHBBB", 0, 0, 2, 1, 1)
        + struct.pack(">HBBBBB", t.year, t.month, t.day, t.hour, t.minute, t.second)
        + bytes([0, 1]),
    )
    body = s1
    for f in fields:
        body += _field_sections(f)
    body += b"7777"
    total = 16 + len(body)
    s0 = b"GRIB" + bytes([0, 0, 0, 2]) + struct.pack(">Q", total)
    return s0 + body


def _sec(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", len(body) + 5, num) + body


def _field_sections(f: dict) -> bytes:
    lats = np.asarray(f["lats"], dtype="float64")
    lons = np.asarray(f["lons"], dtype="float64")
    data = np.asarray(f["data"], dtype="float64")
    nj, ni = data.shape
    assert len(lats) == nj and len(lons) == ni
    e_scale = int(f.get("e_scale", 0))
    d_scale = int(f.get("d_scale", 0))
    scaled = data * (10.0**d_scale)
    # the wire reference value is IEEE float32: round it DOWN to f32
    # before computing offsets, or every decoded value shifts by the
    # f64->f32 rounding error of the minimum
    ref32 = np.float32(np.nanmin(scaled))
    if float(ref32) > float(np.nanmin(scaled)):
        ref32 = np.nextafter(ref32, np.float32("-inf"), dtype=np.float32)
    ref = float(ref32)
    ints = np.round((scaled.reshape(-1) - ref) / (2.0**e_scale)).astype("int64")
    nbits = max(1, int(ints.max()).bit_length()) if ints.size else 1

    sec = _sec

    def smag(v: int, n: int) -> bytes:
        return (abs(v) | ((1 << (8 * n - 1)) if v < 0 else 0)).to_bytes(n, "big")

    tmpl3 = (
        bytes([6])  # shape of earth: spherical r=6371229
        + bytes(15)  # scale factors / radii (unused for shape 6)
        + struct.pack(">II", ni, nj)
        + struct.pack(">II", 0, 0)  # basic angle / subdivisions
        + smag(int(round(lats[0] * 1e6)), 4)
        + smag(int(round(lons[0] * 1e6)), 4)
        + bytes([0b00110000])  # resolution/component flags: Di/Dj given
        + smag(int(round(lats[-1] * 1e6)), 4)
        + smag(int(round(lons[-1] * 1e6)), 4)
        + struct.pack(
            ">II",
            int(round(abs(lons[1] - lons[0]) * 1e6)) if ni > 1 else 0,
            int(round(abs(lats[1] - lats[0]) * 1e6)) if nj > 1 else 0,
        )
        + bytes([0])  # scanning mode: +i, -j (north-to-south rows)
    )
    s3 = sec(3, bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0]) + struct.pack(">H", 0) + tmpl3)

    tmpl4 = (
        bytes([int(f.get("category", 0)), int(f.get("number", 0))])
        # generating process type, background id, process id,
        # cutoff hours (2), cutoff minutes — octets 12-17
        + bytes([2, 255, 255, 0, 0, 0])
        + bytes([1])  # octet 18: time unit = hour
        + struct.pack(">I", int(f.get("forecast_hour", 0)))  # octets 19-22
        + bytes([103, 0]) + struct.pack(">I", 2)  # level: 2 m above ground
        + bytes([255, 0]) + struct.pack(">I", 0)
    )
    s4 = sec(4, struct.pack(">HH", 0, 0) + tmpl4)

    s5 = sec(
        5,
        struct.pack(">IH", ni * nj, 0)
        + struct.pack(">f", ref)
        + smag(e_scale, 2)
        + smag(d_scale, 2)
        + bytes([nbits, 0]),
    )
    s6 = sec(6, bytes([255]))
    s7 = sec(7, _pack_bits(ints, nbits))

    return s3 + s4 + s5 + s6 + s7
