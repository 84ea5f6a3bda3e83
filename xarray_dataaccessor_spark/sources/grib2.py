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
- Section 5 data representation templates 5.0 (simple packing:
  ``value = (R + packed * 2^E) / 10^D`` with signed-magnitude E/D),
  5.2 (complex packing, general group splitting) and 5.3 (complex
  packing with first/second-order spatial differencing) — the layouts
  operational ECMWF/NOAA GRIB overwhelmingly ships
- Section 6 bitmap (indicator 255 = none; a present bitmap masks
  missing points to NaN)
- Section 7 bit-packed data, unpacked vectorized via numpy

Everything else (jpeg2000/png/CCSDS packing, spectral grids, ensemble
templates, missing-value management inside complex groups) raises
NotImplementedError naming the construct — detect-and-reject, never
misread.
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
    # bound BEFORE any dimension-sized allocation (linspace/zeros):
    # corrupt 4-byte counts would otherwise drive multi-GB numpy allocs
    if not (0 < ni <= (1 << 24) and 0 < nj <= (1 << 24)) or ni * nj > (1 << 28):
        raise ValueError(
            f"GRIB2 grid {ni}x{nj} invalid or beyond the 2^28-point "
            "sanity cap (corrupt section 3)"
        )
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
    if npoints > ni * nj:
        raise ValueError(
            f"GRIB2 point count {npoints} exceeds the {ni}x{nj} grid "
            "(corrupt section 5)"
        )
    template5 = _u(s5, 9, 2)
    if template5 not in (0, 2, 3):
        raise NotImplementedError(
            f"GRIB data representation template 5.{template5} (5.0 simple, "
            "5.2 complex, 5.3 complex+spatial-differencing)"
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
    miss = None
    if template5 == 0:
        packed = _unpack_bits(s7[5:], nbits, npoints)
    else:
        packed, miss = _unpack_complex(s5, s7, npoints, template5 == 3)
    values = (ref_val + packed.astype("float64") * (2.0**e_scale)) / (10.0**d_scale)
    if miss is not None:
        # in-stream missing-value substitution (template octet 23):
        # flagged points become NaN, same contract as the bitmap path
        values[miss] = np.nan

    if bitmap is not None:
        full = np.full(ni * nj, np.nan)  # bounds checked at section 3
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


def _unpack_complex(
    s5: bytes, s7: bytes, npoints: int, spatial_diff: bool
) -> tuple[np.ndarray, np.ndarray | None]:
    """Data representation templates 5.2/5.3: complex packing (general
    group splitting), optionally with first/second-order spatial
    differencing. Returns ``(field, missing_mask)`` — the
    scaled-integer field (the caller applies the R/E/D simple-packing
    formula) plus a boolean mask of in-stream missing points (None when
    the message uses no missing-value management).

    Wire layout (WMO FM92 §5.2/5.3 + data template 7.2/7.3): section 7
    carries, for 5.3, ``order+1`` signed-magnitude extra descriptors
    (initial value(s) then the overall minimum of the differences),
    then four bit-streams — group reference values, group widths,
    scaled group lengths, and the per-group packed values — the first
    three each padded to a byte boundary.

    Missing-value management (template octet 23; the flavor NOAA
    complex-packed products use instead of a bitmap): 1 = primary
    substitute, 2 = primary and secondary. Within a group of width
    ``w > 0``, a packed residual of all-ones (``2^w - 1``) flags the
    point primary-missing and ``2^w - 2`` secondary-missing; a
    zero-width group is flagged whole-group-missing through the same
    sentinels in its GROUP REFERENCE (width ``nbits``). With spatial
    differencing the difference stream covers the NON-missing points
    only — the undo accumulates over that subsequence and scatters
    back (same order NCEP g2lib decodes)."""
    mvm = s5[22]
    if mvm not in (0, 1, 2):
        raise NotImplementedError(
            f"GRIB complex packing missing-value management {mvm}"
        )
    nbits = s5[19]
    ng = _u(s5, 31, 4)
    if ng == 0 or ng > npoints:
        raise ValueError(f"GRIB complex packing group count {ng} invalid")
    wref, wbits = s5[35], s5[36]
    lref = _u(s5, 37, 4)
    linc = s5[41]
    last_len = _u(s5, 42, 4)
    lbits = s5[46]
    body = s7[5:]
    off = 0
    ivals: list[int] = []
    gmin = 0
    if spatial_diff:
        od, ww = s5[47], s5[48]
        if od not in (1, 2):
            raise NotImplementedError(f"GRIB spatial differencing order {od}")
        if ww == 0 or len(body) < (od + 1) * ww:
            raise ValueError("GRIB spatial-differencing descriptors truncated")
        extras = [_s_mag(body, i * ww, ww) for i in range(od + 1)]
        ivals, gmin = extras[:-1], extras[-1]
        off = (od + 1) * ww

    bits = np.unpackbits(np.frombuffer(body[off:], dtype=np.uint8))
    bp = 0

    def take(n: int, w: int, pad: bool) -> np.ndarray:
        nonlocal bp
        if w == 0:
            return np.zeros(n, dtype="int64")
        need = n * w
        if bp + need > bits.size:
            raise ValueError("GRIB complex data section truncated")
        weights = 1 << np.arange(w - 1, -1, -1, dtype="int64")
        out = bits[bp : bp + need].reshape(n, w).astype("int64") @ weights
        bp += need
        if pad and bp % 8:  # streams are byte-aligned on the wire
            bp += 8 - bp % 8
        return out

    grefs = take(ng, nbits, pad=True)
    widths = wref + take(ng, wbits, pad=True)
    lens = lref + linc * take(ng, lbits, pad=True)
    lens[-1] = last_len
    if int(lens.sum()) != npoints:
        raise ValueError(
            f"GRIB group lengths sum to {int(lens.sum())}, expected {npoints}"
        )
    if int((widths * lens).sum()) > bits.size:
        raise ValueError("GRIB complex data section truncated")
    v = np.empty(npoints, dtype="int64")
    miss = np.zeros(npoints, dtype=bool) if mvm else None
    i0 = 0
    for g in range(ng):
        ln = int(lens[g])
        w = int(widths[g])
        if w == 0:
            # constant group — or, under missing management, a
            # whole-group missing sentinel carried in the reference
            gr = int(grefs[g])
            if mvm and nbits > 0 and gr == (1 << nbits) - 1:
                miss[i0 : i0 + ln] = True
                v[i0 : i0 + ln] = 0
            elif mvm == 2 and nbits > 0 and gr == (1 << nbits) - 2:
                miss[i0 : i0 + ln] = True
                v[i0 : i0 + ln] = 0
            else:
                v[i0 : i0 + ln] = gr
        else:
            raw = take(ln, w, pad=False)
            if mvm:
                m = raw == (1 << w) - 1
                if mvm == 2:
                    m |= raw == (1 << w) - 2
                miss[i0 : i0 + ln] = m
                vals = grefs[g] + raw
                vals[m] = 0
                v[i0 : i0 + ln] = vals
            else:
                v[i0 : i0 + ln] = grefs[g] + raw
        i0 += ln

    if not spatial_diff:
        return v, miss

    def undo_diff(stream: np.ndarray) -> np.ndarray:
        od = len(ivals)
        if stream.size <= od:
            return np.asarray(ivals[: stream.size], dtype="int64")
        # first `od` values come from the descriptors, the rest are
        # differences offset by gmin
        d = stream + gmin
        if od == 1:
            return np.cumsum(np.concatenate([[ivals[0]], d[1:]]))
        first = np.cumsum(np.concatenate([[ivals[1] - ivals[0]], d[2:]]))
        return np.cumsum(np.concatenate([[ivals[0]], first]))

    if miss is None or not miss.any():
        return undo_diff(v), miss
    # the differenced stream covers non-missing points only
    out = np.zeros(npoints, dtype="int64")
    out[~miss] = undo_diff(v[~miss])
    return out, miss


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
    packing = f.get("packing", "simple")
    missing_mgmt = int(f.get("missing_mgmt", 0))
    if missing_mgmt and packing == "simple":
        raise ValueError("missing_mgmt requires complex packing")
    secondary = f.get("secondary_missing")
    if secondary is not None:
        secondary = np.asarray(secondary, dtype=bool).reshape(-1)
        if missing_mgmt != 2:
            raise ValueError("secondary_missing requires missing_mgmt=2")
    # NaN cells -> section-6 bitmap (present-points mask); only present
    # values are packed, the reader re-expands to NaN. Under
    # missing_mgmt (complex packing only) NaNs are flagged IN-STREAM
    # via sentinel residuals instead — all grid points are packed and
    # no bitmap is written, the layout NOAA complex products use.
    primary = np.isnan(data.reshape(-1))
    if secondary is not None:
        primary = primary & ~secondary
    mask = ~np.isnan(data.reshape(-1))
    if missing_mgmt:
        if secondary is not None:
            mask = mask & ~secondary
        if not mask.any():
            raise ValueError("GRIB field has no present data points")
        has_gaps = False  # flagged in-stream, not via bitmap
    else:
        has_gaps = not mask.all()
        if has_gaps and not mask.any():
            raise ValueError("GRIB field has no present data points")
    data = np.where(np.isnan(data), 0.0, data)  # packed values come from mask
    scaled = data * (10.0**d_scale)
    # the wire reference value is IEEE float32: round it DOWN to f32
    # before computing offsets, or every decoded value shifts by the
    # f64->f32 rounding error of the minimum
    present = scaled.reshape(-1)[mask]
    ref32 = np.float32(present.min())
    if float(ref32) > float(present.min()):
        ref32 = np.nextafter(ref32, np.float32("-inf"), dtype=np.float32)
    ref = float(ref32)
    ints = np.round((present - ref) / (2.0**e_scale)).astype("int64")
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

    if packing == "simple":
        npoints = int(mask.sum())
        s5 = sec(
            5,
            struct.pack(">IH", npoints, 0)
            + struct.pack(">f", ref)
            + smag(e_scale, 2)
            + smag(d_scale, 2)
            + bytes([nbits, 0]),
        )
        s7 = sec(7, _pack_bits(ints, nbits))
    elif packing in ("complex", "complex_diff"):
        if missing_mgmt:
            # under missing management ALL grid points are packed;
            # missing slots carry a placeholder flagged by the masks
            npoints = ni * nj
            ints_full = np.zeros(npoints, dtype="int64")
            ints_full[mask] = ints
            prim_mask = primary
            sec_mask = (
                secondary
                if secondary is not None
                else np.zeros(npoints, dtype=bool)
            )
        else:
            npoints = int(mask.sum())
            ints_full, prim_mask, sec_mask = ints, None, None
        tmpl5, body7 = _pack_complex(
            ints_full,
            ref,
            e_scale,
            d_scale,
            spatial_diff=(packing == "complex_diff"),
            order=int(f.get("diff_order", 2)),
            group_len=int(f.get("group_len", 20)),
            missing_mgmt=missing_mgmt,
            primary_mask=prim_mask,
            secondary_mask=sec_mask,
        )
        s5 = sec(5, struct.pack(">IH", npoints,
                                3 if packing == "complex_diff" else 2) + tmpl5)
        s7 = sec(7, body7)
    else:
        raise NotImplementedError(f"write_grib2 packing {packing!r}")
    if has_gaps:
        s6 = sec(6, bytes([0]) + np.packbits(mask).tobytes())
    else:
        s6 = sec(6, bytes([255]))

    return s3 + s4 + s5 + s6 + s7


def _pack_complex(
    ints: np.ndarray,
    ref: float,
    e_scale: int,
    d_scale: int,
    spatial_diff: bool,
    order: int = 2,
    group_len: int = 20,
    missing_mgmt: int = 0,
    primary_mask: np.ndarray | None = None,
    secondary_mask: np.ndarray | None = None,
) -> tuple[bytes, bytes]:
    """Template 5.2/5.3 encoder half of :func:`_unpack_complex` —
    returns (section-5 template octets 12+, section-7 body octets 6+).
    Groups are fixed-length (``group_len``, ragged tail via the
    true-length-of-last-group field); each group stores min + residual
    widths, the layout real complex-packed ERA5/NOAA files use.

    With ``missing_mgmt`` 1/2 the masked points are encoded in-stream:
    width-``w`` groups reserve the top one (primary) or two (primary +
    secondary) residual codes as sentinels — group widths widen so real
    residuals never collide — and all-missing groups collapse to width
    0 with the sentinel in the group reference. With spatial
    differencing the difference stream is built over the non-missing
    subsequence only, mirroring the decoder."""

    def smag(v: int, n: int) -> bytes:
        return (abs(v) | ((1 << (8 * n - 1)) if v < 0 else 0)).to_bytes(n, "big")

    v = np.asarray(ints, dtype="int64")
    npts = v.size
    if missing_mgmt:
        pm = (
            primary_mask
            if primary_mask is not None
            else np.zeros(npts, dtype=bool)
        )
        sm = (
            secondary_mask
            if secondary_mask is not None
            else np.zeros(npts, dtype=bool)
        )
        if missing_mgmt == 1 and sm.any():
            raise ValueError("secondary missing requires missing_mgmt=2")
        miss = pm | sm
    else:
        pm = sm = None
        miss = np.zeros(npts, dtype=bool)
    extras = b""
    od = 0
    if spatial_diff:
        if order not in (1, 2):
            raise ValueError("spatial differencing order must be 1 or 2")
        nm_idx = np.flatnonzero(~miss)
        nm = v[nm_idx]
        od = min(order, nm.size)
        ivals = [int(x) for x in nm[:od]]
        d = np.zeros(nm.size, dtype="int64")
        if nm.size > od:
            d[od:] = np.diff(nm, n=od)
        gmin = int(d[od:].min()) if nm.size > od else 0
        w = d.copy()
        w[od:] -= gmin
        w[:od] = 0  # overwritten from the descriptors on decode
        v = v.copy()
        v[nm_idx] = w
        ww = max(
            (max(abs(x) for x in ivals + [gmin]).bit_length() + 1 + 7) // 8, 1
        )
        extras = b"".join(smag(x, ww) for x in ivals + [gmin])

    reserved = 0 if not missing_mgmt else missing_mgmt
    ng = max(1, (npts + group_len - 1) // group_len)
    grefs: list[int | None] = []  # None = all-missing sentinel group
    widths, gvals, gmiss = [], [], []
    for g in range(ng):
        sl = slice(g * group_len, (g + 1) * group_len)
        grp = v[sl]
        gm = miss[sl]
        pres = ~gm
        if missing_mgmt and not pres.any():
            grefs.append(None)
            widths.append(0)
            gvals.append(np.zeros(grp.size, dtype="int64"))
            gmiss.append((pm[sl], sm[sl]))
            continue
        lo = int(grp[pres].min())
        resid = np.where(pres, grp - lo, 0)
        maxres = int(resid.max())
        wdt = maxres.bit_length()
        if missing_mgmt and (gm.any() or wdt > 0):
            # the decoder reserves the top `reserved` codes of EVERY
            # group as sentinels when management is on — widen until no
            # real residual collides (constant no-missing groups may
            # stay width 0: the reference path has its own headroom)
            while wdt == 0 or maxres > (1 << wdt) - 1 - reserved:
                wdt += 1
        grefs.append(lo)
        widths.append(wdt)
        gvals.append(resid)
        gmiss.append((pm[sl], sm[sl]) if missing_mgmt else None)
    last_len = npts - (ng - 1) * group_len
    real_refs = [r for r in grefs if r is not None]
    nbits = max((int(r).bit_length() for r in real_refs), default=0)
    if missing_mgmt:
        # reference sentinels (all-missing groups) need headroom: the
        # top `reserved` reference codes must not collide with real refs
        max_ref = max(real_refs, default=0)
        while nbits == 0 or max_ref > (1 << nbits) - 1 - reserved:
            nbits += 1
    grefs_coded = [
        (1 << nbits) - 1 if r is None else int(r) for r in grefs
    ]
    wref = min(widths)
    wbits = max(w - wref for w in widths).bit_length()
    lref, linc, lbits = group_len, 1, 0  # uniform groups, ragged tail

    # each of the three group streams is emitted byte-aligned, matching
    # the decoder's per-stream padding (_pack_bits emits whole bytes)
    body = bytearray(extras)
    body += _pack_bits(np.asarray(grefs_coded, dtype="int64"), nbits)
    body += _pack_bits(np.asarray([w - wref for w in widths], dtype="int64"), wbits)
    body += _pack_bits(np.zeros(ng, dtype="int64"), lbits)
    # values: one continuous bit-stream across groups (no per-group pad)
    bitbuf: list[np.ndarray] = []
    for wdt, resid, gmk in zip(widths, gvals, gmiss):
        if wdt == 0:
            continue
        vals = resid
        if missing_mgmt and gmk is not None:
            gpm, gsm = gmk
            vals = resid.copy()
            vals[gpm] = (1 << wdt) - 1
            if missing_mgmt == 2:
                vals[gsm] = (1 << wdt) - 2
        bitbuf.append(
            ((vals[:, None] >> np.arange(wdt - 1, -1, -1, dtype="int64")) & 1)
            .astype(np.uint8)
            .reshape(-1)
        )
    if bitbuf:
        body += np.packbits(np.concatenate(bitbuf)).tobytes()

    if missing_mgmt:
        # octets 24-31: primary/secondary substitutes as IEEE floats
        # (field type 0); the reader maps flagged points to NaN
        subs = struct.pack(">ff", 9999.0, 9998.0)
    else:
        subs = bytes(8)
    tmpl = (
        struct.pack(">f", ref)
        + smag(e_scale, 2)
        + smag(d_scale, 2)
        + bytes([nbits, 0])  # octets 20-21: bits/group-ref, field type
        + bytes([1, missing_mgmt])  # octets 22-23: general splitting, mvm
        + subs  # octets 24-31: missing substitutes
        + struct.pack(">I", ng)
        + bytes([wref, wbits])
        + struct.pack(">I", lref)
        + bytes([linc])
        + struct.pack(">I", last_len)
        + bytes([lbits])
    )
    if spatial_diff:
        tmpl += bytes([od, ww])
    return tmpl, bytes(body)
