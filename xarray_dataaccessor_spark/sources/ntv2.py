"""NTv2 grid-shift (.gsb) reader + fixture writer — pure Python.

NTv2 is the public binary format national mapping agencies publish
datum-correction grids in (Canada NTv2, Britain's OSTN-family
distributions, Germany's BeTA2007, Australia's national grids). The
reference reaches these through pyproj/PROJ's ``+nadgrids=`` handling
(``shared_functions.py:132-157`` hands any CRS to rioxarray); here the
format itself is parsed natively so grid-shift datum transforms run as
Spark column arithmetic + one broadcast join (``operators/crs.py::
NTv2Grid``) with no GDAL/PROJ dependency.

Format (public spec, "NTv2 Developer's Guide", Geodetic Survey of
Canada; also documented in PROJ's source tree):

- 11 overview header records, each 16 bytes: an 8-byte ASCII key
  (space-padded) + an 8-byte value (int32+pad, double, or 8-byte ASCII):
  ``NUM_OREC NUM_SREC NUM_FILE GS_TYPE VERSION SYSTEM_F SYSTEM_T
  MAJOR_F MINOR_F MAJOR_T MINOR_T``.
- Per subgrid: 11 header records (``SUB_NAME PARENT CREATED UPDATED
  S_LAT N_LAT E_LONG W_LONG LAT_INC LONG_INC GS_COUNT``) followed by
  ``GS_COUNT`` 16-byte node records of four float32s: latitude shift,
  longitude shift, latitude accuracy, longitude accuracy.
- Angular unit is ARC-SECONDS (GS_TYPE=SECONDS is the only published
  variant); **longitude is positive WEST** (the format's famous trap),
  so ``E_LONG <= W_LONG`` numerically.
- Node order: row-major, latitude rows from S_LAT northward; within a
  row, positive-west longitude from E_LONG increasing (i.e. westward).

The reader returns plain dict/numpy structures; endianness is detected
from NUM_OREC (always 11).
"""

from __future__ import annotations

import struct
from typing import Sequence

_OVERVIEW_KEYS = (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE", "VERSION",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T",
)
_INT_KEYS = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
_STR_KEYS = {
    "GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
    "SUB_NAME", "PARENT", "CREATED", "UPDATED",
}
_SUB_KEYS = (
    "SUB_NAME", "PARENT", "CREATED", "UPDATED", "S_LAT", "N_LAT",
    "E_LONG", "W_LONG", "LAT_INC", "LONG_INC", "GS_COUNT",
)


def _records(data: bytes, off: int, keys: Sequence[str], endian: str):
    out = {}
    for key in keys:
        name = data[off:off + 8].decode("ascii").strip()
        if name.upper() != key:
            raise ValueError(
                f"NTv2: expected header record {key!r} at offset {off}, "
                f"found {name!r}"
            )
        raw = data[off + 8:off + 16]
        if key in _INT_KEYS:
            out[key] = struct.unpack(endian + "i", raw[:4])[0]
        elif key in _STR_KEYS:
            out[key] = raw.decode("ascii").strip()
        else:
            out[key] = struct.unpack(endian + "d", raw)[0]
        off += 16
    return out, off


def read_ntv2(data: bytes) -> dict:
    """Parse a .gsb byte string -> ``{"overview": {...}, "subgrids":
    [{header fields..., "lat_shift": list, "lon_shift": list,
    "nrows": int, "ncols": int}, ...]}``. Shifts stay in the file's
    arc-seconds with the file's positive-west longitude convention —
    conversion happens at the transform layer, keeping the reader a
    faithful format decode."""
    if len(data) < 11 * 16:
        raise ValueError("NTv2: truncated overview header")
    if data[:8].decode("ascii", "replace").strip().upper() != "NUM_OREC":
        raise ValueError("NTv2: missing NUM_OREC magic")
    # endianness: NUM_OREC is always 11
    endian = "<" if struct.unpack("<i", data[8:12])[0] == 11 else ">"
    over, off = _records(data, 0, _OVERVIEW_KEYS, endian)
    if over["NUM_OREC"] != 11 or over["NUM_SREC"] != 11:
        raise ValueError("NTv2: unsupported header record counts")
    gs_type = over["GS_TYPE"].upper()
    if gs_type != "SECONDS":
        raise NotImplementedError(
            f"NTv2: GS_TYPE={gs_type!r} (only SECONDS is published)"
        )
    subgrids = []
    for _ in range(over["NUM_FILE"]):
        sub, off = _records(data, off, _SUB_KEYS, endian)
        n = sub["GS_COUNT"]
        ncols = int(round((sub["W_LONG"] - sub["E_LONG"]) / sub["LONG_INC"])) + 1
        nrows = int(round((sub["N_LAT"] - sub["S_LAT"]) / sub["LAT_INC"])) + 1
        if nrows * ncols != n:
            raise ValueError(
                f"NTv2: GS_COUNT {n} != nrows*ncols {nrows}*{ncols}"
            )
        vals = struct.unpack(endian + "f" * (4 * n), data[off:off + 16 * n])
        off += 16 * n
        sub["nrows"], sub["ncols"] = nrows, ncols
        sub["lat_shift"] = [float(vals[4 * i]) for i in range(n)]
        sub["lon_shift"] = [float(vals[4 * i + 1]) for i in range(n)]
        subgrids.append(sub)
    return {"overview": over, "subgrids": subgrids}


def write_ntv2(
    subgrids: Sequence[dict],
    system_f: str = "SRC",
    system_t: str = "WGS84",
) -> bytes:
    """Fixture twin of :func:`read_ntv2`: serialize subgrids (each a
    dict with S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC in arc-seconds
    positive-west and row-major ``lat_shift``/``lon_shift`` lists) into
    a spec-shaped little-endian .gsb byte string. Accuracy fields are
    written as zeros (the published grids' accuracy channel is
    informational)."""

    def rec(key: str, value) -> bytes:
        k = key.ljust(8).encode("ascii")
        if key in _INT_KEYS:
            return k + struct.pack("<i", int(value)) + b"\x00" * 4
        if key in _STR_KEYS:
            return k + str(value).ljust(8)[:8].encode("ascii")
        return k + struct.pack("<d", float(value))

    out = [
        rec("NUM_OREC", 11), rec("NUM_SREC", 11),
        rec("NUM_FILE", len(subgrids)), rec("GS_TYPE", "SECONDS"),
        rec("VERSION", "NTv2.0"), rec("SYSTEM_F", system_f),
        rec("SYSTEM_T", system_t), rec("MAJOR_F", 6378137.0),
        rec("MINOR_F", 6356752.314), rec("MAJOR_T", 6378137.0),
        rec("MINOR_T", 6356752.314),
    ]
    for i, sub in enumerate(subgrids):
        nrows = int(round((sub["N_LAT"] - sub["S_LAT"]) / sub["LAT_INC"])) + 1
        ncols = int(round((sub["W_LONG"] - sub["E_LONG"]) / sub["LONG_INC"])) + 1
        n = nrows * ncols
        if len(sub["lat_shift"]) != n or len(sub["lon_shift"]) != n:
            raise ValueError("write_ntv2: shift arrays must be nrows*ncols")
        out += [
            rec("SUB_NAME", sub.get("SUB_NAME", f"SUB{i:05d}")),
            rec("PARENT", sub.get("PARENT", "NONE")),
            rec("CREATED", sub.get("CREATED", "19700101")),
            rec("UPDATED", sub.get("UPDATED", "19700101")),
            rec("S_LAT", sub["S_LAT"]), rec("N_LAT", sub["N_LAT"]),
            rec("E_LONG", sub["E_LONG"]), rec("W_LONG", sub["W_LONG"]),
            rec("LAT_INC", sub["LAT_INC"]), rec("LONG_INC", sub["LONG_INC"]),
            rec("GS_COUNT", n),
        ]
        for j in range(n):
            out.append(struct.pack(
                "<4f", sub["lat_shift"][j], sub["lon_shift"][j], 0.0, 0.0
            ))
    return b"".join(out)
