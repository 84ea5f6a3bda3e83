"""Pure-Python NetCDF3 "classic" reader/writer (no external NetCDF
stack) — makes S1/S4 ingestion actually runnable in minimal containers:
real NetCDF bytes -> long-form rows -> ``land_grid_parquet``.

Implements the published classic file format (CDF-1 magic ``CDF\\x01``
and the 64-bit-offset CDF-2 ``CDF\\x02``; format spec is public Unidata
documentation): header with dim/attr/var lists, fixed-size variables at
absolute offsets, record variables interleaved per record (with the
single-record-variable no-padding special case). NetCDF4 files are HDF5
containers and route through the sibling pure HDF5 reader
(``sources/hdf5.py``) — :func:`netcdf_fragment_to_pandas` dispatches on
the magic bytes, so both generations decode through one ingestion path.

Reference parity: the reference opens granules with xarray/h5netcdf
(``era5_from_aws.py:349-376``, ``nasa_from_LPDAAC.py:480-489``) and its
offline fixture is exactly such a classic file
(``testing/test_data/cds_era5_dataset.nc``: 73x7x19, golden axes at
``test_2_era5.py:131-156``). The writer here exists to build equivalent
fixtures; the reader is the ingestion path.

Everything below is stdlib ``struct`` + numpy, deliberately free of
package-level imports so the parse function can be shipped to executors
by value (see ``sources/ingest.py::netcdf_glob_to_grid``).
"""

from __future__ import annotations

import struct

import numpy as np

# module-level so the name ships BY VALUE with this module's functions
# (a function-local import would run on executors whose sys.path lacks
# the package); ingest.netcdf_glob_to_grid registers both modules with
# cloudpickle.register_pickle_by_value
from xarray_dataaccessor_spark.sources.hdf5 import parse_hdf5 as _parse_hdf5

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_DTYPES = {
    NC_BYTE: np.dtype("i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


class _Reader:
    def __init__(self, buf: bytes, strict: bool = False):
        self.buf = buf
        self.pos = 0
        # strict=True raises TruncatedHeader instead of silently reading
        # a short slice — the header-only parser retries with more bytes
        self.strict = strict

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def u4(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        raw = self.buf[self.pos : self.pos + n]
        if self.strict and len(raw) < n:
            raise TruncatedHeader(self.pos + n)
        s = raw.decode("utf-8")
        self.pos += n + _pad4(n)
        return s

    def att_values(self, nc_type: int, n: int):
        dt = _DTYPES[nc_type]
        nbytes = dt.itemsize * n
        raw = self.buf[self.pos : self.pos + nbytes]
        if self.strict and len(raw) < nbytes:
            raise TruncatedHeader(self.pos + nbytes)
        self.pos += nbytes + _pad4(nbytes)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=dt).tolist()


class TruncatedHeader(Exception):
    """Header parse ran past the supplied bytes; retry with a larger
    prefix. ``needed`` is a lower bound on the prefix length."""

    def __init__(self, needed: int):
        self.needed = needed
        super().__init__(f"need at least {needed} header bytes")


def parse_netcdf3_header(buf: bytes, strict: bool = False) -> dict:
    """Parse ONLY the classic-CDF header (no data reads) into::

        {"offsets64": bool, "numrecs": int, "dims": [(name, size)],
         "attrs": {...}, "vars": [(name, dimids, atts, nc_type, vsize,
         begin)], "stride": int, "header_end": int}

    ``stride`` is the record-section stride in bytes (0 when the file
    has no record variables). With ``strict=True`` a short ``buf``
    raises :class:`TruncatedHeader` instead of mis-parsing, so callers
    holding only a file PREFIX (the data-source partition planner reads
    64 KiB, not the granule) can retry with a longer prefix — this is
    what makes partition planning O(header) instead of O(file) at
    100 TB archive scale."""
    if buf[:4] == b"\x89HDF":
        raise NotImplementedError(
            "This is a NetCDF4 (HDF5) file; parse_netcdf3 handles classic "
            "CDF only — use sources.hdf5.parse_hdf5 (or the dispatching "
            "netcdf_fragment_to_pandas, which routes on magic bytes)."
        )
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("Not a classic NetCDF file (bad magic)")
    offsets64 = buf[3] == 2
    r = _Reader(buf, strict=strict)
    r.pos = 4
    numrecs = r.i4()

    def tagged_count(expected_tag):
        tag = r.i4()
        n = r.i4()
        if tag == 0 and n == 0:
            return 0
        if tag != expected_tag:
            raise ValueError(f"Bad header tag {tag:#x}, expected {expected_tag:#x}")
        return n

    dims: list[tuple[str, int]] = []
    for _ in range(tagged_count(_NC_DIMENSION)):
        dname = r.name()
        dims.append((dname, r.i4()))

    def read_atts():
        out = {}
        for _ in range(tagged_count(_NC_ATTRIBUTE)):
            aname = r.name()
            atype = r.i4()
            n = r.i4()
            out[aname] = r.att_values(atype, n)
        return out

    global_atts = read_atts()

    variables = []
    for _ in range(tagged_count(_NC_VARIABLE)):
        vname = r.name()
        ndims = r.i4()
        dimids = [r.i4() for _ in range(ndims)]
        vatts = read_atts()
        nc_type = r.i4()
        # vsize is UNSIGNED per the CDF spec; 2^32-1 is the documented
        # overflow marker for record sets >= 4 GiB (a signed read would
        # produce a negative/garbage record stride and silently misread
        # every record variable)
        vsize = r.u4()
        if vsize == 0xFFFFFFFF:
            raise NotImplementedError(
                "Classic NetCDF file with vsize overflow marker (per-record "
                "set >= 4 GiB); the exact chunk sizes are not recoverable "
                "from the header — install the geo extras (netCDF4/h5netcdf)."
            )
        begin = r.i8() if offsets64 else r.i4()
        variables.append((vname, dimids, vatts, nc_type, vsize, begin))

    rec_vars = [v for v in variables if v[1] and dims[v[1][0]][1] == 0]
    if len(rec_vars) == 1:
        # single record variable: the spec drops the 4-byte alignment
        per = int(np.prod([dims[i][1] for i in rec_vars[0][1][1:]]) or 1)
        stride = per * _DTYPES[rec_vars[0][3]].itemsize
    else:
        stride = sum(rv[4] for rv in rec_vars)
    return {
        "offsets64": offsets64,
        "numrecs": numrecs,
        "dims": dims,
        "attrs": global_atts,
        "vars": variables,
        "stride": stride,
        "header_end": r.pos,
    }


def parse_netcdf3(buf: bytes) -> dict:
    """Parse classic NetCDF bytes into
    ``{dims, attrs, variables: {name: {dims, attrs, data}}}`` with
    native-endian numpy arrays. Raises on NetCDF4/HDF5 input."""
    hdr = parse_netcdf3_header(buf)
    offsets64, numrecs = hdr["offsets64"], hdr["numrecs"]
    dims, global_atts, variables = hdr["dims"], hdr["attrs"], hdr["vars"]
    rec_vars = [
        v for v in variables if v[1] and dims[v[1][0]][1] == 0
    ]
    single_rec = len(rec_vars) == 1

    out_vars = {}
    for vname, dimids, vatts, nc_type, vsize, begin in variables:
        dt = _DTYPES[nc_type]
        vdims = [dims[i][0] for i in dimids]
        shape = [dims[i][1] for i in dimids]
        is_record = bool(dimids) and dims[dimids[0]][1] == 0
        if not is_record:
            count = int(np.prod(shape)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=count, offset=begin)
            data = data.reshape(shape)
        else:
            per_rec_shape = shape[1:]
            per_rec_count = int(np.prod(per_rec_shape)) if per_rec_shape else 1
            per_rec_bytes = per_rec_count * dt.itemsize
            # record stride: sum of every record variable's padded
            # per-record size — except with exactly one record variable,
            # where the spec drops the alignment requirement
            if single_rec:
                stride = per_rec_bytes
            else:
                stride = sum(
                    rv[4] for rv in rec_vars
                )  # vsize is already the padded per-record chunk
            if numrecs and begin + (numrecs - 1) * stride + per_rec_bytes > len(buf):
                raise ValueError(
                    f"Record variable {vname!r} extends past the file end "
                    f"(begin={begin}, stride={stride}, numrecs={numrecs}) — "
                    "corrupt header or unsupported layout."
                )
            recs = []
            for rec in range(numrecs):
                off = begin + rec * stride
                recs.append(
                    np.frombuffer(buf, dtype=dt, count=per_rec_count, offset=off)
                )
            data = (
                np.stack(recs).reshape([numrecs] + per_rec_shape)
                if recs
                else np.empty([0] + per_rec_shape, dtype=dt)
            )
        if nc_type != NC_CHAR:
            data = data.astype(data.dtype.newbyteorder("="))
        out_vars[vname] = {"dims": vdims, "attrs": vatts, "data": data}

    dim_sizes = {
        name: (numrecs if size == 0 else size) for name, size in dims
    }
    return {"dims": dim_sizes, "attrs": global_atts, "variables": out_vars}


def decode_time_units(values: np.ndarray, units: str) -> np.ndarray:
    """CF-style ``'<unit> since <datetime>'`` -> datetime64[us] array.
    Supports seconds/minutes/hours/days (the ERA5/CDS set)."""
    import datetime as dt
    import re

    m = re.match(
        r"\s*(second|minute|hour|day)s?\s+since\s+"
        r"(\d{4})-(\d{1,2})-(\d{1,2})(?:[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2}))?)?",
        units,
    )
    if not m:
        raise ValueError(f"Unsupported time units: {units!r}")
    unit = m.group(1)
    base = dt.datetime(
        int(m.group(2)), int(m.group(3)), int(m.group(4)),
        int(m.group(5) or 0), int(m.group(6) or 0), int(m.group(7) or 0),
    )
    seconds = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
    base64 = np.datetime64(base, "us")
    return base64 + (np.asarray(values, dtype="int64") * seconds * 1_000_000).astype(
        "timedelta64[us]"
    )


_X_NAMES = ("longitude", "lon", "x")
_Y_NAMES = ("latitude", "lat", "y")


def netcdf_fragment_to_pandas(
    content: bytes,
    variable: str,
    time_var: str = "time",
    x_var: str | None = None,
    y_var: str | None = None,
):
    """One granule's bytes -> long-form pandas DataFrame
    ``(time, y, x, <variable>)`` — the reference's per-granule
    ``xr.open_dataset(...).to_dataframe()`` shape, from the pure reader.
    Coordinate variables are auto-detected (longitude/lon/x,
    latitude/lat/y); CF time units are decoded when present.

    Dispatches on magic bytes: classic CDF-1/CDF-2 decodes here,
    NetCDF4 (HDF5 container) through :mod:`.hdf5` — the same dual
    opener the reference gets from xarray's engine auto-detection."""
    import pandas as pd

    if content[:8] == b"\x89HDF\r\n\x1a\n":
        parsed = _parse_hdf5(content)
    else:
        parsed = parse_netcdf3(content)
    variables = parsed["variables"]
    if variable not in variables:
        raise KeyError(
            f"Variable {variable!r} not in granule (has {sorted(variables)})"
        )

    def pick(cands):
        for c in cands:
            if c in variables:
                return c
        return None

    x_var = x_var or pick(_X_NAMES)
    y_var = y_var or pick(_Y_NAMES)
    if x_var is None or y_var is None:
        raise ValueError("Could not detect x/y coordinate variables")

    tv = variables.get(time_var)
    times = None
    if tv is not None:
        units = tv["attrs"].get("units")
        if isinstance(units, str) and "since" in units:
            times = decode_time_units(tv["data"], units)
        else:
            times = np.asarray(tv["data"])

    data_var = variables[variable]
    vdims = list(data_var["dims"])
    arr = np.asarray(data_var["data"], dtype="float64")
    xs = np.asarray(variables[x_var]["data"], dtype="float64")
    ys = np.asarray(variables[y_var]["data"], dtype="float64")
    x_dim = variables[x_var]["dims"][0] if variables[x_var]["dims"] else x_var
    y_dim = variables[y_var]["dims"][0] if variables[y_var]["dims"] else y_var
    # squeeze size-1 extras (e.g. a level dim), then order as (t, y, x)
    for d in list(vdims):
        if d not in (time_var, x_dim, y_dim) and arr.shape[vdims.index(d)] == 1:
            arr = np.squeeze(arr, axis=vdims.index(d))
            vdims.remove(d)
    has_time = time_var in vdims and times is not None
    order = ([time_var] if has_time else []) + [y_dim, x_dim]
    arr = np.transpose(arr, [vdims.index(d) for d in order])
    if not has_time:
        arr = arr[np.newaxis, ...]
        times = np.asarray([np.datetime64("1970-01-01", "us")])
    nt, ny, nx = arr.shape
    tt = np.repeat(times[:nt], ny * nx)
    yy = np.tile(np.repeat(ys, nx), nt)
    xx = np.tile(xs, nt * ny)
    return pd.DataFrame(
        {"time": tt, "y": yy, "x": xx, variable: arr.reshape(-1)}
    )


# ---------------------------------------------------------------------------
# Writer (fixture/export support): fixed-size dims, CDF-1.
# ---------------------------------------------------------------------------


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[list[str], np.ndarray, dict]],
    global_attrs: dict | None = None,
    record_dim: str | None = None,
) -> str:
    """Minimal classic CDF-1 writer (byte/short/int/float/double + char
    attributes) — enough to build reference-shaped fixtures (73x7x19
    ERA5 grids) and to export small grids.

    ``record_dim`` names an UNLIMITED dimension: variables whose first
    dim is it are laid out interleaved per record (the spec's record
    section, with the single-record-variable no-padding exception),
    and the header stores dim size 0 + numrecs — the layout the
    data-source record-range partitioner exercises."""
    dim_names = list(dims)
    dim_ids = {n: i for i, n in enumerate(dim_names)}
    if record_dim is not None and record_dim not in dim_ids:
        raise ValueError(f"record_dim {record_dim!r} not in dims")
    typemap = {
        np.dtype("f8"): NC_DOUBLE,
        np.dtype("f4"): NC_FLOAT,
        np.dtype("i8"): NC_INT,  # classic format has no 64-bit int
        np.dtype("i4"): NC_INT,
        np.dtype("i2"): NC_SHORT,
        np.dtype("i1"): NC_BYTE,
    }

    def name_bytes(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))

    def atts_bytes(atts: dict) -> bytes:
        if not atts:
            return struct.pack(">ii", 0, 0)
        out = struct.pack(">ii", _NC_ATTRIBUTE, len(atts))
        for k, v in atts.items():
            out += name_bytes(k)
            if isinstance(v, str):
                b = v.encode("utf-8")
                out += struct.pack(">ii", NC_CHAR, len(b)) + b
                out += b"\x00" * _pad4(len(b))
            else:
                arr = np.asarray(v)
                if arr.dtype.kind == "f":
                    out += struct.pack(">ii", NC_DOUBLE, arr.size)
                    out += arr.astype(">f8").tobytes()
                else:
                    out += struct.pack(">ii", NC_INT, arr.size)
                    out += arr.astype(">i4").tobytes()
        return out

    # two passes: sizes first, then offsets. Entry tuple:
    # (name, vdims, vatts, nc_type, raw, vsize, is_record, per_rec_bytes)
    rec_names = [
        v for v, (vdims, _d, _a) in variables.items()
        if record_dim is not None and vdims and vdims[0] == record_dim
    ]
    single_rec = len(rec_names) == 1
    numrecs = 0
    var_entries = []
    for vname, (vdims, data, vatts) in variables.items():
        data = np.asarray(data)
        nc_type = typemap[np.dtype(data.dtype.str.lstrip("<>="))]
        raw = data.astype(_DTYPES[nc_type]).tobytes()
        if vname in rec_names:
            nrec = int(data.shape[0])
            numrecs = max(numrecs, nrec)
            per = len(raw) // nrec if nrec else 0
            # spec: vsize is the PADDED per-record chunk; with exactly
            # one record variable the alignment (and padding) is waived
            vsize = per if single_rec else per + _pad4(per)
            var_entries.append((vname, vdims, vatts, nc_type, raw, vsize, True, per))
        else:
            vsize = len(raw) + _pad4(len(raw))
            var_entries.append(
                (vname, vdims, vatts, nc_type, raw, vsize, False, 0)
            )

    header = b"CDF\x01" + struct.pack(">i", numrecs)
    header += struct.pack(">ii", _NC_DIMENSION, len(dim_names))
    for n in dim_names:
        size = 0 if n == record_dim else dims[n]
        header += name_bytes(n) + struct.pack(">i", size)
    header += atts_bytes(global_attrs or {})

    def var_header(begin_by_name):
        out = struct.pack(">ii", _NC_VARIABLE, len(var_entries))
        for vname, vdims, vatts, nc_type, _raw, vsize, _rec, _per in var_entries:
            out += name_bytes(vname)
            out += struct.pack(">i", len(vdims))
            for d in vdims:
                out += struct.pack(">i", dim_ids[d])
            out += atts_bytes(vatts or {})
            out += struct.pack(">iii", nc_type, vsize, begin_by_name[vname])
        return out

    # measure header with dummy offsets, then assign real ones:
    # fixed variables first, then the interleaved record section
    dummy = {v[0]: 0 for v in var_entries}
    header_len = len(header) + len(var_header(dummy))
    begins, off = {}, header_len
    for vname, _vdims, _vatts, _t, _raw, vsize, is_rec, _per in var_entries:
        if not is_rec:
            begins[vname] = off
            off += vsize
    rec_start = off
    for vname, _vdims, _vatts, _t, _raw, vsize, is_rec, _per in var_entries:
        if is_rec:
            begins[vname] = off
            off += vsize  # offset of this var's chunk within one record

    # bytearray, not bytes +=: the record loop appends one chunk per
    # (record, variable) and immutable-bytes concatenation is O(n^2) —
    # a 200 MB granule took minutes instead of seconds
    body = bytearray()
    for vname, _vdims, _vatts, _t, raw, vsize, is_rec, _per in var_entries:
        if not is_rec:
            body += raw + b"\x00" * (vsize - len(raw))
    assert len(body) + header_len == rec_start
    rec_entries_w = [e for e in var_entries if e[6]]
    for rec in range(numrecs):
        for vname, _vdims, _vatts, _t, raw, vsize, is_rec, per in rec_entries_w:
            chunk = raw[rec * per : (rec + 1) * per]
            body += chunk
            if vsize != per:
                body += b"\x00" * (vsize - per)

    with open(path, "wb") as f:
        f.write(header + var_header(begins) + bytes(body))
    return path
