"""Pure-Python Zarr v2 reader/writer (no zarr/numcodecs package) — a
cloud-native companion to the NetCDF3/GeoTIFF granule readers: ERA5 and
friends are publicly redistributed as Zarr stores, and the format's
chunk-per-file layout maps one-to-one onto Spark tasks (a 100 TB store
is just a manifest of independently-decodable chunk objects — no
byte-range protocol, no footer, no global lock).

Implements the published Zarr v2 spec: ``.zarray`` JSON metadata
(shape/chunks/dtype/order/fill_value), ``.zattrs`` (with xarray's
``_ARRAY_DIMENSIONS`` convention for dimension names), C-order chunk
files named ``i.j.k`` compressed with zlib/gzip or raw. Blosc-compressed
stores are detected and rejected with a pointer at the optional zarr
extras. Like the sibling readers, everything here is stdlib
(``json``/``zlib``) + numpy with no package-level imports, so the chunk
decoder ships to executors by value.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

# module-level so the cloudpickle by-value registration in
# ingest.zarr_to_grid ships the blosc codec with decode_chunk (a lazy
# in-function import would resolve on the executor, where the package
# need not be importable)
from xarray_dataaccessor_spark.sources import blosc as _blosc


def read_zarray(store: str, var: str) -> dict:
    """Parse ``<store>/<var>/.zarray`` (+ ``.zattrs`` when present) into
    the chunk-grid description."""
    with open(os.path.join(store, var, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise NotImplementedError("Only Zarr v2 stores are supported")
    comp = meta.get("compressor")
    comp_id = (comp or {}).get("id")
    if comp_id == "blosc":
        cname = (comp or {}).get("cname", "blosclz")
        if cname not in ("lz4", "zlib"):
            raise NotImplementedError(
                f"Blosc inner compressor {cname!r} unsupported (lz4/zlib "
                "decode pure-Python here); install the optional zarr extras."
            )
        comp_id = f"blosc:{cname}"
    elif comp_id not in (None, "zlib", "gzip"):
        raise NotImplementedError(
            f"Zarr compressor {comp_id!r} unsupported (zlib/gzip/raw/"
            "blosc-lz4/blosc-zlib); install the optional zarr extras."
        )
    if meta.get("order", "C") != "C":
        raise NotImplementedError("Fortran-order Zarr chunks unsupported")
    attrs = {}
    zattrs = os.path.join(store, var, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            attrs = json.load(f)
    return {
        "shape": [int(s) for s in meta["shape"]],
        "chunks": [int(c) for c in meta["chunks"]],
        "dtype": np.dtype(meta["dtype"]),
        "compressor": comp_id,
        "fill_value": meta.get("fill_value"),
        "dims": attrs.get("_ARRAY_DIMENSIONS"),
        "attrs": attrs,
    }


def decode_chunk(raw: bytes, meta: dict) -> np.ndarray:
    """One chunk file -> full-size C-order block (edge chunks are stored
    padded; the caller trims to the array bounds)."""
    comp = meta["compressor"]
    if comp is not None and comp.startswith("blosc"):
        raw = _blosc.decode_blosc(raw)
    elif comp in ("zlib", "gzip"):
        raw = zlib.decompress(raw, zlib.MAX_WBITS | 32)  # accepts both wrappers
    block = np.frombuffer(raw, dtype=meta["dtype"], count=int(np.prod(meta["chunks"])))
    block = block.reshape(meta["chunks"])
    return block.astype(block.dtype.newbyteorder("="))


def read_small_array(store: str, var: str) -> np.ndarray:
    """Driver-side read of a coordinate variable (dimension-sized by
    definition — time/y/x axes, never the data cube)."""
    meta = read_zarray(store, var)
    if len(meta["shape"]) != 1:
        raise ValueError(f"{var} is not a 1-D coordinate array")
    n, c = meta["shape"][0], meta["chunks"][0]
    out = np.empty(n, dtype=meta["dtype"].newbyteorder("="))
    for ci in range((n + c - 1) // c):
        with open(os.path.join(store, var, str(ci)), "rb") as f:
            block = decode_chunk(f.read(), meta)
        lo = ci * c
        out[lo : min(lo + c, n)] = block[: min(c, n - lo)]
    return out


def zarr_time_axis(store: str, var: str) -> np.ndarray:
    """Coordinate variable + CF ``units`` decoding (shares the NetCDF3
    reader's parser for '<unit> since <datetime>')."""
    from xarray_dataaccessor_spark.sources.netcdf3 import decode_time_units

    meta = read_zarray(store, var)
    vals = read_small_array(store, var)
    units = meta["attrs"].get("units")
    if isinstance(units, str) and "since" in units:
        return decode_time_units(vals, units)
    return vals


def write_zarr(
    store: str,
    var: str,
    data: np.ndarray,
    dims: list[str],
    chunks: list[int] | None = None,
    attrs: dict | None = None,
    compress: bool = True,
    compressor: str | None = None,
) -> str:
    """Minimal Zarr v2 writer (C order; zlib, raw, or Blosc1 with an
    lz4/zlib inner codec) for fixtures and small-grid export; pads edge
    chunks per spec. ``compressor`` overrides the legacy ``compress``
    flag: one of 'zlib', 'blosc-lz4', 'blosc-zlib', None."""
    os.makedirs(os.path.join(store, var), exist_ok=True)
    if not os.path.exists(os.path.join(store, ".zgroup")):
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
    chunks = chunks or list(data.shape)
    if compressor is None and compress:
        compressor = "zlib"
    if compressor is None:
        comp_meta = None
    elif compressor == "zlib":
        comp_meta = {"id": "zlib", "level": 6}
    elif compressor in ("blosc-lz4", "blosc-zlib"):
        comp_meta = {
            "id": "blosc",
            "cname": compressor.split("-")[1],
            "clevel": 5,
            "shuffle": 1,
            "blocksize": 0,
        }
    else:
        raise ValueError(f"Unsupported writer compressor {compressor!r}")
    meta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        "chunks": list(chunks),
        "dtype": data.dtype.str,
        "order": "C",
        "filters": None,
        "fill_value": None,
        "compressor": comp_meta,
    }
    with open(os.path.join(store, var, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(store, var, ".zattrs"), "w") as f:
        json.dump({"_ARRAY_DIMENSIONS": dims, **(attrs or {})}, f)
    grid = [
        (dim_size + ch - 1) // ch for dim_size, ch in zip(data.shape, chunks)
    ]
    for idx in np.ndindex(*grid):
        padded = np.zeros(chunks, dtype=data.dtype)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, data.shape)
        )
        piece = data[sel]
        padded[tuple(slice(0, p) for p in piece.shape)] = piece
        raw = padded.tobytes()
        if compressor == "zlib":
            raw = zlib.compress(raw, 6)
        elif compressor in ("blosc-lz4", "blosc-zlib"):
            from xarray_dataaccessor_spark.sources.blosc import encode_blosc

            raw = encode_blosc(
                raw, typesize=data.dtype.itemsize,
                cname=compressor.split("-")[1], shuffle=True,
            )
        with open(os.path.join(store, var, ".".join(map(str, idx))), "wb") as f:
            f.write(raw)
    return store
