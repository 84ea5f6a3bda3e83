"""Pure-Python Zarr v2 reader/writer (no zarr/numcodecs package) — a
cloud-native companion to the NetCDF3/GeoTIFF granule readers: ERA5 and
friends are publicly redistributed as Zarr stores, and the format's
chunk-per-file layout maps one-to-one onto Spark tasks (a 100 TB store
is just a manifest of independently-decodable chunk objects — no
byte-range protocol, no footer, no global lock).

Implements the published Zarr v2 spec — ``.zarray`` JSON metadata
(shape/chunks/dtype/order/fill_value), ``.zattrs`` (with xarray's
``_ARRAY_DIMENSIONS`` convention for dimension names), C-order chunk
files named ``i.j.k`` compressed with zlib/gzip, blosc-lz4/zlib, or raw —
AND the published Zarr v3 spec: per-node ``zarr.json`` metadata
(``data_type`` + ``chunk_grid`` + ``codecs`` + ``dimension_names``),
the ``bytes`` endian codec, gzip/blosc compressor codecs, and both
chunk-key encodings (``default`` nested ``c/i/j/k`` and ``v2`` dotted).
Sharding/zstd/transpose codecs are detected and rejected. v3 metadata is
normalized into the same meta dict at parse time, so every downstream
consumer (chunk decode, distributed ingest) is version-blind. Like the
sibling readers, everything here is stdlib (``json``/``zlib``) + numpy
with no package-level imports, so the chunk decoder ships to executors
by value.
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


_V3_DTYPES = {
    "float16": "f2", "float32": "f4", "float64": "f8",
    "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "bool": "b1",
}


def _read_zarr_v3(store: str, var: str) -> dict:
    """Parse a Zarr v3 array node (``<var>/zarr.json``) into the same
    normalized meta dict the v2 path produces."""
    with open(os.path.join(store, var, "zarr.json")) as f:
        meta = json.load(f)
    if meta.get("node_type") != "array":
        raise ValueError(f"{var}/zarr.json is not an array node")
    grid = meta.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise NotImplementedError(f"Zarr v3 chunk grid {grid.get('name')!r}")
    chunks = grid["configuration"]["chunk_shape"]
    endian = "<"
    comp_id = None
    for codec in meta.get("codecs", [{"name": "bytes"}]):
        cname = codec.get("name")
        conf = codec.get("configuration") or {}
        if cname == "bytes":
            endian = "<" if conf.get("endian", "little") == "little" else ">"
        elif cname == "gzip":
            comp_id = "zlib"  # gzip wrapper; decoder accepts both
        elif cname == "blosc":
            inner = conf.get("cname", "blosclz")
            if inner not in ("lz4", "zlib"):
                raise NotImplementedError(
                    f"Blosc inner compressor {inner!r} unsupported"
                )
            comp_id = f"blosc:{inner}"
        else:
            raise NotImplementedError(
                f"Zarr v3 codec {cname!r} unsupported (bytes/gzip/blosc); "
                "install the optional zarr extras."
            )
    dt = meta["data_type"]
    if dt not in _V3_DTYPES:
        raise NotImplementedError(f"Zarr v3 data type {dt!r} unsupported")
    key = meta.get("chunk_key_encoding", {"name": "default"})
    sep = (key.get("configuration") or {}).get(
        "separator", "/" if key.get("name") == "default" else "."
    )
    attrs = meta.get("attributes", {})
    return {
        "shape": [int(x) for x in meta["shape"]],
        "chunks": [int(c) for c in chunks],
        "dtype": np.dtype(endian + _V3_DTYPES[dt]),
        "compressor": comp_id,
        "fill_value": meta.get("fill_value"),
        "dims": meta.get("dimension_names") or attrs.get("_ARRAY_DIMENSIONS"),
        "attrs": attrs,
        "key_encoding": (key.get("name", "default"), sep),
    }


def chunk_relpath(meta: dict, idx: tuple[int, ...]) -> str:
    """Chunk key for ``idx`` under the array directory: v2 dotted
    (``i.j.k``), v3 default (``c/i/j/k``), or v3 v2-style."""
    name, sep = meta.get("key_encoding", ("v2", "."))
    parts = [str(i) for i in idx]
    if name == "default":
        return "/".join(["c"] + parts) if sep == "/" else "c" + sep + sep.join(parts)
    return sep.join(parts) if parts else "0"


def read_zarray(store: str, var: str) -> dict:
    """Parse ``<store>/<var>/.zarray`` (+ ``.zattrs`` when present) — or
    the v3 ``<var>/zarr.json`` — into the chunk-grid description."""
    zpath = os.path.join(store, var, ".zarray")
    if not os.path.exists(zpath) and os.path.exists(
        os.path.join(store, var, "zarr.json")
    ):
        return _read_zarr_v3(store, var)
    with open(zpath) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise NotImplementedError("Only Zarr v2/v3 stores are supported")
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
        "key_encoding": ("v2", "."),
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
        with open(os.path.join(store, var, chunk_relpath(meta, (ci,))), "rb") as f:
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
    zarr_format: int = 2,
) -> str:
    """Minimal Zarr v2/v3 writer (C order; zlib/gzip, raw, or Blosc1
    with an lz4/zlib inner codec) for fixtures and small-grid export;
    pads edge chunks per spec. ``compressor`` overrides the legacy
    ``compress`` flag: one of 'zlib', 'blosc-lz4', 'blosc-zlib', None.
    ``zarr_format=3`` writes per-node ``zarr.json`` metadata, the
    bytes+gzip codec chain, ``dimension_names``, and default nested
    ``c/i/j/k`` chunk keys."""
    os.makedirs(os.path.join(store, var), exist_ok=True)
    chunks = chunks or list(data.shape)
    if zarr_format == 3:
        return _write_zarr_v3(store, var, data, dims, chunks, attrs, compressor or ("zlib" if compress else None))
    if not os.path.exists(os.path.join(store, ".zgroup")):
        with open(os.path.join(store, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
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


def _write_zarr_v3(store, var, data, dims, chunks, attrs, compressor) -> str:
    """Zarr v3 array node: zarr.json metadata + nested c/ chunk keys."""
    if not os.path.exists(os.path.join(store, "zarr.json")):
        with open(os.path.join(store, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group"}, f)
    kind_names = {v: k for k, v in _V3_DTYPES.items()}
    code = data.dtype.str[1:]
    if code not in kind_names:
        raise ValueError(f"dtype {data.dtype} not writable as Zarr v3")
    endian = "big" if data.dtype.str[0] == ">" else "little"
    codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compressor == "zlib":
        codecs.append({"name": "gzip", "configuration": {"level": 6}})
    elif compressor in ("blosc-lz4", "blosc-zlib"):
        codecs.append({
            "name": "blosc",
            "configuration": {
                "cname": compressor.split("-")[1], "clevel": 5,
                "shuffle": "shuffle", "typesize": data.dtype.itemsize,
                "blocksize": 0,
            },
        })
    elif compressor is not None:
        raise ValueError(f"Unsupported v3 writer compressor {compressor!r}")
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(data.shape),
        "data_type": kind_names[code],
        "chunk_grid": {
            "name": "regular", "configuration": {"chunk_shape": list(chunks)}
        },
        "chunk_key_encoding": {
            "name": "default", "configuration": {"separator": "/"}
        },
        "fill_value": 0,
        "codecs": codecs,
        "dimension_names": dims,
        "attributes": dict(attrs or {}),
    }
    with open(os.path.join(store, var, "zarr.json"), "w") as f:
        json.dump(meta, f)
    import gzip as _gzip

    grid = [(s_ + c - 1) // c for s_, c in zip(data.shape, chunks)]
    for idx in np.ndindex(*grid):
        padded = np.zeros(chunks, dtype=data.dtype)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s_))
            for i, c, s_ in zip(idx, chunks, data.shape)
        )
        piece = data[sel]
        padded[tuple(slice(0, p) for p in piece.shape)] = piece
        raw = padded.tobytes()
        if compressor == "zlib":
            raw = _gzip.compress(raw, 6)
        elif compressor in ("blosc-lz4", "blosc-zlib"):
            from xarray_dataaccessor_spark.sources.blosc import encode_blosc

            raw = encode_blosc(
                raw, typesize=data.dtype.itemsize,
                cname=compressor.split("-")[1], shuffle=True,
            )
        key = os.path.join(store, var, *chunk_relpath(
            {"key_encoding": ("default", "/")}, idx
        ).split("/"))
        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "wb") as f:
            f.write(raw)
    return store
