"""Dependency-free NetCDF-3 "classic" (CDF-1) writer/reader.

The NetCDF classic file format is a small, fully public specification
(magic ``CDF\\x01``; big-endian; header = dim list, global attributes,
variable list with 32-bit data offsets; then fixed-size variable data,
each padded to 4 bytes). This module implements the fixed-size subset —
no unlimited/record dimension — in pure NumPy, which is exactly what the
atlas export needs (cells × levels float grids), so S9 works with NO
optional dependency. netCDF4, where installed, reads these files
natively (same on-disk format as ``format='NETCDF3_CLASSIC'``).

Scope: NC_BYTE/SHORT/INT/FLOAT/DOUBLE/CHAR variables over fixed dims,
name+value global attributes of those types. Enough for the reference's
atlas files (reference atlas.py:576-635 writes plain float grids).
"""

from __future__ import annotations

import struct

import numpy as np

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C

_TYPE_OF_DTYPE = {"i1": 1, "S1": 2, "i2": 3, "i4": 4, "f4": 5, "f8": 6}
_DTYPE_OF_TYPE = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_SIZE_OF_TYPE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _name_bytes(name: str) -> bytes:
    raw = name.encode("utf-8")
    return struct.pack(">i", len(raw)) + raw + b"\x00" * _pad4(len(raw))


def _nc_type(arr: np.ndarray) -> int:
    key = arr.dtype.str.lstrip("<>|=")
    if key not in _TYPE_OF_DTYPE:
        raise ValueError(f"unsupported dtype for NetCDF-3 classic: {arr.dtype}")
    return _TYPE_OF_DTYPE[key]


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
) -> None:
    """Write fixed-size variables. ``variables`` maps name → (dim names,
    array); every array shape must match its dims."""
    dim_ids = {name: i for i, name in enumerate(dims)}
    for name, (vdims, arr) in variables.items():
        shape = tuple(dims[d] for d in vdims)
        if tuple(arr.shape) != shape:
            raise ValueError(f"{name}: shape {arr.shape} != dims {shape}")

    # dim list
    body = struct.pack(">ii", NC_DIMENSION, len(dims))
    for name, length in dims.items():
        body += _name_bytes(name) + struct.pack(">i", length)
    # no global attributes
    body += struct.pack(">ii", 0, 0)

    # variable list: first compute per-var metadata sizes so data
    # offsets ("begin") can be laid out in one pass
    entries = []
    for name, (vdims, arr) in variables.items():
        typ = _nc_type(np.asarray(arr))
        nbytes = int(np.prod(arr.shape, dtype=np.int64)) * _SIZE_OF_TYPE[typ] if arr.ndim else _SIZE_OF_TYPE[typ]
        vsize = nbytes + _pad4(nbytes)
        meta = (
            _name_bytes(name)
            + struct.pack(">i", len(vdims))
            + b"".join(struct.pack(">i", dim_ids[d]) for d in vdims)
            + struct.pack(">ii", 0, 0)  # no var attributes
            + struct.pack(">i", typ)
            + struct.pack(">i", vsize)
        )
        entries.append((name, vdims, np.asarray(arr), typ, nbytes, vsize, meta))

    header_len = (
        4 + 4  # magic + numrecs
        + len(body)
        + struct.pack(">ii", NC_VARIABLE, len(entries)).__len__()
        + sum(len(m) + 4 for *_, m in entries)  # +4 for each 32-bit begin
    )
    var_list = struct.pack(">ii", NC_VARIABLE, len(entries))
    begin = header_len
    data_chunks = []
    for name, vdims, arr, typ, nbytes, vsize, meta in entries:
        var_list += meta + struct.pack(">I", begin)
        raw = arr.astype(_DTYPE_OF_TYPE[typ]).tobytes()
        data_chunks.append(raw + b"\x00" * _pad4(len(raw)))
        begin += vsize

    with open(path, "wb") as f:
        f.write(b"CDF\x01" + struct.pack(">i", 0))
        f.write(body)
        f.write(var_list)
        for chunk in data_chunks:
            f.write(chunk)


def read_netcdf3(path: str) -> tuple[dict[str, int], dict[str, np.ndarray]]:
    """Parse a fixed-size classic file back to (dims, {name: array})."""
    with open(path, "rb") as f:
        return read_netcdf3_bytes(f.read())


def read_netcdf3_bytes(buf: bytes) -> tuple[dict[str, int], dict[str, np.ndarray]]:
    """Byte-buffer variant — the shape executor-side parsers need (the
    binaryFile source hands (path, content) pairs, never local paths)."""
    if buf[:4] != b"CDF\x01":
        raise ValueError("not a NetCDF-3 classic (CDF-1) file")
    pos = 8  # magic + numrecs

    def read_i4() -> int:
        nonlocal pos
        (v,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return v

    def read_name() -> str:
        nonlocal pos
        n = read_i4()
        s = buf[pos : pos + n].decode("utf-8")
        pos += n + _pad4(n)
        return s

    tag, ndims = read_i4(), read_i4()
    dims: dict[str, int] = {}
    if tag == NC_DIMENSION:
        for _ in range(ndims):
            # order matters: assignments evaluate the RHS first, which
            # would consume the length field before the name
            dname = read_name()
            dims[dname] = read_i4()
    elif tag != 0:
        raise ValueError("malformed dimension list")
    # global attributes: skip (we never write them; tolerate absent)
    gtag, ngatt = read_i4(), read_i4()
    if gtag == NC_ATTRIBUTE:
        for _ in range(ngatt):
            read_name()
            typ = read_i4()
            n = read_i4()
            nbytes = n * _SIZE_OF_TYPE[typ]
            pos += nbytes + _pad4(nbytes)

    vtag, nvars = read_i4(), read_i4()
    out: dict[str, np.ndarray] = {}
    if vtag == NC_VARIABLE:
        dim_names = list(dims)
        for _ in range(nvars):
            name = read_name()
            nd = read_i4()
            shape = tuple(dims[dim_names[read_i4()]] for _ in range(nd))
            atag, natt = read_i4(), read_i4()
            if atag == NC_ATTRIBUTE:
                for _ in range(natt):
                    read_name()
                    typ = read_i4()
                    n = read_i4()
                    nbytes = n * _SIZE_OF_TYPE[typ]
                    pos += nbytes + _pad4(nbytes)
            typ = read_i4()
            read_i4()  # vsize
            begin = struct.unpack_from(">I", buf, pos)[0]
            pos += 4
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(
                buf, dtype=_DTYPE_OF_TYPE[typ], count=count, offset=begin
            ).reshape(shape)
            out[name] = arr.astype(arr.dtype.newbyteorder("="))
    return dims, out
