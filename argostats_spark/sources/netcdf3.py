"""Dependency-free NetCDF-3 "classic" (CDF-1) and 64-bit-offset
(CDF-2) writer/reader.

The NetCDF classic file format is a small, fully public specification
(magic ``CDF\\x01``; big-endian; header = dim list, global attributes,
variable list with 32-bit data offsets; then fixed-size variable data,
each padded to 4 bytes). The 64-bit-offset variant (magic ``CDF\\x02``,
netCDF's ``NC_64BIT_OFFSET`` / ``format='NETCDF3_64BIT_OFFSET'``)
differs in exactly one field: each variable's ``begin`` data offset is
8 bytes instead of 4, lifting the 2 GiB file ceiling — large real-GDAC
aggregates ship in this variant, so the reader accepts both and the
writer auto-promotes when the layout needs it. The READER handles the
full classic data model including UNLIMITED/record variables (real
<WMO>_prof.nc files carry an UNLIMITED N_HISTORY) and the STREAMING
numrecs sentinel; the WRITER implements the fixed-size subset — no
record dimension — in pure NumPy, which is exactly what the atlas
export needs (cells × levels float grids), so S9 works with NO
optional dependency. netCDF4, where installed, reads these files
natively.

Out of scope: CDF-5 (``CDF\\x05``, 64-bit *sizes* + unsigned/64-bit
types). Its header widens several more fields and this container has
no independent implementation to validate byte layouts against; CDF-2
is the variant real Argo aggregates actually use.

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


def _attr_value_bytes(val) -> tuple[int, int, bytes]:
    """Attribute value → (nc_type, nelems, 4-byte-padded data). Strings
    become NC_CHAR; python ints/floats widen to NC_INT/NC_DOUBLE."""
    if isinstance(val, str):
        raw = val.encode("utf-8")
        return 2, len(raw), raw + b"\x00" * _pad4(len(raw))
    arr = np.atleast_1d(np.asarray(val))
    if arr.dtype.kind in "iu":
        # CDF-1 has no 64-bit attr type; astype would wrap silently
        if arr.size and (int(arr.min()) < -(2**31) or int(arr.max()) > 2**31 - 1):
            raise ValueError(
                f"attribute value {val!r} exceeds NetCDF-3 classic NC_INT range"
            )
        arr = arr.astype("i4")
    elif arr.dtype.kind == "f" and arr.dtype.itemsize > 8:
        arr = arr.astype("f8")
    typ = _nc_type(arr)
    raw = arr.astype(_DTYPE_OF_TYPE[typ]).tobytes()
    return typ, arr.size, raw + b"\x00" * _pad4(len(raw))


def _attr_list_bytes(attrs: dict | None) -> bytes:
    """Serialize an attribute dict as a CDF-1 att_list (absent form
    ``0 0`` when empty — what the spec calls ABSENT)."""
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", NC_ATTRIBUTE, len(attrs))
    for name, val in attrs.items():
        typ, n, data = _attr_value_bytes(val)
        out += _name_bytes(name) + struct.pack(">ii", typ, n) + data
    return out


def _nc_type(arr: np.ndarray) -> int:
    key = arr.dtype.str.lstrip("<>|=")
    if key not in _TYPE_OF_DTYPE:
        raise ValueError(f"unsupported dtype for NetCDF-3 classic: {arr.dtype}")
    return _TYPE_OF_DTYPE[key]


_CDF1_MAX_BEGIN = 2**31 - 1


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    global_attrs: dict | None = None,
    var_attrs: dict[str, dict] | None = None,
    version: int | None = None,
) -> None:
    """Write fixed-size variables. ``variables`` maps name → (dim names,
    array); every array shape must match its dims. ``global_attrs`` and
    ``var_attrs[name]`` (str / int / float / array values) land in the
    header attribute lists — the reference stamps units and provenance
    on its atlas files (reference atlas.py:576-607).

    ``version``: 1 (classic), 2 (64-bit offset), or None to pick
    automatically — classic while every variable's data offset fits the
    spec's 4-byte ``begin`` field, 64-bit offset beyond (a classic file
    physically cannot address data past 2 GiB; silently wrapping the
    offset would corrupt the file)."""
    var_attrs = var_attrs or {}
    if version not in (None, 1, 2):
        raise ValueError(f"version must be 1, 2 or None, got {version!r}")
    dim_ids = {name: i for i, name in enumerate(dims)}
    for name, (vdims, arr) in variables.items():
        shape = tuple(dims[d] for d in vdims)
        if tuple(arr.shape) != shape:
            raise ValueError(f"{name}: shape {arr.shape} != dims {shape}")

    # dim list
    body = struct.pack(">ii", NC_DIMENSION, len(dims))
    for name, length in dims.items():
        body += _name_bytes(name) + struct.pack(">i", length)
    body += _attr_list_bytes(global_attrs)

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
            + _attr_list_bytes(var_attrs.get(name))
            + struct.pack(">i", typ)
            # vsize is a 4-byte field even in CDF-2; the spec says to
            # clamp an overflowing size to 2^32-1 (readers recompute
            # from the dims — ours ignores the header copy entirely)
            + struct.pack(">I", min(vsize, 2**32 - 1))
        )
        entries.append((name, vdims, np.asarray(arr), typ, nbytes, vsize, meta))

    def layout(begin_width: int) -> list[int]:
        """Per-variable begin offsets for a given begin-field width."""
        header_len = (
            4 + 4  # magic + numrecs
            + len(body)
            + 8  # NC_VARIABLE tag + count
            + sum(len(m) + begin_width for *_, m in entries)
        )
        begins, begin = [], header_len
        for *_, vsize, _meta in entries:
            begins.append(begin)
            begin += vsize
        return begins

    if version is None:
        begins = layout(4)
        version = 1 if (not begins or max(begins) <= _CDF1_MAX_BEGIN) else 2
    if version == 1:
        begins = layout(4)
        if begins and max(begins) > _CDF1_MAX_BEGIN:
            raise ValueError(
                "data offsets exceed the CDF-1 4-byte begin field; write "
                "with version=2 (64-bit offset) or version=None (auto)"
            )
        begin_fmt, magic = ">I", b"CDF\x01"
    else:
        begins = layout(8)
        begin_fmt, magic = ">Q", b"CDF\x02"

    var_list = struct.pack(">ii", NC_VARIABLE, len(entries))
    data_chunks = []
    for (name, vdims, arr, typ, nbytes, vsize, meta), begin in zip(entries, begins):
        var_list += meta + struct.pack(begin_fmt, begin)
        raw = arr.astype(_DTYPE_OF_TYPE[typ]).tobytes()
        data_chunks.append(raw + b"\x00" * _pad4(len(raw)))

    with open(path, "wb") as f:
        f.write(magic + struct.pack(">i", 0))
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
    dims, out, _, _ = read_netcdf3_full(buf)
    return dims, out


def read_netcdf3_full(
    buf: bytes,
) -> tuple[dict[str, int], dict[str, np.ndarray], dict, dict[str, dict]]:
    """Full parse: (dims, variables, global_attrs, per-var attrs).
    Accepts classic (CDF-1) and 64-bit-offset (CDF-2) files — the only
    layout difference is the width of each variable's begin field.

    Record variables (first dimension UNLIMITED) are read per the spec:
    each record interleaves one record's worth of every record variable
    (each slab padded to 4 bytes — EXCEPT when the file has exactly one
    record variable, which the spec stores unpadded) and the returned
    array's leading axis is numrecs. The UNLIMITED dim reports its
    numrecs count in ``dims``. Real GDAC <WMO>_prof.nc files carry an
    UNLIMITED N_HISTORY with HISTORY_* record variables, so the codec
    must read such files fully, not just their fixed variables."""
    if len(buf) < 8 or buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF-3 classic/64-bit-offset (CDF-1/2) file")
    begin_fmt, begin_width = (">I", 4) if buf[3] == 1 else (">Q", 8)
    # unsigned read: 0xFFFFFFFF is the spec's STREAMING sentinel (file
    # not closed normally; record count indeterminate) — resolved below
    # from the buffer size once the record stride is known
    numrecs = struct.unpack_from(">I", buf, 4)[0]
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

    def read_attrs() -> dict:
        nonlocal pos
        atag, natt = read_i4(), read_i4()
        attrs: dict = {}
        if atag != NC_ATTRIBUTE:
            return attrs
        for _ in range(natt):
            aname = read_name()
            typ = read_i4()
            n = read_i4()
            nbytes = n * _SIZE_OF_TYPE[typ]
            raw = buf[pos : pos + nbytes]
            pos += nbytes + _pad4(nbytes)
            if typ == 2:  # NC_CHAR → str
                attrs[aname] = raw.decode("utf-8")
            else:
                arr = np.frombuffer(raw, dtype=_DTYPE_OF_TYPE[typ])
                arr = arr.astype(arr.dtype.newbyteorder("="))
                attrs[aname] = arr[0].item() if arr.size == 1 else arr
        return attrs

    tag, ndims = read_i4(), read_i4()
    dims: dict[str, int] = {}
    rec_dim = -1  # header length 0 marks the (single) UNLIMITED dim
    if tag == NC_DIMENSION:
        for i in range(ndims):
            # order matters: assignments evaluate the RHS first, which
            # would consume the length field before the name
            dname = read_name()
            dims[dname] = read_i4()
            if dims[dname] == 0:
                rec_dim = i
    elif tag != 0:
        raise ValueError("malformed dimension list")
    gattrs = read_attrs()

    vtag, nvars = read_i4(), read_i4()
    out: dict[str, np.ndarray] = {}
    vattrs: dict[str, dict] = {}
    if vtag == NC_VARIABLE:
        dim_names = list(dims)
        metas = []
        for _ in range(nvars):
            name = read_name()
            nd = read_i4()
            dimids = [read_i4() for _ in range(nd)]
            vattrs[name] = read_attrs()
            typ = read_i4()
            read_i4()  # vsize (recomputed below; the header copy may clamp)
            begin = struct.unpack_from(begin_fmt, buf, pos)[0]
            pos += begin_width
            metas.append((name, dimids, typ, begin))

        def _slab_bytes(dimids: list[int], typ: int) -> int:
            """Bytes of one record's slab (record vars) / whole payload
            (fixed vars), before padding."""
            rest = [dims[dim_names[d]] for d in dimids if d != rec_dim]
            n = int(np.prod(rest, dtype=np.int64)) if rest else 1
            return n * _SIZE_OF_TYPE[typ]

        # record stride: every record var's slab padded to 4 — except
        # the spec's special case of exactly one record var (unpadded)
        rec_metas = [m for m in metas if m[1] and m[1][0] == rec_dim]
        if len(rec_metas) == 1:
            recsize = _slab_bytes(rec_metas[0][1], rec_metas[0][2])
        else:
            recsize = sum(
                (lambda b: b + _pad4(b))(_slab_bytes(d, t))
                for _, d, t, _ in rec_metas
            )
        if numrecs == 0xFFFFFFFF:  # STREAMING: derive from the bytes
            if rec_metas and recsize > 0:
                rec_begin = min(m[3] for m in rec_metas)
                nrec = max((len(buf) - rec_begin) // recsize, 0)
            else:
                nrec = 0
        else:
            nrec = numrecs

        for name, dimids, typ, begin in metas:
            dt = _DTYPE_OF_TYPE[typ]
            if not (dimids and dimids[0] == rec_dim):
                shape = tuple(dims[dim_names[d]] for d in dimids)
                count = int(np.prod(shape, dtype=np.int64)) if shape else 1
                arr = np.frombuffer(buf, dtype=dt, count=count, offset=begin)
                arr = arr.reshape(shape)
            else:
                rest = tuple(dims[dim_names[d]] for d in dimids[1:])
                nbytes = _slab_bytes(dimids, typ)
                if nrec:
                    # the final record holds only this var's slab tail —
                    # reading nrec*recsize from begin would overrun the
                    # buffer for the last record variable, so view the
                    # slab bytes at each record stride. as_strided costs
                    # ZERO index memory (a fancy-index gather would
                    # allocate 8 index bytes per payload byte — an OOM
                    # risk on multi-GiB aggregates); the .copy()
                    # materializes just the payload
                    needed = (nrec - 1) * recsize + nbytes
                    flat = np.frombuffer(buf, dtype="u1", count=needed, offset=begin)
                    if nbytes == recsize:  # single-record-var: contiguous
                        raw = flat.reshape(nrec, nbytes)
                    else:
                        raw = np.lib.stride_tricks.as_strided(
                            flat, shape=(nrec, nbytes), strides=(recsize, 1)
                        ).copy()
                else:
                    raw = np.zeros((0, nbytes), "u1")
                arr = (
                    np.ascontiguousarray(raw).view(dt).reshape((nrec,) + rest)
                )
            out[name] = arr.astype(arr.dtype.newbyteorder("="))
        if rec_dim >= 0:
            dims[dim_names[rec_dim]] = nrec
    return dims, out, gattrs, vattrs
