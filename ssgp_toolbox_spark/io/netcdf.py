"""Classic NetCDF (CDF-1 / CDF-2) reader + writer, pure numpy.

Implements the public classic file-format spec (the on-disk layout
documented in the NetCDF users guide: magic 'CDF\\x01'/'CDF\\x02',
big-endian header with dim/attr/var lists, 4-byte-aligned fixed data,
interleaved record data). No third-party IO library — the sandbox has
neither netCDF4 nor h5py.

Scope: the reference's swath ingest reads variables out of Sentinel-3
``*_in.nc`` members (S3_L2_LST.py:116-141: LST, confidence_in,
bayes_in, biome, latitude_in, longitude_in, elevation_in). Real ESA
granules are NetCDF-4/HDF5 — ``read_netcdf`` detects the HDF5 magic
and raises a documented NotImplementedError (container gate); every
layer above it (flag decode, flip, lat-band trim, geoloc warp,
Spark plumbing) is real and tested against classic-format fixtures
written by ``write_netcdf``.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_TYPES = {
    1: np.dtype(">i1"),   # NC_BYTE
    2: np.dtype("S1"),    # NC_CHAR
    3: np.dtype(">i2"),   # NC_SHORT
    4: np.dtype(">i4"),   # NC_INT
    5: np.dtype(">f4"),   # NC_FLOAT
    6: np.dtype(">f8"),   # NC_DOUBLE
}
_NC_OF_KIND = {"i1": 1, "S1": 2, "i2": 3, "i4": 4, "f4": 5, "f8": 6}

_ABSENT = (0, 0)
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 10, 11, 12

HDF5_MAGIC = b"\x89HDF"


class NetCDF4Unsupported(NotImplementedError):
    """Raised for NetCDF-4/HDF5 containers: the sandbox has no HDF5
    stack. The classic-format path exercises identical downstream
    semantics."""


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        ln = self.u32()
        s = self.buf[self.pos : self.pos + ln].decode()
        self.pos += ln + _pad4(ln)
        return s

    def values(self, nc_type: int, n: int):
        dt = _NC_TYPES[nc_type]
        nbytes = dt.itemsize * n
        raw = self.buf[self.pos : self.pos + nbytes]
        self.pos += nbytes + _pad4(nbytes)
        if nc_type == 2:
            return raw.decode(errors="replace")
        return np.frombuffer(raw, dtype=dt).copy()

    def att_list(self) -> dict:
        tag, n = self.u32(), self.u32()
        atts = {}
        for _ in range(n):
            nm = self.name()
            t = self.u32()
            cnt = self.u32()
            atts[nm] = self.values(t, cnt)
        return atts


def read_netcdf(buf: bytes):
    """Parse a classic NetCDF file. Returns
    (variables: dict[name -> np.ndarray], attrs: dict[name -> dict]).
    Record variables are returned with the record dimension
    materialized (numrecs rows)."""
    if buf[:4] == HDF5_MAGIC:
        raise NetCDF4Unsupported(
            "NetCDF-4 (HDF5) container: no HDF5 stack in this "
            "environment. Convert to classic format (nccopy -k classic) "
            "or supply raw arrays; all downstream ingest semantics are "
            "format-independent.")
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file")
    offsets_64 = buf[3] == 2  # CDF-2: 64-bit data offsets
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.u32()

    dims = []
    tag, ndims = r.u32(), r.u32()
    if tag not in (_NC_DIMENSION, 0):
        raise ValueError("bad dim_list tag")
    for _ in range(ndims):
        nm = r.name()
        dims.append((nm, r.u32()))

    r.att_list()  # global attributes (parsed, not returned per-var here)

    tag, nvars = r.u32(), r.u32()
    if tag not in (_NC_VARIABLE, 0):
        raise ValueError("bad var_list tag")
    out, attrs = {}, {}
    specs = []
    rec_vars = []
    for _ in range(nvars):
        nm = r.name()
        nd = r.u32()
        dimids = [r.u32() for _ in range(nd)]
        atts = r.att_list()
        nc_type = r.u32()
        vsize = r.u32()
        begin = r.u64() if offsets_64 else r.u32()
        shape = tuple(dims[d][1] for d in dimids)
        # record dim is the one with length 0 in the header
        is_rec = bool(dimids) and dims[dimids[0]][1] == 0
        specs.append((nm, nc_type, shape, begin, vsize, is_rec))
        attrs[nm] = atts
        if is_rec:
            rec_vars.append(nm)

    recsize = sum(
        _NC_TYPES[t].itemsize * int(np.prod(shape[1:], dtype=np.int64))
        + (_pad4(_NC_TYPES[t].itemsize * int(np.prod(shape[1:], dtype=np.int64)))
           if len(rec_vars) > 1 else 0)
        for nm, t, shape, b, v, ir in specs if ir)

    for nm, nc_type, shape, begin, vsize, is_rec in specs:
        dt = _NC_TYPES[nc_type]
        if not is_rec:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=n, offset=begin)
            out[nm] = arr.reshape(shape).copy() if shape else arr[0]
        else:
            per_rec = int(np.prod(shape[1:], dtype=np.int64))
            rows = []
            step = recsize if len(rec_vars) > 1 else \
                dt.itemsize * per_rec + _pad4(dt.itemsize * per_rec) * 0
            if len(rec_vars) == 1:
                step = dt.itemsize * per_rec
            for rec in range(numrecs):
                arr = np.frombuffer(buf, dtype=dt, count=per_rec,
                                    offset=begin + rec * step)
                rows.append(arr.reshape(shape[1:]))
            out[nm] = np.stack(rows) if rows else \
                np.empty((0,) + shape[1:], dtype=dt)
    return out, attrs


def write_netcdf(variables: dict[str, np.ndarray]) -> bytes:
    """Serialize named arrays as one classic CDF-1 file (fixed dims
    only — one anonymous dim per distinct axis length). Inverse of
    ``read_netcdf`` for every dtype in the classic model; used to
    build swath fixtures and as the general NetCDF sink."""
    dim_lens: list[int] = []
    var_dims: dict[str, list[int]] = {}
    for nm, arr in variables.items():
        ids = []
        for ln in arr.shape:
            # reuse a dim of the same length (classic files share dims)
            if ln in dim_lens:
                ids.append(dim_lens.index(ln))
            else:
                dim_lens.append(ln)
                ids.append(len(dim_lens) - 1)
        var_dims[nm] = ids

    def name(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * _pad4(len(b))

    def to_be(arr: np.ndarray):
        kind = arr.dtype.str.lstrip("<>=|")
        mapping = {"i1": ">i1", "u1": ">i1", "i2": ">i2", "i4": ">i4",
                   "i8": ">i4", "f4": ">f4", "f8": ">f8", "u2": ">i4"}
        if kind not in mapping:
            raise ValueError(f"dtype {arr.dtype} outside the classic model")
        tgt = mapping[kind]
        if kind != tgt.lstrip(">") and np.issubdtype(arr.dtype, np.integer) \
                and arr.size:
            # classic model has no 64-bit or unsigned ints: narrowing
            # must be an error, never a silent wrap
            info = np.iinfo(np.dtype(tgt.lstrip(">")))
            lo, hi = int(arr.min()), int(arr.max())
            if lo < info.min or hi > info.max:
                raise ValueError(
                    f"{arr.dtype} values [{lo}, {hi}] exceed the classic "
                    f"NetCDF {tgt.lstrip('>')} range [{info.min}, {info.max}]")
        be = np.ascontiguousarray(arr).astype(tgt)
        return be, _NC_OF_KIND[tgt.lstrip(">")]

    head = [b"CDF\x01", struct.pack(">I", 0)]
    head.append(struct.pack(">II", _NC_DIMENSION if dim_lens else 0,
                            len(dim_lens)))
    for i, ln in enumerate(dim_lens):
        head.append(name(f"dim{i}") + struct.pack(">I", ln))
    head.append(struct.pack(">II", *_ABSENT))  # no global atts

    payloads = {}
    for nm, arr in variables.items():
        be, nc_type = to_be(arr)
        raw = be.tobytes()
        payloads[nm] = (nc_type, raw + b"\x00" * _pad4(len(raw)), len(raw))

    def var_list(offsets: dict[str, int]) -> bytes:
        b = struct.pack(">II", _NC_VARIABLE, len(variables))
        for nm in variables:
            nc_type, padded, vsize = payloads[nm]
            b += name(nm) + struct.pack(">I", len(var_dims[nm]))
            for d in var_dims[nm]:
                b += struct.pack(">I", d)
            b += struct.pack(">II", *_ABSENT)  # no var atts
            b += struct.pack(">III", nc_type, vsize, offsets[nm])
        return b

    base = b"".join(head)
    hdr_len = len(base) + len(var_list({nm: 0 for nm in variables}))
    offsets, pos = {}, hdr_len
    for nm in variables:
        offsets[nm] = pos
        pos += len(payloads[nm][1])
    return base + var_list(offsets) + b"".join(
        payloads[nm][1] for nm in variables)
