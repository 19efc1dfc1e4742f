"""Record-variable coverage for the classic NetCDF reader + the
writer's narrowing guard (ADVICE r2).

write_netcdf emits fixed dims only, so the record-data layout
(interleaved per-record slots, 4-byte padded when >1 record variable,
unpadded steps when exactly 1 — NetCDF users guide, classic format
spec) is exercised with hand-built fixture bytes."""

import struct

import numpy as np
import pytest

from ssgp_toolbox_spark.io import netcdf

_ABSENT = struct.pack(">II", 0, 0)


def _name(s: str) -> bytes:
    b = s.encode()
    pad = (4 - len(b) % 4) % 4
    return struct.pack(">I", len(b)) + b + b"\x00" * pad


def _var(nm: str, dimids, nc_type: int, vsize: int, begin: int) -> bytes:
    return (_name(nm) + struct.pack(">I", len(dimids))
            + b"".join(struct.pack(">I", d) for d in dimids)
            + _ABSENT + struct.pack(">III", nc_type, vsize, begin))


def _header(numrecs: int, dims, var_blobs: bytes, nvars: int) -> bytes:
    out = [b"CDF\x01", struct.pack(">I", numrecs),
           struct.pack(">II", 10, len(dims))]
    for nm, ln in dims:
        out.append(_name(nm) + struct.pack(">I", ln))
    out.append(_ABSENT)  # global atts
    out.append(struct.pack(">II", 11, nvars))
    out.append(var_blobs)
    return b"".join(out)


def test_two_record_vars_interleaved_padded():
    # a: (rec, 3) NC_SHORT -> 6-byte slot padded to 8; b: (rec,) NC_DOUBLE
    a = np.array([[1, -2, 3], [4, 5, -6]], dtype=">i2")
    b = np.array([1.5, -2.5], dtype=">f8")
    dims = [("rec", 0), ("x", 3)]
    # compute header length with placeholder begins, then rebuild
    blobs = _var("a", [0, 1], 3, 8, 0) + _var("b", [0], 6, 8, 0)
    hlen = len(_header(2, dims, blobs, 2))
    begin_a, begin_b = hlen, hlen + 8
    blobs = _var("a", [0, 1], 3, 8, begin_a) + _var("b", [0], 6, 8, begin_b)
    recs = b"".join(
        a[i].tobytes() + b"\x00\x00" + b[i : i + 1].tobytes() for i in range(2))
    buf = _header(2, dims, blobs, 2) + recs

    out, _ = netcdf.read_netcdf(buf)
    np.testing.assert_array_equal(out["a"], a.astype("i2"))
    np.testing.assert_array_equal(out["b"], b.astype("f8"))


def test_single_record_var_unpadded_steps():
    # exactly one record variable: records are NOT padded (spec
    # exception) — 3 records of (rec, 3) NC_SHORT, 6-byte stride
    a = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=">i2")
    dims = [("rec", 0), ("x", 3)]
    blobs = _var("a", [0, 1], 3, 8, 0)
    hlen = len(_header(3, dims, blobs, 1))
    blobs = _var("a", [0, 1], 3, 8, hlen)
    buf = _header(3, dims, blobs, 1) + a.tobytes()  # no inter-record pad

    out, _ = netcdf.read_netcdf(buf)
    np.testing.assert_array_equal(out["a"], a.astype("i2"))


def test_mixed_fixed_and_record_var():
    f = np.array([10, 20], dtype=">i4")
    r_ = np.array([0.5, 1.5], dtype=">f8")
    dims = [("rec", 0), ("y", 2)]
    blobs = _var("f", [1], 4, 8, 0) + _var("r", [0], 6, 8, 0)
    hlen = len(_header(2, dims, blobs, 2))
    begin_f, begin_r = hlen, hlen + 8
    blobs = _var("f", [1], 4, 8, begin_f) + _var("r", [0], 6, 8, begin_r)
    buf = _header(2, dims, blobs, 2) + f.tobytes() + r_.tobytes()

    out, _ = netcdf.read_netcdf(buf)
    np.testing.assert_array_equal(out["f"], f.astype("i4"))
    np.testing.assert_array_equal(out["r"], r_.astype("f8"))


def test_write_int64_in_range_roundtrips():
    v = {"x": np.array([[-(2**31), 2**31 - 1]], dtype=np.int64)}
    out, _ = netcdf.read_netcdf(netcdf.write_netcdf(v))
    np.testing.assert_array_equal(out["x"], v["x"].astype(np.int32))


@pytest.mark.parametrize("arr", [
    np.array([2**31], dtype=np.int64),
    np.array([-(2**31) - 1], dtype=np.int64),
    np.array([200], dtype=np.uint8),  # classic NC_BYTE is signed
])
def test_write_narrowing_overflow_raises(arr):
    with pytest.raises(ValueError, match="exceed the classic"):
        netcdf.write_netcdf({"x": arr})
