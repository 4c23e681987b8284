"""Amber NetCDF codec: round-trips + cross-validation vs scipy's
independent NetCDF-classic implementation (external format oracle).

Role parity: reference reads .nc via mdtraj (io/trajectory_reader.py:187).
"""

import numpy as np
import pytest

from pmarlo_tpu.io.netcdf import (
    probe_netcdf,
    read_netcdf,
    read_netcdf_raw,
    write_netcdf,
    write_netcdf_raw,
)
from pmarlo_tpu.io.trajectory import TrajectoryReader


@pytest.fixture
def traj():
    rng = np.random.default_rng(11)
    coords = rng.normal(0, 1, (6, 14, 3)).astype(np.float32)
    times = (np.arange(6) * 0.4).astype(np.float32)
    return coords, times


def test_roundtrip(tmp_path, traj):
    coords, times = traj
    p = write_netcdf(tmp_path / "t.nc", coords, times_ps=times)
    assert probe_netcdf(p) == (6, 14)
    back, meta = read_netcdf(p, return_metadata=True)
    np.testing.assert_allclose(back, coords, atol=1e-5)
    np.testing.assert_allclose(meta["times_ps"], times, rtol=1e-6)
    assert meta["conventions"] == "AMBER"


def test_roundtrip_with_cell(tmp_path, traj):
    coords, times = traj
    p = write_netcdf(tmp_path / "t.nc", coords, times_ps=times,
                     cell_lengths_nm=np.full((6, 3), 3.2),
                     cell_angles_deg=np.full((6, 3), 90.0))
    back, meta = read_netcdf(p, return_metadata=True)
    np.testing.assert_allclose(back, coords, atol=1e-5)
    np.testing.assert_allclose(meta["cell_lengths_nm"], 3.2, rtol=1e-6)
    np.testing.assert_allclose(meta["cell_angles_deg"], 90.0, rtol=1e-6)


def test_slice_read(tmp_path, traj):
    coords, _ = traj
    p = write_netcdf(tmp_path / "t.nc", coords)
    part = read_netcdf(p, start=2, count=3)
    np.testing.assert_allclose(part, coords[2:5], atol=1e-5)


def test_scipy_reads_our_file(tmp_path, traj):
    scipy_io = pytest.importorskip("scipy.io")
    coords, times = traj
    p = write_netcdf(tmp_path / "t.nc", coords, times_ps=times)
    f = scipy_io.netcdf_file(str(p), "r", mmap=False)
    try:
        assert f.Conventions == b"AMBER"
        sc = f.variables["coordinates"][:].astype(np.float32) * 0.1
        np.testing.assert_allclose(sc, coords, atol=1e-5)
        np.testing.assert_allclose(f.variables["time"][:], times, rtol=1e-6)
        assert f.variables["spatial"][:].tobytes() == b"xyz"
    finally:
        f.close()


def test_we_read_scipy_file(tmp_path, traj):
    scipy_io = pytest.importorskip("scipy.io")
    coords, times = traj
    p = tmp_path / "s.nc"
    g = scipy_io.netcdf_file(str(p), "w")
    g.Conventions = b"AMBER"
    g.createDimension("frame", None)
    g.createDimension("atom", coords.shape[1])
    g.createDimension("spatial", 3)
    v = g.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
    v[:] = coords * 10.0
    v.units = b"angstrom"
    tv = g.createVariable("time", "f", ("frame",))
    tv[:] = times
    tv.units = b"picosecond"
    g.flush()
    g.close()
    back, meta = read_netcdf(p, return_metadata=True)
    np.testing.assert_allclose(back, coords, atol=1e-5)
    np.testing.assert_allclose(meta["times_ps"], times, rtol=1e-6)


def test_raw_fixed_and_multiple_record_vars(tmp_path):
    # exercises fixed vars, 2 record vars (per-record interleave), char data
    dims = {"t": None, "k": 4}
    fixed = np.arange(4, dtype=np.int32)
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(3, dtype=np.float64) * 1.5
    p = write_netcdf_raw(
        tmp_path / "r.nc", dims, {"title": "raw"},
        {
            "fixed": {"data": fixed, "dimensions": ["k"], "attributes": {}},
            "a": {"data": a, "dimensions": ["t", "k"], "attributes": {}},
            "b": {"data": b, "dimensions": ["t"], "attributes": {"u": "x"}},
        },
    )
    rdims, gatts, variables = read_netcdf_raw(p)
    assert rdims == {"t": 3, "k": 4}
    assert gatts["title"] == "raw"
    np.testing.assert_array_equal(variables["fixed"]["data"], fixed)
    np.testing.assert_allclose(variables["a"]["data"], a)
    np.testing.assert_allclose(variables["b"]["data"], b)
    assert variables["b"]["attributes"]["u"] == "x"


def test_reader_dispatch(tmp_path, traj):
    coords, _ = traj
    p = write_netcdf(tmp_path / "t.nc", coords)
    r = TrajectoryReader(p)
    assert r.probe_length() == coords.shape[0]
    np.testing.assert_allclose(r.load(), coords, atol=1e-5)
    assert r.metadata() == {"format": "nc"}


def test_not_netcdf_raises(tmp_path):
    p = tmp_path / "bad.nc"
    p.write_bytes(b"NOPE" + b"\x00" * 32)
    with pytest.raises(ValueError):
        probe_netcdf(p)
