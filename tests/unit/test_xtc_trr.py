"""XTC/TRR codecs: round-trips, native/Python byte parity, dispatch.

The reference reads .xtc/.trr via mdtraj's C plugins
(src/pmarlo/io/trajectory_reader.py:187,214); here both codecs are
first-party (native/xtc.cpp + pure-Python mirror; pure-Python TRR).
"""

import numpy as np
import pytest

import pmarlo_tpu.io.xtc as xtc_mod
from pmarlo_tpu.io.trajectory import TrajectoryReader, get_writer
from pmarlo_tpu.io.trr import probe_trr, read_trr, write_trr
from pmarlo_tpu.io.xtc import probe_xtc, read_xtc, write_xtc

QUANT = 0.5 / xtc_mod.DEFAULT_PRECISION + 1e-7  # max quantization error


def _cases():
    rng = np.random.default_rng(7)
    protein = (
        rng.normal(0, 0.5, (30, 3))[None] + rng.normal(0, 0.01, (5, 30, 3))
    ).astype(np.float32)
    centers = rng.uniform(0, 4, (120, 1, 3))
    water = (
        (centers + rng.normal(0, 0.05, (120, 3, 3))).reshape(1, 360, 3)
        + rng.normal(0, 0.02, (3, 360, 3))
    ).astype(np.float32)
    tiny = rng.uniform(-1, 1, (2, 6, 3)).astype(np.float32)  # <=9 atoms: raw floats
    jumpy = rng.uniform(-20, 20, (4, 50, 3)).astype(np.float32)
    return {"protein": protein, "water": water, "tiny": tiny, "jumpy": jumpy}


@pytest.mark.parametrize("name", ["protein", "water", "tiny", "jumpy"])
def test_xtc_roundtrip(tmp_path, name):
    coords = _cases()[name]
    T, N = coords.shape[:2]
    steps = np.arange(T, dtype=np.int32) * 100
    times = (np.arange(T) * 0.2).astype(np.float32)
    box = np.tile((np.eye(3) * 4.2).ravel(), (T, 1)).astype(np.float32)
    p = write_xtc(tmp_path / "t.xtc", coords, steps=steps, times_ps=times,
                  box_nm=box)
    assert probe_xtc(p) == (T, N)
    out, s, t, b = read_xtc(p, return_metadata=True)
    assert np.abs(out - coords).max() <= QUANT
    assert (s == steps).all()
    np.testing.assert_allclose(t, times, rtol=1e-6)
    np.testing.assert_allclose(b.reshape(T, 9), box, rtol=1e-6)


def test_xtc_native_and_python_writers_byte_identical(tmp_path):
    """The pure-Python fallback must produce the exact bytes of the C++
    codec — mutual validation of the compression implementation."""
    if xtc_mod._load_native() is None:
        pytest.skip("no compiler for the native codec")
    for name, coords in _cases().items():
        T = coords.shape[0]
        steps = np.arange(T, dtype=np.int32)
        times = np.zeros(T, dtype=np.float32)
        box = np.zeros((T, 9), dtype=np.float32)
        native_p = tmp_path / f"{name}_n.xtc"
        py_p = tmp_path / f"{name}_p.xtc"
        write_xtc(native_p, coords, steps=steps, times_ps=times, box_nm=box)
        xtc_mod._py_write(py_p, coords, steps, times, box,
                          xtc_mod.DEFAULT_PRECISION)
        assert native_p.read_bytes() == py_p.read_bytes(), name


def test_xtc_python_reader_decodes_native_file(tmp_path):
    coords = _cases()["water"]
    p = write_xtc(tmp_path / "w.xtc", coords)
    frames = [c for c, _, _, _ in xtc_mod._py_iter_frames(p.read_bytes())]
    assert np.abs(np.asarray(frames) - coords).max() <= QUANT


def test_xtc_compresses(tmp_path):
    coords = _cases()["water"]
    p = write_xtc(tmp_path / "w.xtc", coords)
    assert p.stat().st_size < 0.55 * coords.nbytes


def test_xtc_slice_read(tmp_path):
    coords = _cases()["protein"]
    p = write_xtc(tmp_path / "t.xtc", coords)
    part = read_xtc(p, start=2, count=2)
    assert part.shape == (2,) + coords.shape[1:]
    assert np.abs(part - coords[2:4]).max() <= QUANT


def test_xtc_precision_parameter(tmp_path):
    coords = _cases()["protein"]
    p = write_xtc(tmp_path / "hi.xtc", coords, precision=100000.0)
    out = read_xtc(p)
    assert np.abs(out - coords).max() <= 0.5 / 100000.0 + 1e-7


def test_trr_roundtrip_with_velocities_forces(tmp_path):
    rng = np.random.default_rng(3)
    T, N = 4, 25
    x = rng.normal(0, 1, (T, N, 3)).astype(np.float32)
    v = rng.normal(0, 0.1, (T, N, 3)).astype(np.float32)
    f = rng.normal(0, 10, (T, N, 3)).astype(np.float32)
    steps = np.arange(T) * 10
    times = np.arange(T) * 0.02
    box = (np.eye(3) * 3.5).astype(np.float32)
    p = write_trr(tmp_path / "t.trr", x, velocities=v, forces=f, steps=steps,
                  times_ps=times, box_nm=box)
    assert probe_trr(p) == (T, N)
    out, meta = read_trr(p, return_metadata=True)
    np.testing.assert_allclose(out, x, rtol=1e-6)  # TRR is lossless fp32
    np.testing.assert_allclose(meta["velocities"], v, rtol=1e-6)
    np.testing.assert_allclose(meta["forces"], f, rtol=1e-6)
    assert (meta["steps"] == steps).all()
    np.testing.assert_allclose(meta["times_ps"], times, rtol=1e-5)
    np.testing.assert_allclose(meta["box"][0].ravel(),
                               np.asarray(box).ravel(), rtol=1e-6)


def test_trr_positions_only_and_slice(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (6, 10, 3)).astype(np.float32)
    p = write_trr(tmp_path / "t.trr", x)
    np.testing.assert_allclose(read_trr(p), x, rtol=1e-6)
    np.testing.assert_allclose(read_trr(p, start=1, count=3), x[1:4], rtol=1e-6)


def test_reader_writer_dispatch(tmp_path):
    coords = _cases()["protein"]
    # writer dispatch: .xtc routes to the XTC codec
    w = get_writer(tmp_path / "t.xtc", metadata={"dt_ps": 0.002})
    w.write_frames(coords)
    path = w.close()
    r = TrajectoryReader(path)
    assert r.probe_length() == coords.shape[0]
    assert np.abs(r.load() - coords).max() <= QUANT
    assert r.metadata() == {"format": "xtc"}
    # reader dispatch: .trr
    p2 = write_trr(tmp_path / "t.trr", coords)
    r2 = TrajectoryReader(p2)
    assert r2.probe_length() == coords.shape[0]
    np.testing.assert_allclose(r2.load(), coords, rtol=1e-6)


def test_xtc_corrupt_magic_raises(tmp_path):
    p = tmp_path / "bad.xtc"
    p.write_bytes(b"\x00\x00\x00\x01" + b"\x00" * 60)
    with pytest.raises((IOError, ValueError)):
        probe_xtc(p)
