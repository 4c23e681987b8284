"""I/O: PDB round-trips, trajectory store, shard contracts."""

import json

import numpy as np
import pytest

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.io.pdb import read_pdb, write_pdb
from pmarlo_tpu.io.shards import (
    emit_shards_from_trajectory,
    feature_spec_hash,
    read_shard,
    select_shard_paths,
    shard_id,
    write_shard,
)
from pmarlo_tpu.io.trajectory import TrajectoryReader, TrajectoryWriter, iterload


def test_pdb_roundtrip(tmp_path):
    s = alanine_dipeptide_structure()
    coords = s.coordinates()
    names = [a.name for r in s.residues for a in r.atoms]
    rnames = [a.resname for r in s.residues for a in r.atoms]
    rids = [a.resid for r in s.residues for a in r.atoms]
    p = write_pdb(tmp_path / "x.pdb", coords, names, rnames, rids)
    loaded = read_pdb(p)
    np.testing.assert_allclose(loaded.coordinates(), coords, atol=1e-4)
    assert [a.name for r in loaded.residues for a in r.atoms] == names


def test_trajectory_writer_reader(tmp_path):
    path = tmp_path / "traj.npz"
    with TrajectoryWriter(path, metadata={"temperature_K": 300.0},
                          flush_interval=3) as w:
        for _ in range(4):  # exercises the spill path
            w.write_frames(np.random.rand(2, 5, 3).astype(np.float32))
    r = TrajectoryReader(path)
    assert r.probe_length() == 8
    assert r.metadata()["temperature_K"] == 300.0
    chunks = list(r.iter_frames(chunk=3))
    assert sum(c.shape[0] for c in chunks) == 8
    assert sum(1 for _ in iterload(path, chunk=3, stride=2)) >= 1


def test_shard_contract(tmp_path):
    assert shard_id(300.0, "abc") == "T300_run-abc"
    assert shard_id(312.5, "r", 3) == "T312.5_run-r_00003"
    feats = np.random.rand(50, 4).astype(np.float32)
    p = write_shard(
        tmp_path, temperature_K=300.0, run_id="test", features=feats,
        feature_spec=["phi_psi"], stride=2, dt_ps=0.002,
        source_range=(100, 150), bias={"kind": "none"},
    )
    shard = read_shard(p)
    meta = shard["metadata"]
    assert meta["shard_id"] == "T300_run-test"
    assert meta["n_frames"] == 50
    assert meta["source"]["range"] == [100, 150]
    assert meta["feature_spec_hash"] == feature_spec_hash(["phi_psi"])
    np.testing.assert_array_equal(shard["features"], feats)


def test_shard_selection(tmp_path):
    for T in (300.0, 350.0):
        for i in range(3):
            write_shard(tmp_path, temperature_K=T, run_id="r1",
                        features=np.zeros((10, 2)), index=i)
    assert len(select_shard_paths(tmp_path)) == 6
    assert len(select_shard_paths(tmp_path, temperature_K=300.0)) == 3
    assert len(select_shard_paths(tmp_path, temperature_K=300.0, limit=2)) == 2
    assert len(select_shard_paths(tmp_path, run_id="nope")) == 0


def test_emit_shards(tmp_path):
    feats = np.random.rand(95, 3).astype(np.float32)
    paths = emit_shards_from_trajectory(
        tmp_path, feats, temperature_K=320.0, run_id="emit",
        frames_per_shard=30,
    )
    assert len(paths) == 4  # 30+30+30+5
    total = sum(read_shard(p)["metadata"]["n_frames"] for p in paths)
    assert total == 95
    ranges = [tuple(read_shard(p)["metadata"]["source"]["range"]) for p in paths]
    assert ranges == [(0, 30), (30, 60), (60, 90), (90, 95)]


def test_shard_requires_payload(tmp_path):
    with pytest.raises(ValueError, match="features and/or coordinates"):
        write_shard(tmp_path, temperature_K=300.0, run_id="x")


def test_writer_dispatch_dcd(tmp_path):
    from pmarlo_tpu.io.trajectory import TrajectoryReader, get_writer

    coords = np.random.rand(3, 7, 3).astype(np.float32)
    with get_writer(tmp_path / "t.dcd", {"dt_ps": 0.002}) as w:
        w.write_frames(coords)
    r = TrajectoryReader(tmp_path / "t.dcd")
    assert r.probe_length() == 3
    np.testing.assert_allclose(r.load(), coords, atol=1e-5)
    # npz dispatch unchanged
    with get_writer(tmp_path / "t.npz") as w:
        w.write_frames(coords)
    assert TrajectoryReader(tmp_path / "t.npz").probe_length() == 3


def test_hybrid36_resid_roundtrip(tmp_path):
    """Resids past 9999 must survive a write/read round trip uniquely.

    Plain 4-digit wrapping would merge distinct waters into one residue
    on read (ADVICE r2 #3)."""
    from pmarlo_tpu.io.pdb import _h36_decode, _h36_encode

    for v in [1, 9999, 10000, 10001, 46655, 46656, 2436111]:
        assert _h36_decode(_h36_encode(v, 4), 4) == v
    for v in [1, 99999, 100000, 100001, 43770015]:
        assert _h36_decode(_h36_encode(v, 5), 5) == v

    n = 12  # spans the 9998..10009 resid range
    coords = np.zeros((3 * n, 3))
    coords[:, 0] = np.arange(3 * n) * 0.1
    names, rnames, rids = [], [], []
    for i in range(n):
        for a in ("O", "H1", "H2"):
            names.append(a)
            rnames.append("HOH")
            rids.append(9998 + i)
    p = write_pdb(tmp_path / "big.pdb", coords, names, rnames, rids)
    loaded = read_pdb(p)
    assert len(loaded.residues) == n
    assert [r.resid for r in loaded.residues] == list(range(9998, 9998 + n))
    assert all(len(r.atoms) == 3 for r in loaded.residues)


def test_triclinic_cryst1_parsed(tmp_path):
    """Triclinic CRYST1 converts to the reduced (box, tilt) cell the
    engine runs on (round-3 triclinic support; previously dropped with
    a warning per ADVICE r2 #1 — never silently treated as
    orthorhombic)."""
    lines = [
        "CRYST1   30.000   30.000   30.000  90.00  90.00 120.00 P 1"
        "           1",
        "ATOM      1  O   HOH A   1       0.000   0.000   0.000  1.00"
        "  0.00           O",
        "END",
    ]
    p = tmp_path / "tri.pdb"
    p.write_text("\n".join(lines) + "\n")
    s = read_pdb(p)
    assert s.box is not None and s.tilt is not None
    from pmarlo_tpu.md.box import box_matrix, validate_reduced

    H = box_matrix(s.box, s.tilt)
    validate_reduced(H)
    # gamma = 120 deg: |b| = 3 nm with bx = 3 cos(120) reduced into
    # [-ax/2, ax/2]; lattice volume = a b c sin(gamma)
    assert abs(np.linalg.det(H) - 27.0 * np.sin(np.deg2rad(120.0))) < 1e-6

    lines[0] = ("CRYST1   30.000   30.000   30.000  90.00  90.00  90.00 P 1"
                "           1")
    p.write_text("\n".join(lines) + "\n")
    s = read_pdb(p)
    assert s.box is not None
    np.testing.assert_allclose(s.box, (3.0, 3.0, 3.0))


def test_pdb_roundtrip_four_char_resname(tmp_path):
    """CHARMM-style 4-char residue names (TIP3) must round-trip without
    shifting the fixed-width chain/resid/coordinate columns."""
    from pmarlo_tpu.io.pdb import read_pdb, write_pdb

    coords = np.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], np.float64)
    out = tmp_path / "tip3.pdb"
    write_pdb(out, coords, ["OH2", "H1"], ["TIP3", "TIP3"], [7, 7],
              box=(2.0, 2.0, 2.0), chain="W")
    s = read_pdb(out)
    assert len(s.residues) == 1
    r = s.residues[0]
    assert r.name == "TIP3" and r.resid == 7 and r.chain == "W"
    np.testing.assert_allclose(s.coordinates(), coords, atol=1e-3)


def test_pdb_trajectory_hybrid36_numbering(tmp_path):
    """write_pdb_trajectory shares write_pdb's hybrid-36 numbering so
    >9999-residue frames keep their columns aligned."""
    from pmarlo_tpu.io.pdb import _h36_decode, write_pdb_trajectory

    n = 3
    frames = np.zeros((1, n, 3), np.float64)
    out = tmp_path / "traj.pdb"
    write_pdb_trajectory(out, frames, ["O"] * n, ["HOH"] * n,
                         [9998 + i for i in range(n)])
    atom_lines = [ln for ln in out.read_text().splitlines()
                  if ln.startswith("ATOM")]
    assert len(atom_lines) == n
    for i, ln in enumerate(atom_lines):
        assert _h36_decode(ln[22:26], 4) == 9998 + i
        assert float(ln[30:38]) == 0.0  # coordinates still in columns


def test_write_shard_rejects_frame_mismatch(tmp_path):
    from pmarlo_tpu.io.shards import write_shard

    with pytest.raises(ValueError, match="frames"):
        write_shard(
            tmp_path, temperature_K=300.0, run_id="r1", index=0,
            features=np.zeros((10, 2), np.float32),
            coordinates=np.zeros((5, 3, 3), np.float32),
        )


def test_zero_frame_dcd_probe_and_read(tmp_path):
    """A header-only DCD (writer died before frame 1) probes as
    (0, n_atoms) and reads as (0, N, 3)."""
    import struct

    from pmarlo_tpu.io.dcd import probe_dcd, read_dcd

    def rec(payload: bytes) -> bytes:
        return struct.pack("<i", len(payload)) + payload + struct.pack(
            "<i", len(payload))

    header = b"CORD" + struct.pack("<20i", *([0] * 20))
    title = struct.pack("<i", 0)
    natoms = struct.pack("<i", 7)
    p = tmp_path / "empty.dcd"
    p.write_bytes(rec(header) + rec(title) + rec(natoms))
    arr = read_dcd(p)
    assert arr.shape == (0, 7, 3)
    nf, na = probe_dcd(p)
    assert (nf, na) == (0, 7)
