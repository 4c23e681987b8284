"""SASA / H-bond / secondary-structure feature kernels + DCD codec."""

import numpy as np
import pytest

from pmarlo_tpu.features.base import TopologyInfo
from pmarlo_tpu.features.structure import (
    find_donors_acceptors,
    hydrogen_bonds,
    shrake_rupley_sasa,
    ss_fractions,
)


def test_sasa_isolated_atom():
    # one atom: fully exposed sphere area 4 pi (r + probe)^2
    traj = np.zeros((1, 1, 3), dtype=np.float32)
    sasa = np.asarray(shrake_rupley_sasa(traj, [0.17], n_points=128))
    expected = 4 * np.pi * (0.17 + 0.14) ** 2
    assert abs(sasa[0, 0] - expected) / expected < 1e-5


def test_sasa_buried_atom():
    # center atom fully surrounded by 6 close neighbors loses most area
    traj = np.zeros((1, 7, 3), dtype=np.float32)
    offsets = np.asarray(
        [[0.25, 0, 0], [-0.25, 0, 0], [0, 0.25, 0], [0, -0.25, 0],
         [0, 0, 0.25], [0, 0, -0.25]]
    )
    traj[0, 1:] = offsets
    radii = [0.17] * 7
    sasa = np.asarray(shrake_rupley_sasa(traj, radii, n_points=128))
    assert sasa[0, 0] < 0.2 * (4 * np.pi * 0.31**2)


def test_hbond_geometric():
    # linear N-H...O at 0.2 nm: one H-bond; bent geometry: zero
    x = np.zeros((1, 3, 3), dtype=np.float32)
    x[0, 0] = [0.0, 0.0, 0.0]     # N (donor heavy)
    x[0, 1] = [0.1, 0.0, 0.0]     # H
    x[0, 2] = [0.3, 0.0, 0.0]     # O acceptor, H..A = 0.2
    donors = np.asarray([[0, 1]], dtype=np.int32)
    acceptors = np.asarray([2], dtype=np.int32)
    n = np.asarray(hydrogen_bonds(x, donors, acceptors))
    assert n[0] == 1.0
    x[0, 2] = [0.1, 0.2, 0.0]     # 90-degree angle, still close
    n = np.asarray(hydrogen_bonds(x, donors, acceptors))
    assert n[0] == 0.0


def test_find_donors_acceptors(alanine_system):
    system, _, topo = alanine_system
    donors, acceptors = find_donors_acceptors(
        topo.atom_names, topo.elements, topo.bonds
    )
    # alanine dipeptide: two amide N-H donors; two carbonyl O acceptors
    assert donors.shape[0] == 2
    assert len(acceptors) == 2


def test_ss_fractions(alanine_system, topology_info):
    _, positions, _ = alanine_system
    traj = np.asarray(positions)[None]
    frac = np.asarray(ss_fractions(traj, topology_info))
    assert frac.shape == (1, 3)
    np.testing.assert_allclose(frac.sum(axis=1), 1.0, atol=1e-6)


def test_feature_registry_entries(alanine_system):
    from pmarlo_tpu.features.base import get_feature

    system, positions, topo = alanine_system
    info = TopologyInfo.from_topology(topo)
    traj = np.asarray(positions)[None]
    sasa = get_feature("sasa")(traj, info)
    assert sasa.shape == (1, 1) and float(sasa[0, 0]) > 0
    hb = get_feature("hbonds")(traj, info)
    assert hb.shape == (1, 1)
    ss = get_feature("ssfrac")(traj, info)
    assert ss.shape == (1, 3)


def test_dcd_roundtrip(tmp_path):
    from pmarlo_tpu.io.dcd import probe_dcd, read_dcd, write_dcd

    rng = np.random.default_rng(0)
    coords = rng.normal(size=(5, 22, 3)).astype(np.float32)
    path = write_dcd(tmp_path / "t.dcd", coords, dt_ps=0.002, save_interval=100)
    nf, na = probe_dcd(path)
    assert (nf, na) == (5, 22)
    back = read_dcd(path)
    np.testing.assert_allclose(back, coords, atol=1e-5)
    part = read_dcd(path, start=2, count=2)
    np.testing.assert_allclose(part, coords[2:4], atol=1e-5)
