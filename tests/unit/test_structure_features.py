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


def test_single_frame_input_promotes_to_frame_axis():
    """(N, 3) input must behave as one frame, not N 'frames' of shape
    (3, 1) (the jnp.atleast_3d trap: it APPENDS the new axis)."""
    x = np.zeros((3, 3), dtype=np.float32)
    x[1] = [0.1, 0.0, 0.0]
    x[2] = [0.3, 0.0, 0.0]
    donors = np.asarray([[0, 1]], dtype=np.int32)
    acceptors = np.asarray([2], dtype=np.int32)
    flat = np.asarray(hydrogen_bonds(x, donors, acceptors))
    framed = np.asarray(hydrogen_bonds(x[None], donors, acceptors))
    assert flat.shape == (1,)
    np.testing.assert_array_equal(flat, framed)
    s_flat = np.asarray(shrake_rupley_sasa(x, [0.17] * 3, n_points=32))
    s_framed = np.asarray(shrake_rupley_sasa(x[None], [0.17] * 3, n_points=32))
    assert s_flat.shape == (1, 3)
    np.testing.assert_allclose(s_flat, s_framed)
    with pytest.raises(ValueError, match="trajectory"):
        shrake_rupley_sasa(np.zeros((2, 1, 3, 3), np.float32), [0.17])


def test_lone_pair_nitrogen_acceptors():
    """Unprotonated His-like N (no bonded H, 2 heavy neighbors) accepts;
    amide/ammonium N (bonded H) does not."""
    #        0=N(his-like) 1=C 2=C   3=N(amide) 4=H 5=C
    elements = ["N", "C", "C", "N", "H", "C"]
    names = ["NE2", "CD2", "CE1", "N", "H", "CA"]
    bonds = np.asarray([[0, 1], [0, 2], [3, 4], [3, 5]])
    donors, acceptors = find_donors_acceptors(names, elements, bonds)
    assert 0 in acceptors          # lone-pair N accepts
    assert 3 not in acceptors      # N-H donor does not
    assert [3, 4] in donors.tolist()


def test_kabsch_sander_chain_break_blocks_h_synthesis():
    """A residue with no explicit amide H whose group-predecessor is an
    unrelated chain (resid wraps back to 1) must not donate via that
    chain's C=O direction."""
    from pmarlo_tpu.features.structure import kabsch_sander_hbonds

    def backbone_res(offset, rid, with_h):
        # minimal N/CA/C/O (+H) residue along x
        names = ["N", "CA", "C", "O"] + (["H"] if with_h else [])
        xyz = np.asarray([
            [0.0, 0.0, 0.0], [0.15, 0.0, 0.0],
            [0.25, 0.1, 0.0], [0.25, 0.22, 0.0],
        ] + ([[-0.08, 0.06, 0.0]] if with_h else []), np.float32)
        xyz[:, 0] += offset
        return names, xyz, rid

    names, coords, rids, resnames = [], [], [], []
    # chain A: residues 1-2 (with H), chain B: residue 1 (NO explicit H)
    for i, (rid, with_h) in enumerate([(1, True), (2, True), (1, False)]):
        n_, x_, r_ = backbone_res(0.5 * i, rid, with_h)
        names += n_
        coords.append(x_)
        rids += [r_] * len(n_)
        resnames += ["ALA"] * len(n_)
    top = TopologyInfo(atom_names=names, residue_names=resnames,
                       residue_ids=rids)
    x = np.concatenate(coords, axis=0)
    hb, _ = kabsch_sander_hbonds(x[None], top)
    # chain B's first residue (group 2) must never appear as a donor:
    # it has no H and its group-predecessor is chain A's residue 2
    assert not bool(np.asarray(hb)[0, :, 2].any())
