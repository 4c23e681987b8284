"""Featurization: registry, spec parsing, dihedral correctness."""

import numpy as np
import pytest

from pmarlo_tpu.features.base import (
    FEATURE_REGISTRY,
    get_feature,
    parse_feature_spec,
)
from pmarlo_tpu.features.builtins import (
    compute_dihedrals,
    compute_distances,
    phi_psi_indices,
    radius_of_gyration,
)
from pmarlo_tpu.features.featurize import featurize_trajectory
from pmarlo_tpu.features.pairs import (
    diagnose_pairs,
    expected_pairs,
    lagged_time_pairs,
    segment_lagged_pairs,
)


def test_spec_parser_grammar():
    specs = parse_feature_spec("phi_psi")
    assert specs[0].name == "phi_psi"
    specs = parse_feature_spec("distance(1,7)")
    assert specs[0].name == "distance" and specs[0].args == (1, 7)
    specs = parse_feature_spec("dist:atompair(3,9)")
    assert specs[0].name == "distance" and specs[0].args == (3, 9)
    specs = parse_feature_spec("distance([2,5])")
    assert specs[0].args == (2, 5)
    specs = parse_feature_spec(["phi_psi", "rg"])
    assert [s.name for s in specs] == ["phi_psi", "rg"]
    specs = parse_feature_spec("phi_psi,rg")
    assert [s.name for s in specs] == ["phi_psi", "rg"]
    with pytest.raises(KeyError):
        get_feature("not_a_feature")


def test_dihedral_analytic():
    # four points with a known 90-degree dihedral
    pts = np.array([
        [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 1.0]]
    ], dtype=np.float32)
    quad = np.array([[0, 1, 2, 3]], dtype=np.int32)
    angle = float(np.asarray(compute_dihedrals(pts, quad))[0, 0])
    assert abs(abs(angle) - np.pi / 2) < 1e-5


def test_dihedral_trans_is_pi():
    pts = np.array([
        [[-1.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, -1.0, 0.0]]
    ], dtype=np.float32)
    quad = np.array([[0, 1, 2, 3]], dtype=np.int32)
    angle = float(np.asarray(compute_dihedrals(pts, quad))[0, 0])
    assert abs(abs(angle) - np.pi) < 1e-5


def test_phi_psi_indices_alanine(topology_info):
    phi_q, psi_q, labels = phi_psi_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    assert phi_q.shape == (1, 4) and psi_q.shape == (1, 4)  # only ALA
    assert labels == [2]


def test_featurize_alanine(alanine_system, topology_info):
    _, positions, _ = alanine_system
    traj = np.asarray(positions)[None].repeat(5, axis=0)
    X, info = featurize_trajectory(traj, "phi_psi", topology_info)
    assert X.shape == (5, 2)
    assert info["periodic"].all()
    X2, info2 = featurize_trajectory(
        traj, "phi_psi", topology_info, cos_sin_expand=True
    )
    assert X2.shape == (5, 4)
    assert not info2["periodic"].any()
    np.testing.assert_allclose(
        np.asarray(X2[:, :2]) ** 2 + np.asarray(X2[:, 2:]) ** 2, 1.0, atol=1e-5
    )


def test_distance_and_rg():
    traj = np.zeros((2, 3, 3), dtype=np.float32)
    traj[:, 1, 0] = 3.0
    traj[:, 2, 1] = 4.0
    d = np.asarray(compute_distances(traj, np.array([[0, 1], [1, 2]])))
    assert abs(d[0, 0] - 3.0) < 1e-5
    assert abs(d[0, 1] - 5.0) < 1e-5
    rg = np.asarray(radius_of_gyration(traj))
    assert rg.shape == (2,) and (rg > 0).all()


def test_lagged_pairs():
    i, j = lagged_time_pairs(10, 3)
    assert len(i) == 7 and (j - i == 3).all()
    i, j = lagged_time_pairs(3, 5)
    assert len(i) == 0
    i, j = segment_lagged_pairs([5, 5], 2)
    assert len(i) == 6
    # no pair crosses the boundary at index 5
    assert not ((i < 5) & (j >= 5)).any()
    assert expected_pairs([5, 5], 2) == 6
    diag = diagnose_pairs([5, 2], 2)
    assert diag["too_short_segments"] == [1]


def test_backbone_torsions(alanine_system, topology_info):
    from pmarlo_tpu.features.base import get_feature
    from pmarlo_tpu.features.builtins import omega_indices

    _, positions, _ = alanine_system
    traj = np.asarray(positions)[None]
    # ACE-ALA-NME: 1 phi, 1 psi, 2 omegas (ACE-ALA, ALA-NME)
    omega_q, labels = omega_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    assert omega_q.shape == (2, 4)
    X = get_feature("backbone_torsions")(traj, topology_info)
    assert X.shape == (1, 4)
    # peptide bonds are trans: omega ~ +-pi
    omegas = np.asarray(X[0, 2:])
    assert (np.abs(np.abs(omegas) - np.pi) < 0.5).all()


def test_dihedral_iupac_sign_convention():
    """Hand-constructed +60 degree dihedral (IUPAC/mdtraj sign): looking
    along the central bond, the far bond is rotated clockwise by 60 deg.
    Round-1 regression: the old formula returned the NEGATED angle, so
    every reported phi/psi and CV feature was mirrored."""
    import jax.numpy as jnp
    import numpy as np

    from pmarlo_tpu.features.builtins import compute_dihedrals
    from pmarlo_tpu.md.forces import dihedral_angles

    pts = np.array(
        [[1, 0, 0], [0, 0, 0], [0, 0, 1], [0.5, np.sqrt(3) / 2, 1]],
        np.float32,
    )
    quad = np.array([[0, 1, 2, 3]])
    got_f = float(np.degrees(np.asarray(compute_dihedrals(pts[None], quad))))
    got_m = float(np.degrees(np.asarray(
        dihedral_angles(jnp.asarray(pts), jnp.asarray(quad)))))
    assert got_f == pytest.approx(60.0, abs=1e-3)
    assert got_m == pytest.approx(60.0, abs=1e-3)


def test_compute_dihedrals_single_frame_promotes():
    """(N, 3) input is ONE frame: must equal the (1, N, 3) result, not
    N garbage rows (the jnp.atleast_3d axis-appending trap)."""
    import numpy as np

    from pmarlo_tpu.features.builtins import compute_dihedrals

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 3)).astype(np.float32)
    quads = np.asarray([[0, 1, 2, 3], [2, 3, 4, 5]])
    flat = np.asarray(compute_dihedrals(x, quads))
    framed = np.asarray(compute_dihedrals(x[None], quads))
    assert flat.shape == (1, 2)
    np.testing.assert_allclose(flat, framed, atol=1e-7)


def test_phi_psi_indices_skip_chain_breaks():
    """No dihedral may span a resid gap (missing loop) or a resid wrap
    (new chain): C(45)-N(60) is not a peptide bond."""
    import numpy as np

    from pmarlo_tpu.features.builtins import omega_indices, phi_psi_indices

    names, rids = [], []
    for rid in (1, 2, 3, 10, 11, 12):
        names += ["N", "CA", "C", "O"]
        rids += [rid] * 4
    phi, psi, labels = phi_psi_indices(names, rids)
    # interior residues of each contiguous run only: 2 and 11
    assert labels == [2, 11]
    assert phi.shape == (2, 4) and psi.shape == (2, 4)
    # no quad mixes atoms across the 3 -> 10 gap
    atoms_per_res = 4
    for quad in np.concatenate([phi, psi]):
        res_of = quad // atoms_per_res
        assert res_of.max() - res_of.min() <= 2
        assert not (set(res_of) & {2}) or not (set(res_of) & {3})
    om, om_labels = omega_indices(names, rids)
    assert om_labels == [2, 3, 11, 12]


def test_phi_psi_indices_homodimer_duplicate_resids():
    """Two chains both numbered 1..3 must yield per-chain dihedrals, not
    a merged resid table."""
    names, rids = [], []
    for _chain in range(2):
        for rid in (1, 2, 3):
            names += ["N", "CA", "C", "O"]
            rids += [rid] * 4
    from pmarlo_tpu.features.builtins import phi_psi_indices

    phi, psi, labels = phi_psi_indices(names, rids)
    assert labels == [2, 2]   # the interior residue of EACH chain
    assert phi.shape == (2, 4)
    # second chain's quads index its own atoms (offset by 12)
    assert phi[1].min() >= 12


def test_phi_psi_indices_continuous_numbering_across_chains():
    """Continuous residue numbering across chains (A:1-3, B:4-6, common
    in consolidated exports) must NOT produce inter-chain dihedrals when
    per-atom chain ids are supplied."""
    from pmarlo_tpu.features.builtins import phi_psi_indices

    names, rids, chains = [], [], []
    for rid, ch in ((1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "B")):
        names += ["N", "CA", "C", "O"]
        rids += [rid] * 4
        chains += [ch] * 4
    # without chain ids the boundary is invisible: 4 interior residues
    _, _, labels_blind = phi_psi_indices(names, rids)
    assert labels_blind == [2, 3, 4, 5]
    # with chain ids: only the true interior residue of each chain
    phi, psi, labels = phi_psi_indices(names, rids, chains)
    assert labels == [2, 5]
    assert phi[1].min() >= 12 and psi[0].max() < 16


def test_dssp_contig_respects_chain_ids():
    """Amide-H synthesis must not use the previous GROUP's C=O when that
    group sits in a different chain (continuous numbering)."""
    import numpy as np

    from pmarlo_tpu.features.base import TopologyInfo
    from pmarlo_tpu.features.structure import _backbone_indices

    names, rids, chains, rnames = [], [], [], []
    for rid, ch in ((1, "A"), (2, "A"), (3, "B"), (4, "B")):
        names += ["N", "CA", "C", "O"]
        rids += [rid] * 4
        chains += [ch] * 4
        rnames += ["ALA"] * 4
    top = TopologyInfo(atom_names=names, residue_names=rnames,
                       residue_ids=rids, chain_ids=chains)
    bb, hh, resnames, rids_arr, gchains = _backbone_indices(top)
    assert gchains == ["A", "A", "B", "B"]
    # resid 3 (chain B first residue) is consecutive in number with
    # resid 2 (chain A) but must be a chain start, not contiguous
    contig = np.zeros(4, bool)
    contig[1:] = (rids_arr[1:] == rids_arr[:-1] + 1) & np.asarray(
        [gchains[r] == gchains[r - 1] for r in range(1, 4)], bool
    )
    assert list(contig) == [False, True, False, True]
