"""Molecular-descriptor parity (reference protein/protein.py:605-617,
RDKit Descriptors via _compute_rdkit_descriptors)."""

import os
from pathlib import Path

import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.io.pdb import read_pdb
from pmarlo_tpu.md.forcefield import build_topology
from pmarlo_tpu.protein.descriptors import (
    _CRIPPEN,
    compute_descriptors,
    compute_logp,
    count_rotatable_bonds,
)

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")


@pytest.fixture(scope="module")
def ala_topo():
    s = alanine_dipeptide_structure()
    return build_topology(s)


def test_alanine_dipeptide_counts(ala_topo):
    d = compute_descriptors(ala_topo)
    # ACE(CH3,C,O) + ALA(N,CA,CB,C,O) + NME(N,CH3) = 10 heavy atoms
    assert d["heavy_atoms"] == 10
    assert d["aromatic_rings"] == 0
    # phi (N-CA) and psi (CA-C); both amide C-N bonds excluded
    assert d["rotatable_bonds"] == 2
    # C6H12N2O2 monoisotopic = 144.0899
    assert abs(d["exact_molecular_weight"] - 144.0899) < 0.01


def test_alanine_dipeptide_logp_hand_sum(ala_topo):
    # hand-typed Wildman-Crippen classes for ACE-ALA-NME:
    #  ACE: CH3->C1(attached to carbonyl C), C->C5, O->O9, 3H->H1
    #  ALA: N->N2, H(N)->H3, CA->C4, HA->H1, CB->C1, 3HB->H1, C->C5, O->O9
    #  NME: N->N2, H(N)->H3, CH3->C3, 3H->H1
    C = _CRIPPEN
    expected = (
        C["C1"] + C["C5"] + C["O9"] + 3 * C["H1"]
        + C["N2"] + C["H3"] + C["C4"] + C["H1"] + C["C1"] + 3 * C["H1"]
        + C["C5"] + C["O9"]
        + C["N2"] + C["H3"] + C["C3"] + 3 * C["H1"]
    )
    assert abs(compute_logp(ala_topo) - expected) < 1e-9


@pytest.mark.skipif(not CHIGNOLIN.exists(), reason="chignolin not mounted")
def test_chignolin_descriptors_pinned():
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare()
    d = p.get_properties()
    # GYDPETGTWG: 1 TYR ring + 2 TRP rings
    assert d["aromatic_rings"] == 3
    assert d["heavy_atoms"] == 77
    # regression pins (intentional-change detectors, not oracles)
    assert abs(d["logp"] - (-9.786)) < 0.01
    assert d["rotatable_bonds"] == 29
    assert abs(d["exact_molecular_weight"] - 1079.4196) < 0.01
    # monoisotopic mass must sit below the average-mass MW
    assert d["exact_molecular_weight"] < d["molecular_weight"]


@pytest.mark.skipif(not CHIGNOLIN.exists(), reason="chignolin not mounted")
def test_ring_bonds_not_rotatable():
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare()
    topo = p.topology
    neighbors = topo.neighbor_sets()
    from pmarlo_tpu.protein.descriptors import _bond_in_ring

    # every TYR/TRP ring bond must be detected as in-ring
    ring_names = {"CG", "CD1", "CD2", "CE1", "CE2", "CZ",
                  "NE1", "CE3", "CZ2", "CZ3", "CH2"}
    checked = 0
    for a, b in topo.bonds:
        a, b = int(a), int(b)
        if (topo.residue_names[a] in ("TYR", "TRP")
                and topo.residue_names[a] == topo.residue_names[b]
                and topo.atom_names[a] in ring_names
                and topo.atom_names[b] in ring_names):
            assert _bond_in_ring(a, b, neighbors, topo.residue_ids)
            checked += 1
    assert checked >= 6


def test_proline_ring_not_rotatable():
    # PRO ring bonds (N-CD, CA-CB, CB-CG, CG-CD) are cyclic
    if not CHIGNOLIN.exists():
        pytest.skip("chignolin not mounted")
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare()
    topo = p.topology
    neighbors = topo.neighbor_sets()
    from pmarlo_tpu.protein.descriptors import _bond_in_ring

    found = 0
    for a, b in topo.bonds:
        a, b = int(a), int(b)
        if topo.residue_names[a] == "PRO" == topo.residue_names[b]:
            na, nb = topo.atom_names[a], topo.atom_names[b]
            if {na, nb} in ({"CB", "CG"}, {"CG", "CD"}, {"N", "CD"}):
                assert _bond_in_ring(a, b, neighbors, topo.residue_ids)
                found += 1
    assert found >= 3


def test_cyx_counts_in_sequence_and_mass():
    """Disulfide-renamed cysteines (CYX) must canonicalize to CYS for
    sequence/MW/pI reporting — not vanish."""
    from pmarlo_tpu.protein.protein import _canonical, _ONE_LETTER, _RESIDUE_MASS

    assert _canonical("CYX") == "CYS"
    assert _canonical("CYM") == "CYS"
    assert _ONE_LETTER[_canonical("CYX")] == "C"
    assert _canonical("CYX") in _RESIDUE_MASS


def test_prepare_ignores_crystallographic_cryst1(tmp_path):
    """A raw X-ray PDB's CRYST1 is a crystal cell, not a solvent box:
    prepare() must not adopt it when the structure has no waters."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb
    from pmarlo_tpu.protein.protein import Protein

    s = alanine_dipeptide_structure()
    pdb = tmp_path / "xray.pdb"
    write_pdb(pdb, s.coordinates(),
              [a.name for r in s.residues for a in r.atoms],
              [a.resname for r in s.residues for a in r.atoms],
              [a.resid for r in s.residues for a in r.atoms],
              box=(5.08, 4.28, 2.90))     # crystallographic CRYST1
    p = Protein(str(pdb))
    p.prepare()
    assert p.box is None, "crystal CRYST1 adopted as a solvent box"
