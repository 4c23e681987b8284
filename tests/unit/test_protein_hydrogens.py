"""Hydrogen addition + protonation: geometry, charge closure, end-to-end.

Mirrors the reference's prep contract (PDBFixer addMissingHydrogens(pH),
src/pmarlo/protein/protein.py:334-373): an H-less X-ray structure must
become a runnable system.
"""

import numpy as np
import pytest

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.residues import TEMPLATES, get_template
from pmarlo_tpu.protein.hydrogens import add_hydrogens, assign_protonation_states

REF_3GD8 = "/root/reference/tests/_assets/3gd8.pdb"


def test_variant_charge_closure():
    """Every template's charges must close to an integer total — a single
    transcription error breaks this."""
    expected = {
        "ASH": 0, "GLH": 0, "LYN": 0, "HIP": 1, "HID": 0, "HIE": 0,
        "ASP": -1, "GLU": -1, "LYS": 1, "ARG": 1, "HIS": 0,
        "NGLY": 1, "CGLY": -1, "NPRO": 1,
        "NA": 1, "CL": -1,   # monovalent ions (explicit-solvent path)
        # structural ions (md/residues.py, Joung-Cheatham / Aqvist / Amber)
        "K": 1, "MG": 2, "ZN": 2, "CA": 2,
        # internal (deoxy)ribonucleotides carry one phosphate each
        # (md/nucleic.py; terminal 5'/3' splits are covered by
        # tests/unit/test_dna.py::test_template_charge_sums)
        "DA": -1, "DC": -1, "DG": -1, "DT": -1,
        "A": -1, "C": -1, "G": -1, "U": -1,
    }
    for name, tmpl in TEMPLATES.items():
        total = sum(q for (_, q) in tmpl["atoms"].values())
        want = expected.get(name, 0)
        if name in ("ACE", "NME"):
            continue  # caps sum to ~0 jointly with the chain
        assert abs(total - want) < 5e-4, f"{name}: sum {total} != {want}"


def test_terminal_variant_charge_closure():
    for res in ("ALA", "VAL", "SER", "LYS", "ASP"):
        base = sum(q for (_, q) in TEMPLATES[res]["atoms"].values())
        nt = get_template(res, is_nterm=True)
        ct = get_template(res, is_cterm=True)
        nt_total = sum(q for (_, q) in nt["atoms"].values())
        ct_total = sum(q for (_, q) in ct["atoms"].values())
        assert abs(nt_total - (base + 1)) < 1e-6, f"N{res}"
        assert abs(ct_total - (base - 1)) < 1e-6, f"C{res}"


def _strip_hydrogens(structure: PDBStructure) -> PDBStructure:
    return PDBStructure(
        residues=[
            PDBResidue(
                name=r.name, resid=r.resid, chain=r.chain,
                atoms=[a for a in r.atoms if a.element != "H"],
            )
            for r in structure.residues
        ],
        n_models=structure.n_models,
    )


def test_add_hydrogens_roundtrip_alanine(alanine_system):
    """Strip all H from alanine dipeptide, rebuild them, and check the
    result is a valid topology with correct H bond lengths."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    s = alanine_dipeptide_structure()
    stripped = _strip_hydrogens(s)
    assert stripped.n_atoms < s.n_atoms
    rebuilt = add_hydrogens(stripped)
    assert rebuilt.n_atoms == s.n_atoms
    topo = build_topology(rebuilt)
    system, positions = build_system(topo)
    # every H sits at a physical bond length from exactly one heavy atom
    pos = np.asarray(positions)
    heavy = [i for i, e in enumerate(topo.elements) if e != "H"]
    for i, e in enumerate(topo.elements):
        if e != "H":
            continue
        d = np.linalg.norm(pos[heavy] - pos[i], axis=1)
        assert 0.09 < d.min() < 0.14, f"H {topo.atom_names[i]}: {d.min()}"
    # the rebuilt system is energy-stable under minimization
    import jax

    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.md.minimize import minimize_energy

    e0 = float(potential_energy(system, positions))
    xmin, emin = minimize_energy(system, positions)
    assert np.isfinite(e0) and float(emin) < e0


def _fake_residue(name, resid=1):
    return PDBResidue(
        name=name, resid=resid, chain="A",
        atoms=[PDBAtom("CA", name, resid, "A", (0, 0, 0), "C")],
    )


def test_protonation_state_assignment():
    s = PDBStructure(residues=[
        _fake_residue("ASP", 1), _fake_residue("GLU", 2),
        _fake_residue("HIS", 3), _fake_residue("LYS", 4),
    ])
    acid = assign_protonation_states(s, ph=3.0)
    assert [r.name for r in acid.residues] == ["ASH", "GLH", "HIP", "LYS"]
    neutral = assign_protonation_states(s, ph=7.0)
    assert [r.name for r in neutral.residues] == ["ASP", "GLU", "HIE", "LYS"]
    basic = assign_protonation_states(s, ph=11.5)
    assert [r.name for r in basic.residues] == ["ASP", "GLU", "HIE", "LYN"]
    taut = assign_protonation_states(s, ph=7.0, his_variant="HID")
    assert taut.residues[2].name == "HID"
    # explicit variant names in the input are respected
    s2 = PDBStructure(residues=[_fake_residue("HIP", 1)])
    assert assign_protonation_states(s2, ph=7.0).residues[0].name == "HIP"


@pytest.mark.slow
def test_3gd8_prepare_end_to_end():
    """VERDICT round-1 done-criterion: an H-less X-ray PDB becomes a
    runnable, energy-stable system."""
    import os

    if not os.path.exists(REF_3GD8):
        pytest.skip("reference asset not mounted")
    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(REF_3GD8, ph=7.0).prepare()
    assert p.topology.n_atoms > 3000
    n_h = sum(1 for e in p.topology.elements if e == "H")
    assert n_h > 1500, "hydrogens were not added"
    system, positions = p.create_system()
    e0 = float(potential_energy(system, positions))
    assert np.isfinite(e0)
    # net charge is an integer (template bookkeeping closes)
    q = float(np.asarray(system.charges).sum())
    assert abs(q - round(q)) < 1e-3


def test_structural_descriptors_alanine():
    """RDKit-subset descriptors from the topology graph
    (reference protein.py:605-617): HBD/HBA counts are exact structural
    facts for alanine dipeptide (ACE-ALA-NME)."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.topology import build_topology
    from pmarlo_tpu.protein.descriptors import compute_descriptors

    topo = build_topology(alanine_dipeptide_structure())
    d = compute_descriptors(topo)
    # two amide N-H donors (ALA N-H, NME N-H)
    assert d["h_bond_donors"] == 2
    assert d["h_bond_donor_atoms"] == 2
    # acceptors: 2 N + 2 O
    assert d["h_bond_acceptors"] == 4
    # TPSA: 2 amide NH (12.03) + 2 carbonyl O (17.07) = 58.20
    assert d["tpsa"] == pytest.approx(2 * 12.03 + 2 * 17.07, abs=0.01)
    # GRAVY of a single ALA
    assert d["gravy"] == pytest.approx(1.8)


@pytest.mark.slow
def test_3gd8_extreme_ph_builds():
    """Protonation variants must have complete force-field coverage:
    pH 3 exercises ASH/GLH/HIP (carboxylic-acid angles), pH 12 LYN."""
    import os

    if not os.path.exists(REF_3GD8):
        pytest.skip("reference asset not mounted")
    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.protein.protein import Protein

    for ph, expected in ((3.0, {"ASH", "GLH", "HIP"}), (12.0, {"LYN"})):
        p = Protein(REF_3GD8, ph=ph).prepare()
        present = set(p.topology.residue_sequence)
        assert expected <= present, (ph, expected - present)
        system, x = p.create_system()
        assert np.isfinite(float(potential_energy(system, x)))
