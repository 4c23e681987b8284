"""RNA force-field coverage (completes the amber14-all nucleic parity).

The reference builds protein-DNA/RNA systems through amber14-all.xml
(/root/reference/src/pmarlo/simulation/__init__.py:24 — includes
RNA.OL3); here the first-party ribonucleotide templates (md/nucleic.py)
+ parm94/99-lineage parameters must carry an RNA strand through the
same pipeline as DNA: hydrogen addition -> topology -> system ->
minimize -> stable MD.

Charge discipline: internal nucleotides sum to exactly -1 e; the Amber
RX5/RX3 terminal split is -0.3081/-0.6919 (vs DNA's -0.3079/-0.6921),
restoring the integer strand charge -(N-1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.data.dna import rna_single_strand
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.nucleic import (
    NUCLEIC_RESIDUES,
    RNA_RESIDUES,
    make_nucleic_variant,
)
from pmarlo_tpu.md.residues import (
    NUCLEIC_RESNAMES,
    TEMPLATES,
    get_template,
    normalize_atom_name,
)
from pmarlo_tpu.protein.hydrogens import add_hydrogens


def test_resname_sets_agree():
    # residues.py keeps a literal copy (circular-import avoidance);
    # they must never drift apart
    assert NUCLEIC_RESNAMES == frozenset(NUCLEIC_RESIDUES)


def test_template_charge_sums():
    for r in RNA_RESIDUES:
        internal = sum(q for _, q in TEMPLATES[r]["atoms"].values())
        five = sum(q for _, q in
                   get_template(r, is_nterm=True)["atoms"].values())
        three = sum(q for _, q in
                    get_template(r, is_cterm=True)["atoms"].values())
        both = sum(q for _, q in get_template(
            r, is_nterm=True, is_cterm=True)["atoms"].values())
        assert abs(internal - (-1.0)) < 1e-6, r
        assert abs(five - (-0.3081)) < 1e-6, r
        assert abs(three - (-0.6919)) < 1e-6, r
        assert abs(five + three - (-1.0)) < 1e-6, r  # Amber terminal split
        assert abs(both) < 1e-6, r                   # mononucleotide = 0


def test_ribose_has_2prime_hydroxyl():
    for r in RNA_RESIDUES:
        atoms = TEMPLATES[r]["atoms"]
        assert atoms["O2'"][0] == "OH" and atoms["HO2'"][0] == "HO", r
        assert "H2''" not in atoms, r       # single H2' on ribose C2'
        bonds = {frozenset(b) for b in TEMPLATES[r]["bonds"]}
        assert frozenset(("C2'", "O2'")) in bonds, r
        assert frozenset(("O2'", "HO2'")) in bonds, r


def test_rna_name_normalization():
    assert normalize_atom_name("O2*") == "O2'"
    assert normalize_atom_name("HO2'") == "HO2'"   # not a 5'/3' alias
    # base carbonyl O2 must NOT alias to the protein OXT for RNA resnames
    assert normalize_atom_name("O2", "U") == "O2"
    assert normalize_atom_name("O2", "C") == "O2"
    assert normalize_atom_name("O1P", "A") == "OP1"


@pytest.fixture(scope="module")
def rna_system():
    s = rna_single_strand("GACU")
    sh = add_hydrogens(s, ph=7.0)
    system, x0 = build_system(sh, gb_model="gbn2")
    return system, jnp.asarray(x0)


def test_strand_builds_with_integer_charge(rna_system):
    system, x0 = rna_system
    expected = sum(
        len(get_template(r, is_nterm=(i == 0), is_cterm=(i == 3))["atoms"])
        for i, r in enumerate(("G", "A", "C", "U")))
    assert system.n_atoms == expected == 127
    # 4-mer: three phosphates -> total charge exactly -3
    assert abs(float(np.sum(np.asarray(system.charges))) + 3.0) < 1e-4


def test_rna_forces_match_finite_differences(rna_system):
    from pmarlo_tpu.md.forces import compute_forces, potential_energy
    from pmarlo_tpu.md.minimize import minimize_energy

    system, x0 = rna_system
    xmin, _ = minimize_energy(system, x0, max_iterations=300)
    # perturb off the minimum so forces are O(10^3) and the f32 central
    # difference resolves them (same protocol as the DNA/protein oracles)
    rng = np.random.default_rng(0)
    pos = np.asarray(xmin, np.float64) + rng.normal(
        0.0, 0.004, np.asarray(xmin).shape)
    analytic = np.asarray(compute_forces(
        system, jnp.asarray(pos, jnp.float32)))
    eps = 1e-4
    idx = rng.choice(system.n_atoms, size=12, replace=False)
    errs = []
    scale = max(np.abs(analytic).max(), 1.0)
    for i in idx:
        for d in range(3):
            p = pos.copy(); p[i, d] += eps
            m = pos.copy(); m[i, d] -= eps
            fd = -(float(potential_energy(system, jnp.asarray(p, jnp.float32)))
                   - float(potential_energy(system, jnp.asarray(m, jnp.float32)))
                   ) / (2 * eps)
            errs.append(abs(fd - analytic[i, d]))
    assert max(errs) / scale < 1e-2


@pytest.mark.slow
def test_rna_segment_stable(rna_system):
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.minimize import minimize_energy

    system, x0 = rna_system
    xmin, _ = minimize_energy(system, x0, max_iterations=2000)
    st = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)
    final, frames = run_md(system, st, n_steps=10000, dt=0.001,
                           friction=1.0, temperature_K=300.0,
                           report_interval=1000)
    T = np.asarray(frames["temperature"])
    assert np.isfinite(np.asarray(final.positions)).all()
    assert 150.0 < float(T[-3:].mean()) < 450.0


def test_featurize_mixed_protein_rna_complex():
    """Feature extractors must skip nucleic residues, not crash — a
    protein-RNA complex featurizes with protein-only dihedral counts."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.features.base import TopologyInfo
    from pmarlo_tpu.features.featurize import featurize_trajectory
    from pmarlo_tpu.io.pdb import PDBAtom, PDBStructure
    from pmarlo_tpu.md.topology import build_topology

    prot = alanine_dipeptide_structure()
    rna = rna_single_strand("GA", chain="X")
    for r in rna.residues:
        for i, a in enumerate(r.atoms):
            r.atoms[i] = PDBAtom(
                name=a.name, resname=a.resname, resid=a.resid,
                chain=a.chain, xyz=(a.xyz[0] + 2.5, a.xyz[1], a.xyz[2]),
                element=a.element)
    combo = add_hydrogens(PDBStructure(
        residues=list(prot.residues) + list(rna.residues)), ph=7.0)
    topo = build_topology(combo)
    top = TopologyInfo.from_topology(topo)
    _, x0 = build_system(combo, gb_model="gbn2")
    traj = np.asarray(x0)[None].repeat(2, axis=0)
    X, info = featurize_trajectory(traj, "phi_psi", top)
    # alanine dipeptide alone: exactly one (phi, psi) pair; the RNA
    # chain must contribute zero protein-backbone torsions
    assert np.asarray(X).shape == (2, 2)
    for spec in ("rg", "sasa", "ssfrac"):
        X, _ = featurize_trajectory(traj, spec, top)
        assert np.isfinite(np.asarray(X)).all(), spec
