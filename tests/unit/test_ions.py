"""Structural-ion coverage: K+, Mg2+, Ca2+, Zn2+ next to Na+/Cl-.

The reference strips heterogens during prep (PDBFixer
removeHeterogens, reference protein/protein.py:351), so crystal ions
never reach its force field; retaining them (Joung-Cheatham monovalents,
Aqvist/Amber divalents) is a deliberate capability extension for
RNA/metalloprotein systems. These tests pin the template/parameter
plumbing: integer charges, masses/elements resolve, and the periodic
explicit path produces FD-consistent forces with mixed ions present.
"""

import jax.numpy as jnp
import numpy as np

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.forces import compute_forces, potential_energy
from pmarlo_tpu.md.residues import NONPOLYMER, TEMPLATES

ION_CHARGES = {"NA": 1.0, "K": 1.0, "CL": -1.0, "MG": 2.0, "CA": 2.0,
               "ZN": 2.0}


def test_ion_templates_register():
    from pmarlo_tpu.md.ff_params import TYPE_ELEMENTS, TYPE_LJ, TYPE_MASSES

    for resname, q in ION_CHARGES.items():
        assert resname in TEMPLATES and resname in NONPOLYMER
        atoms = TEMPLATES[resname]["atoms"]
        assert len(atoms) == 1
        (atype, charge), = atoms.values()
        assert charge == q
        assert atype in TYPE_LJ and atype in TYPE_MASSES
        assert TYPE_ELEMENTS[atype] not in ("H",)


def _ion(resname: str, resid: int, xyz) -> PDBResidue:
    name = next(iter(TEMPLATES[resname]["atoms"]))
    elem = resname[0] + resname[1:].lower()
    return PDBResidue(name=resname, resid=resid, chain="I", atoms=[
        PDBAtom(name=name, resname=resname, resid=resid, chain="I",
                xyz=tuple(xyz), element=elem)])


def _water(resid: int, origin) -> PDBResidue:
    o = np.asarray(origin, float)
    h1 = o + np.array([0.09572, 0.0, 0.0])
    h2 = o + np.array([-0.02399, 0.09268, 0.0])
    mk = lambda n, p, e: PDBAtom(name=n, resname="HOH", resid=resid,
                                 chain="W", xyz=tuple(p), element=e)
    return PDBResidue(name="HOH", resid=resid, chain="W", atoms=[
        mk("O", o, "O"), mk("H1", h1, "H"), mk("H2", h2, "H")])


def test_mixed_ion_box_forces_match_finite_differences():
    residues = [
        _ion("MG", 1, (0.30, 0.30, 0.30)),
        _ion("K", 2, (1.10, 0.40, 0.40)),
        _ion("CA", 3, (0.40, 1.10, 0.45)),
        _ion("ZN", 4, (1.05, 1.05, 1.05)),
        _ion("CL", 5, (0.45, 0.45, 1.10)),
        _ion("CL", 6, (1.10, 0.45, 1.05)),
        _ion("CL", 7, (0.45, 1.05, 1.05)),
        _ion("CL", 8, (0.75, 0.75, 0.20)),
        _ion("CL", 9, (0.20, 0.75, 0.75)),
        _ion("CL", 10, (0.75, 0.20, 0.75)),
        _water(11, (0.75, 0.75, 0.75)),
        _water(12, (0.30, 0.75, 0.30)),
    ]
    s = PDBStructure(residues=residues)
    system, x0 = build_system(s, box=(1.5, 1.5, 1.5), cutoff=0.7,
                              hydrogen_mass=None)
    # net charge: +2 +1 +2 +2 -6 = +1... use the charge array as truth
    total_q = float(np.sum(np.asarray(system.charges)))
    assert abs(total_q - 1.0) < 1e-4
    pos = np.asarray(x0, np.float64)
    analytic = np.asarray(compute_forces(system, jnp.asarray(pos, jnp.float32)))
    assert np.isfinite(analytic).all()
    eps = 1e-4
    errs = []
    scale = max(np.abs(analytic).max(), 1.0)
    for i in range(system.n_atoms):
        for d in range(3):
            p = pos.copy(); p[i, d] += eps
            m = pos.copy(); m[i, d] -= eps
            fd = -(float(potential_energy(system, jnp.asarray(p, jnp.float32)))
                   - float(potential_energy(system, jnp.asarray(m, jnp.float32)))
                   ) / (2 * eps)
            errs.append(abs(fd - analytic[i, d]))
    assert max(errs) / scale < 1e-2


def test_implicit_path_strips_ions():
    # implicit solvent strips waters AND ions (reference-parity heterogen
    # removal, protein/protein.py:351); the GB tables carry no metal
    # radii so retention would be silent mis-solvation
    from pmarlo_tpu.data import alanine_dipeptide_structure

    prot = alanine_dipeptide_structure()
    with_ions = PDBStructure(residues=list(prot.residues) + [
        _ion("MG", 100, (2.3, 0.3, 0.3)),
        _ion("CL", 101, (2.8, 0.3, 0.3)),
        _ion("CL", 102, (2.3, 0.8, 0.3)),
    ])
    system, _ = build_system(with_ions, gb_model="gbn2",
                             hydrogen_mass=None)
    bare, _ = build_system(prot, gb_model="gbn2", hydrogen_mass=None)
    assert system.n_atoms == bare.n_atoms
