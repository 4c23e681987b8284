"""Topology building and parameter assignment."""

import numpy as np
import pytest

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.system import hydrogen_mass_repartition
from pmarlo_tpu.md.topology import build_topology
from pmarlo_tpu.utils.errors import TopologyError


def test_alanine_topology_counts():
    topo = build_topology(alanine_dipeptide_structure())
    assert topo.n_atoms == 22
    assert topo.bonds.shape[0] == 21           # tree: N-1 bonds
    assert topo.angles().shape[0] == 36
    assert abs(topo.charges.sum()) < 1e-6


def test_missing_atom_raises():
    s = alanine_dipeptide_structure()
    s.residues[1].atoms = s.residues[1].atoms[:-1]  # drop an ALA atom
    with pytest.raises(TopologyError, match="missing atoms"):
        build_topology(s)


def test_unknown_residue_raises():
    s = alanine_dipeptide_structure()
    s.residues[1].name = "XYZ"
    for a in s.residues[1].atoms:
        a.resname = "XYZ"
    with pytest.raises(TopologyError):
        build_topology(s)


def test_hmr_conserves_mass():
    topo = build_topology(alanine_dipeptide_structure())
    from pmarlo_tpu.md.ff_params import TYPE_MASSES

    masses = np.asarray([TYPE_MASSES[t] for t in topo.atom_types])
    repart = hydrogen_mass_repartition(masses, topo.bonds, 3.0)
    assert abs(masses.sum() - repart.sum()) < 1e-9
    assert (repart[masses < 2.0] == 3.0).all()


def test_exclusions_and_14():
    topo = build_topology(alanine_dipeptide_structure())
    system, _ = build_system(topo)
    scale_e = np.asarray(system.scale_elec)
    # bonded pairs excluded
    for a, b in topo.bonds:
        assert scale_e[a, b] == 0.0
    # 1-4 pairs scaled by 1/1.2
    _, pairs14 = topo.exclusion_maps()
    assert pairs14, "alanine must have 1-4 pairs"
    for i, j in pairs14:
        assert np.isclose(scale_e[i, j], 1.0 / 1.2)


@pytest.mark.slow
def test_chignolin_builds_if_available():
    from pmarlo_tpu.data import chignolin_path
    from pmarlo_tpu.io.pdb import read_pdb

    path = chignolin_path()
    if path is None:
        pytest.skip("no chignolin PDB on this host")
    structure = read_pdb(path, model=1)
    system, positions = build_system(structure)
    assert system.n_atoms > 100
    # GYDPETGTWG with charged termini: D, E, 2x E? -> net -2
    net = float(np.asarray(system.charges).sum())
    assert abs(net - round(net)) < 1e-3
    from pmarlo_tpu.md.forces import potential_energy

    assert np.isfinite(float(potential_energy(system, positions)))


def test_dense_paths_fail_fast_without_scale_matrices():
    """Systems built with dense_scales=False must raise a clear error
    from every dense force path instead of silently poisoning forces
    with np.asarray(None) -> NaN (code-review r3 finding)."""
    import jax.numpy as jnp
    import pytest

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forces import nonbonded_energy

    system, x = build_system(alanine_dipeptide_structure(),
                             dense_scales=False)
    assert system.scale_elec is None
    with pytest.raises(ValueError, match="dense"):
        nonbonded_energy(system, jnp.asarray(x, jnp.float32))
    from pmarlo_tpu.md.analytic import make_dense_params

    with pytest.raises(ValueError, match="dense"):
        make_dense_params(system)
