"""Chain-gap handling: gaps are detected, never bonded across
(reference protein.py:354-356 findMissingResidues; PDBFixer rebuilds,
we split — documented deviation)."""

import copy
import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.io.pdb import read_pdb
from pmarlo_tpu.protein.protein import Protein

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")

pytestmark = pytest.mark.skipif(
    not CHIGNOLIN.exists(), reason="chignolin test asset not mounted"
)


def _with_gap(structure, drop_index):
    """Remove one interior residue, leaving a numbering + geometry gap."""
    s = copy.deepcopy(structure)
    del s.residues[drop_index]
    return s


def test_gap_detected():
    s = _with_gap(read_pdb(CHIGNOLIN), 4)
    p = Protein(s).prepare()
    gaps = p.find_missing_residues()
    assert len(gaps) == 1
    (chain, before, after), n = next(iter(gaps.items()))
    assert after - before == 2 and n == 1


def test_gap_not_bonded_across():
    s = _with_gap(read_pdb(CHIGNOLIN), 4)
    p = Protein(s).prepare()
    topo = p.topology
    pos = np.asarray(topo.positions)
    # every bond must be physically short (< 2.5 A); a bond across the
    # gap would be several Angstroms long
    for a, b in topo.bonds:
        d = float(np.linalg.norm(pos[int(a)] - pos[int(b)])) * 10.0
        assert d < 2.5, (topo.atom_names[int(a)], topo.atom_names[int(b)], d)


@pytest.mark.slow
def test_gap_fragments_have_finite_energy():
    import jax.numpy as jnp

    from pmarlo_tpu.md.forces import potential_energy

    s = _with_gap(read_pdb(CHIGNOLIN), 4)
    p = Protein(s).prepare()
    system, x = p.create_system()
    e = float(potential_energy(system, jnp.asarray(x)))
    assert np.isfinite(e)
    # sane magnitude: a cross-gap bond term would add ~1e4 kJ/mol
    assert e < 1e4


def test_intact_structure_reports_no_gaps():
    p = Protein(read_pdb(CHIGNOLIN)).prepare()
    assert p.find_missing_residues() == {}
