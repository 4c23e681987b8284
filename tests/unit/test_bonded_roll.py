"""Roll-based bonded energies: exact parity with the gather formulation
(md/forces.py:34,41,77) in value and gradient."""

import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.md.bonded_roll import build_rolled_bonded
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.forces import angle_energy, bond_energy, torsion_energy

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")


def _reference_bonded(system):
    def fn(x):
        return (bond_energy(system, x) + angle_energy(system, x)
                + torsion_energy(system, x))
    return fn


def _check_parity(system, x, atol_e=1e-3, atol_f=1e-3):
    ref = _reference_bonded(system)
    new = build_rolled_bonded(system)
    e_r, g_r = jax.value_and_grad(ref)(x)
    e_n, g_n = jax.value_and_grad(new)(x)
    assert np.isfinite(float(e_n))
    assert abs(float(e_r) - float(e_n)) < atol_e, (float(e_r), float(e_n))
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_r),
                               atol=atol_f, rtol=1e-4)


@pytest.mark.slow
def test_alanine_parity():
    system, x = build_system(alanine_dipeptide_structure())
    _check_parity(system, jnp.asarray(x, jnp.float32))


@pytest.mark.slow
def test_alanine_perturbed_parity():
    system, x = build_system(alanine_dipeptide_structure())
    rng = np.random.default_rng(0)
    for i in range(3):
        xp = np.asarray(x) + rng.normal(0, 0.02, np.asarray(x).shape)
        _check_parity(system, jnp.asarray(xp, jnp.float32))


@pytest.mark.slow
@pytest.mark.skipif(not CHIGNOLIN.exists(), reason="chignolin not mounted")
def test_chignolin_parity():
    from pmarlo_tpu.io.pdb import read_pdb
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare()
    system, x = p.create_system()
    _check_parity(system, jnp.asarray(x, jnp.float32), atol_e=5e-3,
                  atol_f=5e-3)


def test_term_counts_conserved():
    # every bonded term lands in exactly one (signature, layer) slot
    from pmarlo_tpu.md.bonded_roll import _layered_groups

    system, _ = build_system(alanine_dipeptide_structure())
    for idx, nparams in ((system.bond_idx, 2), (system.angle_idx, 2),
                         (system.torsion_idx, 3)):
        idx = np.asarray(idx)
        groups = _layered_groups(idx, [np.ones(idx.shape[0])] * nparams,
                                 system.n_atoms)
        total = sum(int(mask.sum()) for _, mask, _ in groups)
        assert total == idx.shape[0]


def test_torsion_multiplicity_layering():
    # duplicated quadruples (Fourier multiplicity) must all survive
    from pmarlo_tpu.md.bonded_roll import _layered_groups

    idx = np.array([[0, 1, 2, 3], [0, 1, 2, 3], [0, 1, 2, 3]])
    k = np.array([1.0, 2.0, 3.0])
    groups = _layered_groups(idx, [k], 8)
    assert len(groups) == 3  # three layers, same signature
    placed = sorted(float(ps[0][0]) for _, _, ps in groups)
    assert placed == [1.0, 2.0, 3.0]
