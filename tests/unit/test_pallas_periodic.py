"""Periodic pair kernel parity vs the XLA reference implementation
(md/forces.py periodic_nonbonded_energy) in interpret mode."""

import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.md.forces import potential_energy
from pmarlo_tpu.md.pallas_periodic import build_periodic_force_fn

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")


@pytest.fixture(scope="module")
def solvated():
    if not CHIGNOLIN.exists():
        pytest.skip("chignolin not mounted")
    from pmarlo_tpu.io.pdb import read_pdb
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare(
        solvate=True, solvent_padding=0.8
    )
    system, x = p.create_system(explicit_solvent=True, cutoff=0.9)
    return system, jnp.asarray(x, jnp.float32)


@pytest.mark.slow
def test_energy_parity(solvated):
    system, x = solvated
    fn = build_periodic_force_fn(system, tile=128, interpret=True)
    e, f = fn(x)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(x)
    assert abs(float(e) - float(e_ref)) < 0.05, (float(e), float(e_ref))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.05, rtol=1e-3
    )


@pytest.mark.slow
def test_parity_at_perturbed_configuration(solvated):
    # parity must hold away from the lattice-regular start too (catches
    # min-image branches that only trigger once molecules drift)
    system, x = solvated
    fn = build_periodic_force_fn(system, tile=128, interpret=True)
    rng = np.random.default_rng(0)
    xp = np.asarray(x) + rng.normal(0, 0.02, np.asarray(x).shape)
    xp = jnp.asarray(xp, jnp.float32)
    e, f = fn(xp)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(xp)
    assert abs(float(e) - float(e_ref)) < max(0.1, 1e-5 * abs(float(e_ref)))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.5, rtol=1e-3
    )
