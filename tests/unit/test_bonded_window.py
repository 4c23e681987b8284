"""Windowed one-hot bonded kernel vs the jax.value_and_grad oracle.

The kernel's coordinate gradients are HAND-DERIVED (bond radial, angle
arccos chain, torsion Blondel-Karplus relations) — the oracle here is
the autodiff gradient of the md/forces.py energies the kernel replaces,
which makes any sign/formula error a hard failure rather than a drift.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmarlo_tpu.data import alanine_dipeptide_structure, replicate_structure
from pmarlo_tpu.md.bonded_window import build_bonded_window
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.forces import angle_energy, bond_energy, torsion_energy


def _oracle(system):
    def e(x):
        return (bond_energy(system, x) + angle_energy(system, x)
                + torsion_energy(system, x))

    return jax.value_and_grad(e)


@pytest.mark.parametrize("reps", [(1, 1, 1), (3, 2, 1)])
def test_window_matches_autodiff(reps):
    big = replicate_structure(
        alanine_dipeptide_structure(), n=reps, spacing=(1.1, 1.1, 1.1))
    system, x0 = build_system(big, gb_model="gbn2")
    x = jnp.asarray(x0, jnp.float32)
    fn = build_bonded_window(system, stride=128, interpret=True)
    e0, g0 = _oracle(system)(x)
    e1, g1 = fn(x)
    assert abs(float(e1 - e0)) < 1e-3 * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=5e-3, rtol=1e-4)


def test_window_matches_autodiff_distorted():
    """Random distortion pushes angles/torsions away from equilibrium so
    every gradient branch carries signal."""
    big = replicate_structure(
        alanine_dipeptide_structure(), n=(2, 2, 1), spacing=(1.1, 1.1, 1.1))
    system, x0 = build_system(big, gb_model="gbn2")
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.asarray(x0) + 0.02 * rng.standard_normal(np.shape(x0)),
        jnp.float32)
    fn = build_bonded_window(system, stride=128, interpret=True)
    e0, g0 = _oracle(system)(x)
    e1, g1 = fn(x)
    assert abs(float(e1 - e0)) < 1e-3 * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=5e-3, rtol=1e-4)


def test_far_terms_route_through_fallback():
    """A term spanning past the halo window must take the XLA path and
    still contribute exactly (build a fake long-range bond)."""
    import dataclasses

    big = replicate_structure(
        alanine_dipeptide_structure(), n=(16, 1, 1), spacing=(1.1, 0.0, 0.0))
    system, x0 = build_system(big, gb_model="gbn2")
    n = system.n_atoms  # 352 atoms: a (0, n-1) bond spans past the halo
    bond_idx = np.concatenate(
        [np.asarray(system.bond_idx), [[0, n - 1]]], axis=0)
    bond_k = np.concatenate([np.asarray(system.bond_k), [1000.0]])
    bond_r0 = np.concatenate([np.asarray(system.bond_r0), [1.0]])
    system2 = dataclasses.replace(
        system, bond_idx=bond_idx, bond_k=bond_k, bond_r0=bond_r0)
    x = jnp.asarray(x0, jnp.float32)
    fn = build_bonded_window(system2, stride=128, interpret=True)
    assert fn.far_terms >= 1
    e0, g0 = _oracle(system2)(x)
    e1, g1 = fn(x)
    assert abs(float(e1 - e0)) < 1e-3 * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=5e-3, rtol=1e-4)


def test_no_bonded_terms_returns_none():
    import dataclasses

    big = alanine_dipeptide_structure()
    system, _ = build_system(big, gb_model="gbn2")
    empty = dataclasses.replace(
        system,
        bond_idx=np.zeros((0, 2), np.int32), bond_k=np.zeros(0),
        bond_r0=np.zeros(0),
        angle_idx=np.zeros((0, 3), np.int32), angle_k=np.zeros(0),
        angle_t0=np.zeros(0),
        torsion_idx=np.zeros((0, 4), np.int32), torsion_k=np.zeros(0),
        torsion_n=np.zeros(0), torsion_phase=np.zeros(0))
    assert build_bonded_window(empty, interpret=True) is None


def test_pair_force_fn_bonded_window_matches_gather():
    """Integration: build_pair_force_fn(bonded='window') must reproduce
    the gather-glue force fn exactly (same physics, different bonded
    execution engine) on the culled Newton path it targets."""
    from pmarlo_tpu.md.pallas_pair import build_pair_force_fn

    big = replicate_structure(
        alanine_dipeptide_structure(), n=(3, 2, 1), spacing=(1.1, 1.1, 1.1))
    system, x0 = build_system(big, gb_model="gbn2")
    x = jnp.asarray(x0, jnp.float32)
    f_g = build_pair_force_fn(system, tile=128, interpret=True,
                              gb_cutoff=1.5, order_from=np.asarray(x0),
                              bonded="gather")
    f_w = build_pair_force_fn(system, tile=128, interpret=True,
                              gb_cutoff=1.5, order_from=np.asarray(x0),
                              bonded="window")
    e0, g0 = f_g(x)
    e1, g1 = f_w(x)
    assert abs(float(e1 - e0)) < 1e-3 * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=5e-3, rtol=1e-4)
